package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase attribution for the ann_ivfpq family (r19, guide §1): is the
  * per-rep cost the iterative k-means training (driver-looped Spark
  * jobs), the PQ sample train, or the encode/ADC scan? Ad-hoc probe.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.similarity.{Ann, Pq}
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[annprobe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val emb = Queries.table(spark, sfDir, "embeddings")
    println(s"[annprobe] embeddings rows = ${emb.count()}")
    // warm
    locally {
      val c = Ann.kmeansAssign(emb, "embedding", "vec_id", "__cell__",
        k = 8, iters = 3, trainFraction = 0.2)
      val m = Pq.train(emb, "embedding", "vec_id", 64, 8, 16, 5, 2000)
      Pq.encode(c, "embedding", m, "_codes").count()
    }
    (1 to 2).foreach { rep =>
      println(s"[annprobe] --- rep $rep ---")
      System.gc()
      val cells = timed("kmeansAssign (materialize)") {
        val c = Ann.kmeansAssign(emb, "embedding", "vec_id", "__cell__",
          k = 8, iters = 3, trainFraction = 0.2).persist()
        c.count(); c
      }
      val model = timed("Pq.train (sampled lloyd)") {
        Pq.train(emb, "embedding", "vec_id", 64, 8, 16, 5, 2000)
      }
      timed("encode + count") {
        Pq.encode(cells, "embedding", model, "_codes").count()
      }
      val qv = emb.orderBy("vec_id").limit(1).select("embedding")
        .collect()(0).getSeq[Float](0).toArray
      timed("encode + ADC topk") {
        Pq.adcTopK(Pq.encode(cells, "embedding", model, "_codes"),
          "vec_id", "_codes", qv, model, 10).collect()
      }
      cells.unpersist()
    }
    spark.stop()
  }
}
