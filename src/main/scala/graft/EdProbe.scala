package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level profiling for the edit-distance dedup line (r19, guide §1):
  * where do dedup_edit_distance's ~1.6-2.2 s go — signature+banding,
  * bucket-min window, Levenshtein verify join, or closure? Ad-hoc probe,
  * not part of the bench contract.
  */
object EdProbe {
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
    import graft.dedup._

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[edprobe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val cfg = MinHashConfig()
    val n = 5; val threshold = 0.8
    // warm one full pass
    locally {
      val docs = Queries.table(spark, sfDir, "documents")
      EditDistanceDedup.deduplicate(docs, "text", n, threshold, cfg,
        orderCol = Some("doc_id")).count()
    }
    (1 to 2).foreach { rep =>
      println(s"[edprobe] --- rep $rep ---")
      spark.catalog.clearCache(); MinHash.clearPermCache(); System.gc()
      val docs = Queries.table(spark, sfDir, "documents")
      val withId = docs.withColumn("__graft_dedup_id__", col("doc_id").cast("long")).persist()
      val text = coalesce(col("text"), lit(""))
      val sig = MinHashDedup.signatureColumn(cfg.copy(ngramSize = n, minNgramSize = n))
      val shingleable = size(split(text, "[^A-Za-z_0-9]", -1)) >= n
      val base = withId.where(shingleable)
      val par = spark.sparkContext.defaultParallelism
      val srcFiles = withId.inputFiles.length
      val spread = if (srcFiles == 0 || srcFiles * 2 < par) base.repartition(par) else base
      val banded = spread.select(col("__graft_dedup_id__").as("id"),
        posexplode(sig(text)).as(Seq("band", "bsig")))
      timed("signature+banding (noop)") { noop(banded) }
      val candidates = timed("bucket-min edges (noop+reuse)") {
        val c = graft.dedup.MinHashDedup.bucketMinEdges(banded, cfg.skewSalts, None)
        noop(c); c
      }
      // r19 candidate: agg + cnt>=2 filter + (broadcastable) join, banded persisted
      locally {
        spark.catalog.clearCache(); MinHash.clearPermCache(); System.gc()
        val docs2 = Queries.table(spark, sfDir, "documents")
        val withId2 = docs2.withColumn("__graft_dedup_id__", col("doc_id").cast("long"))
        val base2 = withId2.where(shingleable)
        val spread2 = if (srcFiles == 0 || srcFiles * 2 < par) base2.repartition(par) else base2
        val banded2 = spread2.select(col("__graft_dedup_id__").as("id"),
          posexplode(sig(text)).as(Seq("band", "bsig"))).persist()
        timed("sparse agg bucket-min (noop)") {
          val mins = banded2.groupBy("band", "bsig")
            .agg(min(col("id")).as("__min__"), count(lit(1)).as("__n__"))
            .where(col("__n__") >= 2).drop("__n__")
          val e = banded2.join(broadcast(mins), Seq("band", "bsig"))
            .where(col("id") =!= col("__min__"))
            .select(col("id").as("__x__"), col("__min__").as("__y__"))
            .distinct()
          noop(e)
        }
        banded2.unpersist()
      }
      locally {
        spark.catalog.clearCache(); MinHash.clearPermCache(); System.gc()
        val docs3 = Queries.table(spark, sfDir, "documents")
        val withId3 = docs3.withColumn("__graft_dedup_id__", col("doc_id").cast("long"))
        val base3 = withId3.where(shingleable)
        val spread3 = if (srcFiles == 0 || srcFiles * 2 < par) base3.repartition(par) else base3
        val banded3 = spread3.select(col("__graft_dedup_id__").as("id"),
          posexplode(sig(text)).as(Seq("band", "bsig")))
        timed("plain window bucket-min (noop)") {
          noop(graft.dedup.MinHashDedup.bucketMinEdges(banded3, 0, None))
        }
      }
      timed("lev verify join (noop)") {
        val v = candidates
          .join(withId.select(col("__graft_dedup_id__").as("__x__"), col("text").as("__ta__")), Seq("__x__"))
          .join(withId.select(col("__graft_dedup_id__").as("__y__"), col("text").as("__tb__")), Seq("__y__"))
          .where(EditDistanceDedup.levSimilarity(col("__ta__"), col("__tb__")) >= threshold)
          .select(col("__x__"), col("__y__"))
        noop(v)
      }
      spark.catalog.clearCache(); MinHash.clearPermCache(); System.gc()
      timed("full deduplicate.count()") {
        EditDistanceDedup.deduplicate(docs, "text", n, threshold, cfg,
          orderCol = Some("doc_id")).count()
      }
      withId.unpersist()
    }
    spark.stop()
  }
}
