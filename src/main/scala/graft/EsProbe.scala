package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase split for es_repeated_spans (r19, guide §1): fingerprint
  * UDF+explode vs h-shuffle window vs span merge. Ad-hoc probe.
  */
object EsProbe {
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
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[esprobe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val shared = "this exact sentence is shared across many documents verbatim "
    def injected = Queries.table(spark, sfDir, "documents")
      .withColumn("t", when(col("doc_id") % 9 === 0,
        concat(lit(shared), col("text"))).otherwise(col("text")))
    // warm
    graft.dedup.ExactSubstring.repeatedSpans(injected, "doc_id", "t", 40).count()
    (1 to 2).foreach { rep =>
      println(s"[esprobe] --- rep $rep ---")
      System.gc()
      timed("fingerprint explode (noop)") {
        noop(graft.dedup.ExactSubstring.gramsFor(injected, "doc_id", "t", 40))
      }
      timed("+ h-window filter (noop)") {
        noop(graft.dedup.ExactSubstring.markedFor(injected, "doc_id", "t", 40))
      }
      timed("full repeatedSpans.count()") {
        graft.dedup.ExactSubstring.repeatedSpans(injected, "doc_id", "t", 40).count()
      }
    }
    spark.stop()
  }
}
