package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-level profiling for the NB classifier lines (r19 measurement,
  * guide §1): nb_predict_chargram is the slowest STABLE bench line
  * (3.30–3.80 s across 12 reps at sf0.1 while most dedup noise bands are
  * wider than their medians), so before touching it we need to know
  * whether train (two gram-extraction passes + aggregations + model
  * collect) or predict (one extraction + scoring UDF) owns the time.
  * Not part of the bench contract; ad-hoc via tools/graftrun.sh.
  */
object NbProbe {
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
    import graft.scoring.NaiveBayes

    val cgramFeat: Column => Column =
      c => NaiveBayes.charGramsCol(c, 2, 4)
    val docExprSpark = QueriesExtra5.docExprSparkPublic

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[nbprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // warm the JVM once end-to-end (untimed shape exercise)
    {
      val withDoc = Queries.table(spark, sfDir, "documents")
        .withColumn("_doc", docExprSpark)
      val m = NaiveBayes.train(withDoc, "_doc", "lang", 400, cgramFeat)
      NaiveBayes.predict(
        withDoc.withColumn("_scored", concat(col("_doc"), lit(" zzunseen"))),
        m, "_scored", cgramFeat).count()
    }

    (1 to 3).foreach { rep =>
      println(s"[nbprobe] --- rep $rep ---")
      spark.catalog.clearCache()
      System.gc()
      val withDoc = Queries.table(spark, sfDir, "documents")
        .withColumn("_doc", docExprSpark)
      val toks = cgramFeat(col("_doc"))
      timed("gram-extract scan only") {
        withDoc.select(sum(size(toks))).collect()
      }
      timed("dfreq agg (distinct grams)") {
        withDoc.select(explode(array_distinct(toks)).as("token"))
          .groupBy("token").agg(count(lit(1)).as("df"))
          .select(sum(length(col("token")))).collect()
      }
      val model = timed("train (full, incl. collect)") {
        NaiveBayes.train(withDoc, "_doc", "lang", 400, cgramFeat)
      }
      timed("predict.count()") {
        NaiveBayes.predict(
          withDoc.withColumn("_scored", concat(col("_doc"), lit(" zzunseen"))),
          model, "_scored", cgramFeat)
          .select(col("doc_id"), col("nb_label"), col("nb_score_micro"),
            col("nb_margin_micro"))
          .orderBy("doc_id")
          .count()
      }
    }
    spark.stop()
  }
}
