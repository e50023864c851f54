package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

object NbProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.scoring.NaiveBayes
    val cgramFeat: Column => Column = c => NaiveBayes.charGramsCol(c, 2, 4)
    val docExprSpark = QueriesExtra5.docExprSparkPublic
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[nbprobe2] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def withDoc: org.apache.spark.sql.DataFrame = Queries.table(spark, sfDir, "documents")
      .withColumn("_doc", docExprSpark)
    // warm both shapes
    locally {
      val m = NaiveBayes.train(withDoc, "_doc", "lang", 400, cgramFeat,
        substringHaystack = Some(lower(col("_doc"))))
      NaiveBayes.predict(withDoc.withColumn("_s", concat(col("_doc"), lit(" zzunseen"))), m, "_s", cgramFeat).count()
      val m2 = NaiveBayes.train(withDoc, "_doc", "lang", 400, cgramFeat)
      NaiveBayes.predict(withDoc.withColumn("_s", concat(col("_doc"), lit(" zzunseen"))), m2, "_s", cgramFeat).count()
    }
    (1 to 2).foreach { rep =>
      println(s"[nbprobe2] --- rep $rep ---")
      spark.catalog.clearCache(); System.gc()
      val mDfa = timed("train DFA-path (incl collect)") {
        NaiveBayes.train(withDoc, "_doc", "lang", 400, cgramFeat,
          substringHaystack = Some(lower(col("_doc"))))
      }
      spark.catalog.clearCache(); System.gc()
      val mOld = timed("train explode-path (collect-split)") {
        NaiveBayes.train(withDoc, "_doc", "lang", 400, cgramFeat)
      }
      spark.catalog.clearCache(); System.gc()
      timed("predict.count()") {
        NaiveBayes.predict(withDoc.withColumn("_s", concat(col("_doc"), lit(" zzunseen"))), mDfa, "_s", cgramFeat)
          .select(col("doc_id"), col("nb_label")).orderBy("doc_id").count()
      }
      require(mDfa.weights.keySet == mOld.weights.keySet)
    }
    spark.stop()
  }
}
