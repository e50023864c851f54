package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the check_char_repetition scoring path: the legacy
  * ScalaUDF versus the codegen CharRepetitionExpr, same kernel, same
  * corpus — isolates the wrapper cost question from Throughput's
  * run-order and box-load noise. Three timed reps each, interleaved.
  */
object F5Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val big = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text")
      .withColumn("__r__", explode(array_repeat(lit(1), sys.env.getOrElse("SPARK_GRAFT_REPL", "100").toInt)))
      .drop("__r__")
      .repartition(32)
      .persist()
    val n = big.count()

    val legacyUdf = udf { (s: String) =>
      graft.text.CharRepetition.ratio(if (s == null) "" else s, 10)
    }
    val variants = Seq(
      "udf " -> ((c: org.apache.spark.sql.Column) => legacyUdf(c) <= 0.2),
      "expr" -> ((c: org.apache.spark.sql.Column) =>
        graft.text.FusedText.charRepetitionRatio(c, 10) <= 0.2))

    // warmup both
    variants.foreach { case (_, f) =>
      big.select(f(col("text")).as("o")).write
        .format("noop").mode("overwrite").save()
    }
    (1 to 3).foreach { rep =>
      variants.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        big.select(f(col("text")).as("o")).write
          .format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[f5probe] rep$rep $name $dt%7.2f s  ${n / dt}%10.0f rows/s")
      }
    }
    spark.stop()
  }
}
