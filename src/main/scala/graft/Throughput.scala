package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.{Cleaners, Filters}

/** Per-operator throughput (rows/s): each cleaner/filter expression over
  * the documents corpus replicated `factor`× (default 100 → 500k rows at
  * sf0.1), materialized through the noop sink (full compute, no I/O).
  * Compare with `tools/ref_throughput.py` (the reference's single-threaded
  * pandas loop over the same texts).
  */
object Throughput {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_REPL", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val big = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text")
      .withColumn("__r__", explode(array_repeat(lit(1), factor)))
      .drop("__r__")
      .repartition(cpus.toInt)
      .persist()
    val n = big.count()

    val ops: Seq[(String, Column => Column)] = Seq(
      "c2_normalize_whitespace" -> Cleaners.normalizeWhitespace,
      "c3_normalize_punctuation" -> Cleaners.normalizePunctuation,
      "c4_remove_empty_lines" -> Cleaners.removeEmptyLines,
      "c5_clean_new_lines" -> Cleaners.cleanNewLines,
      "f1_check_word_number" -> (c => Filters.checkWordNumber().keep(c)),
      "f3_check_nsfw_words" -> (c => Filters.checkNsfwWords().keep(c)),
      "f4_check_lowercase_ratio" ->
        (c => Filters.checkLowercaseRatio().keep(c)),
      "f5_check_char_repetition" ->
        (c => Filters.checkCharRepetition().keep(c)),
      "f7_check_completion" -> (c => Filters.checkCompletion().keep(c)),
      "f9_check_empty" -> (c => Filters.checkEmpty().keep(c)),
      "f10_check_ethics" -> (c => Filters.checkEthics().keep(c)),
      "f11_check_ethics_harsh" -> (c => Filters.checkEthicsHarsh().keep(c)))

    // warmup: one full pass over EVERY op (codegen + JIT + adaptive-heap
    // sizing — the high-allocation ops must see a grown heap before being
    // timed, or run order leaks into the numbers)
    ops.foreach { case (_, fn) =>
      big.select(fn(col("text")).as("o")).write
        .format("noop").mode("overwrite").save()
    }

    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    println(f"corpus: $n rows (documents × $factor), local[$cpus], " +
      s"best of $reps")
    println(f"${"operator"}%-34s ${"sec"}%9s ${"rows/s"}%12s")
    var total = 0.0
    ops.foreach { case (name, fn) =>
      val dt = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        big.select(fn(col("text")).as("o")).write
          .format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      total += dt
      println(f"$name%-34s $dt%9.2f ${n / dt}%12.0f")
    }
    println(f"${"TOTAL"}%-34s $total%9.2f")
    spark.stop()
  }
}
