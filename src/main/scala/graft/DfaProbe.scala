package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe: char-level AhoCorasick (pre-r18 hot path) vs byte-level
  * ByteDfa for the containsAny (f10 ethics) and countAll (f3 nsfw)
  * shapes, on the real documents corpus — plus the corpus' full-ASCII row
  * fraction, which decides which ByteDfa path dominates.
  */
object DfaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_REPL", "100").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val big = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text")
      .withColumn("__r__", explode(array_repeat(lit(1), factor)))
      .drop("__r__")
      .repartition(32)
      .persist()
    val n = big.count()

    val asciiUdf = udf { (s: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(s).isFullAscii
    }
    val asciiFrac = big.select(avg(asciiUdf(col("text")).cast("double")))
      .collect()(0).getDouble(0)
    println(f"[dfaprobe] rows=$n asciiFrac=$asciiFrac%.4f")

    val ethics = graft.text.WordLists.UnwantedWords
    val nsfw = graft.text.WordLists.NsfwWords

    val charAcEthics = new graft.text.AhoCorasick(ethics)
    val charAcNsfw = new graft.text.AhoCorasick(nsfw)
    val oldContains = udf { (s: String) =>
      charAcEthics.containsAny(
        if (s == null) "" else s.toLowerCase(java.util.Locale.ROOT))
    }
    val oldCount = udf { (s: String) =>
      charAcNsfw.countAll(
        if (s == null) "" else s.toLowerCase(java.util.Locale.ROOT))
    }

    val variants = Seq(
      "contains_charAC " -> ((c: org.apache.spark.sql.Column) =>
        oldContains(c)),
      "contains_byteDfa" -> ((c: org.apache.spark.sql.Column) =>
        graft.text.MultiMatch.containsAny(c, ethics)),
      "count_charAC    " -> ((c: org.apache.spark.sql.Column) => oldCount(c)),
      "count_byteDfa   " -> ((c: org.apache.spark.sql.Column) =>
        graft.text.MultiMatch.countMatches(c, nsfw)))

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
        println(f"[dfaprobe] rep$rep $name $dt%7.2f s  ${n / dt}%10.0f rows/s")
      }
    }
    spark.stop()
  }
}
