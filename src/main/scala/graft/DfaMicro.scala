package graft

import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM micro-bench (no Spark executors): ByteDfa vs char AhoCorasick
  * on real document texts, single thread — isolates kernel cost from
  * Spark/codegen integration.
  */
object DfaMicro {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").limit(2000).collect().map(_.getString(0))
    spark.stop()
    val u8 = texts.map(UTF8String.fromString)
    val totalBytes = u8.map(_.numBytes().toLong).sum
    println(s"[micro] docs=${texts.length} bytes=$totalBytes")

    val nsfw = graft.text.WordLists.NsfwWords
    val dfa = new graft.text.ByteDfa(nsfw)
    val ac = new graft.text.AhoCorasick(nsfw)

    def time(name: String)(body: => Long): Unit = {
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val r = body
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[micro] $name rep$rep $dt%6.3f s " +
          f"${totalBytes / dt / 1e6}%8.1f MB/s (sum=$r)")
      }
    }

    time("byteDfa.count") {
      var s = 0L; u8.foreach(t => s += dfa.countBytes(t)); s
    }
    time("charAC.count ") {
      var s = 0L
      texts.foreach(t =>
        s += ac.countAll(t.toLowerCase(java.util.Locale.ROOT)))
      s
    }
    time("byteDfa.conta") {
      var s = 0L; u8.foreach(t => if (dfa.containsBytes(t)) s += 1); s
    }
    time("charAC.conta ") {
      var s = 0L
      texts.foreach(t =>
        if (ac.containsAny(t.toLowerCase(java.util.Locale.ROOT))) s += 1)
      s
    }
  }
}
