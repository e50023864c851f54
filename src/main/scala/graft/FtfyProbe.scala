package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.FtfyLite

/** C1/ftfy divergence bound (VERDICT r11 #6 / r12 #6). Real ftfy is
  * unreachable in this zero-egress sandbox — it is not installed in any
  * python on the box and cannot be fetched — so the exact divergence
  * rate vs ftfy-6's corpus-trained badness gate cannot be computed here
  * (`tools/ftfy_divergence.py` computes it wherever ftfy IS available).
  * What CAN be measured is a sound UPPER BOUND: FtfyLite and ftfy run
  * the same deterministic transform chain, and the only places they can
  * disagree are the heuristic decision points — the whole-string
  * round-trip accept (ftfy may refuse via badness), the byte-rewriting
  * restore_byte_a0 retry and span decode (gate accept vs ftfy weights),
  * a gate REFUSAL (ftfy might accept), and the lossy-sequence collapse.
  * A row none of those touch is transformed identically by both. This
  * probe measures the engagement rate of each decision point over (a)
  * the committed fuzz fragments + their 3-fragment compositions and
  * (b) the full sf documents table — the result is the COVERAGE.md
  * divergence paragraph.
  *
  * Usage: runMain graft.FtfyProbe [sfDir]
  */
object FtfyProbe {

  private final case class Tally(name: String, n: Long, changed: Long,
      engaged: Long, plain: Long, rewrite: Long, span: Long,
      refused: Long, lossy: Long) {
    def report: String = {
      def pct(x: Long) = f"$x%d (${100.0 * x / math.max(n, 1)}%.2f%%)"
      s"[ftfy-probe] $name: rows=$n changed=${pct(changed)} " +
        s"divergence-eligible(engaged)=${pct(engaged)} " +
        s"[plainRoundTrip=$plain rewriteAccepted=$rewrite " +
        s"spanAccepted=$span gateRefused=$refused lossyCollapsed=$lossy]"
    }
  }

  private def tally(name: String, texts: Seq[String]): Tally = {
    var changed, engaged, plain, rewrite, span, refused, lossy = 0L
    texts.foreach { s =>
      val (out, t) = FtfyLite.fixTraced(s)
      if (out != (if (s == null) "" else s)) changed += 1
      if (t.engaged) engaged += 1
      if (t.plainRoundTrip) plain += 1
      if (t.rewriteAccepted) rewrite += 1
      if (t.spanAccepted) span += 1
      if (t.gateRefused) refused += 1
      if (t.lossyCollapsed) lossy += 1
    }
    Tally(name, texts.size, changed, engaged, plain, rewrite, span,
      refused, lossy)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val frags = QueriesFuzz.Fragments.map(_._1)
    val composed = QueriesFuzz.corpus(spark)
      .select("text").collect().map(_.getString(0)).toSeq
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map(_.getString(0)).toSeq

    Seq(
      tally("fuzz-fragments", frags),
      tally("fuzz-composed", composed),
      tally(s"documents@$dir", docs)
    ).foreach(t => println(t.report))
    println("[ftfy-probe] divergence vs real ftfy-6 is bounded above by " +
      "the engaged rate per corpus; rows outside it are transformed " +
      "identically by construction (same deterministic step chain).")
    spark.stop()
  }
}
