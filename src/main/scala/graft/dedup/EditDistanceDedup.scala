package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-confirmed fuzzy dedup — the record-linkage / title-dedup
  * shape: MinHash banding proposes candidates (recall), a normalized
  * Levenshtein similarity verifies (precision), keep-first clustering
  * collapses. Completes the near-dedup family's verification kernels:
  * set overlap (n-gram Jaccard), bit distance (SimHash hamming), float
  * geometry (embedding cosine), and now SEQUENCE distance — the right
  * kernel when near-dups differ by small in-place edits (typo'd titles,
  * version strings, template fields) that leave most shingles intact but
  * where set similarity over- or under-counts reorderings.
  *
  * Verification is Spark's built-in `levenshtein` Column function —
  * codegen'd Catalyst expression, no UDF — computed ONLY on candidate
  * pairs, never as a corpus scan. Similarity is
  * `1 − lev(a,b) / max(|a|,|b|)` (both-empty := 1), an IEEE double
  * division both engines reproduce bit-identically; lengths and the
  * distance itself are integers. NOTE: Spark's levenshtein counts
  * CODEPOINT edits while DuckDB's counts BYTE edits — identical on
  * ASCII corpora (the oracle's documents table is verified ASCII-only;
  * a non-ASCII corpus would need a byte-length normalization to keep
  * the oracle exact, the engine itself is fine either way).
  *
  * Scale shape: identical to [[NgramJaccard.deduplicate]] — docs below
  * `n` tokens are excluded from banding up front (they cannot shingle;
  * byte-identical short docs are exact-dedup's job), candidates are
  * star-shaped per bucket via the streaming bucket-min window, the
  * Levenshtein verify joins texts back on the bounded candidate list,
  * and clustering goes through [[MinHashDedup.keepFirst]]'s driver/
  * distributed crossover. O(len²) per verified pair is paid on candidate
  * pairs only — banding keeps that set near-linear in corpus size.
  */
object EditDistanceDedup {

  /** Normalized Levenshtein similarity of two text columns:
    * `1 − lev / max(len)`, with the both-empty pair defined as 1.0.
    */
  def levSimilarity(a: Column, b: Column): Column = {
    val maxLen = greatest(length(a), length(b))
    when(maxLen === 0, lit(1.0))
      .otherwise(lit(1.0) - levenshtein(a, b).cast("double") / maxLen)
  }

  /** Near-dedup via MinHash candidates + normalized-Levenshtein
    * verification at `threshold`, keep-first.
    */
  def deduplicate(df: DataFrame, column: String, n: Int = 5,
      threshold: Double = 0.8,
      cfg: MinHashConfig = MinHashConfig(),
      maxDriverEdges: Long = 10_000_000L,
      orderCol: Option[String] = None): DataFrame = {
    val withId = MinHashDedup.assignId(df, orderCol)
    // cache hygiene parity with MinHashDedup.deduplicate (ADVICE r14):
    // with skew_salts auto/salted the bucket-min stage pins the banded /
    // staged frame; keepFirst materializes the verified edges before
    // returning, so releasing here is safe by the same argument
    val out = MinHashDedup.withCacheRelease { sink =>
      MinHashDedup.keepFirst(withId,
        verifiedEdges(withId, column, n, threshold, cfg,
          cacheSink = Some(sink)), maxDriverEdges)
    }
    MinHashDedup.releasePinIf(withId, orderCol)
    out
  }

  /** Levenshtein-verified candidate pairs — the edge list feeding the
    * clustering. `bandedSink` exports the exploded (id, band, bsig)
    * frame so the oracle re-derives bucket-min candidates AND the
    * Levenshtein verify itself in SQL (QueriesExtra7). `cacheSink`
    * collects the frames the skew remedies pin, for entry-point release.
    */
  private[graft] def verifiedEdges(withId: DataFrame, column: String,
      n: Int, threshold: Double, cfg: MinHashConfig,
      bandedSink: Option[String] = None,
      cacheSink: Option[scala.collection.mutable.Buffer[DataFrame]] = None)
      : DataFrame = {
    val spark = withId.sparkSession
    val text = coalesce(col(column), lit(""))
    val sig = MinHashDedup.signatureColumn(cfg.copy(ngramSize = n,
      minNgramSize = n))
    // r20: early-exit fused gate (no token-array materialization) —
    // ≡ size(split(text, "[^A-Za-z_0-9]", -1)) >= n, FusedTextSpec
    val shingleable = graft.text.FusedText.nonAlphaPartsAtLeast(text, n)
    val base = withId.where(shingleable)
    val par = spark.sparkContext.defaultParallelism
    val srcFiles = withId.inputFiles.length
    val spread =
      if (srcFiles == 0 || srcFiles * 2 < par) base.repartition(par)
      else base
    val banded = spread
      .select(col(MinHashDedup.IdCol).as("id"),
        posexplode(sig(text)).as(Seq("band", "bsig")))
    // cfg.skewSalts reaches the bucket-min stage (VERDICT r12 #3)
    val candidates = MinHashDedup.bucketMinEdges(
      SideChannel.through(banded, bandedSink), cfg.skewSalts, cacheSink)
    candidates
      .join(withId.select(col(MinHashDedup.IdCol).as("__x__"),
        col(column).as("__ta__")), Seq("__x__"))
      .join(withId.select(col(MinHashDedup.IdCol).as("__y__"),
        col(column).as("__tb__")), Seq("__y__"))
      .where(levSimilarity(col("__ta__"), col("__tb__")) >= threshold)
      .select(col("__x__"), col("__y__"))
  }
}
