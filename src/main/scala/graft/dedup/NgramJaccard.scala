package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact word-n-gram Jaccard similarity + LSH-accelerated near-dedup:
  * MinHash banding proposes candidates (recall), exact Jaccard verifies
  * (precision) — the classic two-stage shape. All set math is `Column`-only.
  */
object NgramJaccard {

  /** Distinct word n-grams (lowercased `[a-z0-9_]+` words). r19: the
    * fused one-pass kernel (tokenize + gram + distinct in one scan, no
    * interpreted HOFs, no staged word array needed) — element-identical
    * to [[ngramsFromWords]] over the composed tokenizer (AsciiGramsSpec
    * pins the tokenizer and distinct-gram identities; ExtrasSpec's
    * Jaccard goldens run through this path).
    */
  def wordNgrams(c: Column, n: Int): Column =
    graft.text.AsciiGrams.ngramsDistinct(c, n)

  /** N-grams from an already-materialized word-array column. */
  def ngramsFromWords(words: Column, n: Int): Column =
    when(size(words) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n))))))

  /** |A∩B| / |A∪B| over distinct-element arrays; 0 when both empty. */
  def jaccard(a: Column, b: Column): Column = {
    val uni = size(array_union(a, b))
    when(uni === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double") / uni)
  }

  private val WordRe = java.util.regex.Pattern.compile("[a-z0-9_]+")

  /** Distinct word n-grams as a JVM set — single tokenization pass.
    * Same semantics as [[wordNgrams]] (lowercase `[a-z0-9_]+` words,
    * empty below `n` words).
    */
  def gramSet(s: String, n: Int): java.util.HashSet[String] = {
    val out = new java.util.HashSet[String]()
    if (s == null) return out
    val words = new scala.collection.mutable.ArrayBuffer[String]()
    val m = WordRe.matcher(s.toLowerCase(java.util.Locale.ROOT))
    while (m.find()) words += m.group()
    if (words.length < n) return out
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i + n <= words.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out.add(sb.toString)
      i += 1
    }
    out
  }

  /** Exact Jaccard of two docs' distinct n-gram sets — the verification
    * kernel. A procedural UDF on purpose: the `Column` HOF version
    * re-evaluates the word split inside the n-gram lambda (Catalyst
    * inlines the staged array), making it O(words²) per side — measured
    * 16 ms/pair vs ~50 µs here. Runs only on candidate pairs, so it is
    * never the scan hot path.
    */
  def jaccardDocs(a: String, b: String, n: Int): Double = {
    val ga = gramSet(a, n)
    val gb = gramSet(b, n)
    val (small, big) = if (ga.size <= gb.size) (ga, gb) else (gb, ga)
    var inter = 0
    val it = small.iterator()
    while (it.hasNext) if (big.contains(it.next())) inter += 1
    val uni = ga.size + gb.size - inter
    if (uni == 0) 0.0 else inter.toDouble / uni
  }

  /** Near-dedup via MinHash candidates + exact-Jaccard verification at
    * `threshold`, keep-first. More precise than banding alone (LSH false
    * positives are filtered by the exact check).
    *
    * Scale shape: docs with fewer than `n` tokens are excluded from
    * banding up front — their shingle set is empty, so the reference LSH
    * would flood them into ONE all-MAX_HASH bucket (the r2 24.8 s hot key)
    * only for exact verification to reject every pair (empty gram sets
    * have Jaccard 0). Candidate edges are STAR-SHAPED per bucket (member
    * vs bucket-min, via a streaming window — no per-bucket array), and
    * verification joins the candidate ids back against the corpus, staging
    * the word arrays in their own projection so the split isn't
    * re-evaluated inside the n-gram lambda. Clustering goes through
    * [[MinHashDedup.keepFirst]]: driver UnionFind for small edge lists,
    * distributed min-label propagation beyond `maxDriverEdges`.
    */
  def deduplicate(df: DataFrame, column: String, n: Int = 5,
      threshold: Double = 0.7,
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

  /** Exact-Jaccard-verified candidate pairs — the edge list feeding the
    * clustering. Exposed for the keep-first invariant specs.
    *
    * `bandedSink`: when given, the exploded (id, band, bsig) frame is
    * written there (overwrite) and candidates come from the read-back —
    * the correctness oracle then derives bucket-min candidates AND the
    * exact-Jaccard verification itself in SQL from the signatures + corpus
    * (QueriesExtra2.ngramKeepFirstSql); both engines' division is IEEE
    * double, so the ≥ threshold comparison agrees bit-for-bit.
    */
  private[graft] def verifiedEdges(withId: DataFrame, column: String,
      n: Int, threshold: Double, cfg: MinHashConfig,
      bandedSink: Option[String] = None,
      cacheSink: Option[scala.collection.mutable.Buffer[DataFrame]] = None)
      : DataFrame = {
    val spark = withId.sparkSession
    val text = coalesce(col(column), lit(""))
    val sig = MinHashDedup.signatureColumn(cfg.copy(ngramSize = n,
      minNgramSize = n, threshold = threshold))
    // Short docs can never verify (empty gram set ⇒ Jaccard 0 < threshold):
    // skip banding for them instead of materializing the degenerate bucket.
    // r20: early-exit fused gate (no token-array materialization) —
    // ≡ size(split(text, "[^A-Za-z_0-9]", -1)) >= n, FusedTextSpec
    val shingleable = graft.text.FusedText.nonAlphaPartsAtLeast(text, n)
    val base = withId.where(shingleable)
    // the signature UDF is the CPU hot path; a small parquet input arrives
    // as 1-2 splits, which would serialize it — spread AFTER id assignment
    // (ids anchor keep-first order) when the source is under-parallel.
    // Probe via the scan's file list, NOT df.rdd.getNumPartitions: touching
    // .rdd forces plan→RDD conversion (an extra job) in this constructor.
    val par = spark.sparkContext.defaultParallelism
    val srcFiles = withId.inputFiles.length
    val spread =
      if (srcFiles == 0 || srcFiles * 2 < par) base.repartition(par)
      else base
    val banded = spread
      .select(col(MinHashDedup.IdCol).as("id"),
        posexplode(sig(text)).as(Seq("band", "bsig")))
    // cfg.skewSalts reaches the bucket-min stage (VERDICT r12 #3: the
    // jaccard candidate path hits the same templated-corpus hot buckets
    // as plain minhash, and previously had no knob)
    val candidates = MinHashDedup.bucketMinEdges(
      SideChannel.through(banded, bandedSink), cfg.skewSalts, cacheSink)
    // exact verification: only candidate pairs pull their texts back in
    // (broadcast-able candidate side at bench scale, shuffle join on id
    // at cluster scale); single-pass JVM kernel — see [[jaccardDocs]]
    val jac = udf { (a: String, b: String) => jaccardDocs(a, b, n) }
    // ALL verified pairs go to clustering (multi-edges are fine for both
    // union-find and min-label propagation); a per-node min-reduction
    // would drop cross-links and over-keep vs transitive clustering
    candidates
      .join(withId.select(col(MinHashDedup.IdCol).as("__x__"),
        col(column).as("__ta__")), Seq("__x__"))
      .join(withId.select(col(MinHashDedup.IdCol).as("__y__"),
        col(column).as("__tb__")), Seq("__y__"))
      .where(jac(col("__ta__"), col("__tb__")) >= threshold)
      .select(col("__x__"), col("__y__"))
  }
}
