package graft.analysis

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N-gram-overlap benchmark decontamination scoring — the GPT-3/Llama
  * style contamination METRIC (what fraction of a document's distinct
  * word n-grams appear anywhere in the eval set), complementing
  * [[graft.dedup.ExactSubstring.contaminatedSpans]] which finds verbatim
  * character SPANS. Spans locate quotes to cut; the overlap fraction is
  * the document-level triage score pipelines threshold on (e.g. drop
  * docs with >= 20% eval-set 13-gram overlap).
  *
  * Scale shape: benchmark sets are tiny next to a 100 TB corpus, so the
  * distinct benchmark-gram set is broadcast and the whole score is one
  * corpus-side explode + broadcast left join + per-doc aggregate — no
  * corpus shuffle beyond the per-doc groupBy, which partial-aggregates
  * map-side (gram hit counts collapse to two longs per doc).
  */
object Decon {

  /** Distinct word n-grams per document: (idCol, gram). */
  private def docGrams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    // r19: fused tokenize+gram+distinct kernel (≡ array_distinct over
    // the composed extraction — AsciiGramsSpec pins it)
    df.select(col(idCol), explode(
      graft.text.AsciiGrams.ngramsDistinct(col(textCol), n)).as("gram"))

  /** Per-corpus-document overlap against `benchmark`:
    * (idCol, n_grams, n_matched, overlap_frac). Documents with fewer
    * than `n` words score 0 over 0 grams.
    *
    * The distinct benchmark-gram set is persisted and counted before the
    * corpus-side join: at or below `maxBroadcastGrams` it is broadcast
    * (the normal case — eval sets are tiny), above it the hint is dropped
    * and Catalyst falls back to a shuffle join, so a pathologically fat
    * "benchmark" degrades to an ordinary join instead of OOMing every
    * executor with an unbounded broadcast table. The count is one extra
    * benchmark-side job against the cached gram set, never a corpus scan.
    */
  def overlapScore(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int,
      maxBroadcastGrams: Long = 5000000L): DataFrame = {
    val bGrams = docGrams(benchmark, idCol, textCol, n)
      .select("gram").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the cache exists for the count() below; release it immediately so
    // repeated calls in a long-lived session don't accumulate pinned
    // blocks. The join's later re-scan recomputes the (benchmark-sized,
    // i.e. tiny) gram explode once — cheap next to a leaked cache.
    val small = try bGrams.count() <= maxBroadcastGrams
      finally bGrams.unpersist()
    val hits = bGrams.withColumn("__hit__", lit(1))
    val joinSide = if (small) broadcast(hits) else hits
    val scored = docGrams(corpus, idCol, textCol, n)
      .join(joinSide, Seq("gram"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        count(col("__hit__")).as("n_matched"))
    corpus.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        coalesce(col("n_matched").cast("double") / col("n_grams"), lit(0.0))
          .as("overlap_frac"))
  }

  /** Bloom-filter decontamination — the ZERO-SHUFFLE scale path for
    * [[overlapScore]]'s triage: a Bloom filter of the benchmark's
    * distinct word n-grams is aggregated distributedly (per-partition
    * filters OR-merged — only the bit array reaches the driver),
    * broadcast, and each corpus document counts its distinct grams'
    * membership in ONE narrow pass (single-tokenization JVM kernel, the
    * NB/ARPA closure-model shape). No corpus shuffle, no corpus-side
    * join, no per-doc groupBy: the per-executor cost is the filter's
    * bit array (≈43 bits/gram at fpp=1e-9) regardless of corpus size —
    * the GPT-3/PaLM 13-gram decontamination pass as it actually runs at
    * 100 TB.
    *
    * The trade, made explicit like [[graft.dedup.ExactDedup
    * .bloomDedupAgainst]]: a false positive INFLATES a document's
    * contaminated-gram count with probability ≤ fpp per gram (at 1e-9,
    * one spurious gram per billion checked); false negatives are
    * impossible, so every genuinely contaminated gram is counted and a
    * `flagged = false` document is CLEAN with certainty — the direction
    * that matters when the flag gates corpus admission.
    *
    * Returns (idCol, contaminated_grams, flagged) — distinct
    * benchmark-gram hits per document and the admission flag.
    */
  def bloomContaminated(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 13,
      expectedItems: Long = 0L, fpp: Double = 1e-9): DataFrame = {
    val grams = docGrams(benchmark, idCol, textCol, n)
      .select("gram").distinct()
    // same sizing contract as bloomDedupAgainst (ADVICE r9 + r10): an
    // undersized filter degrades fpp silently — here that INFLATES hit
    // counts rather than dropping rows, but the fpp=1e-9 contract still
    // breaks. <= 0 auto-sizes from the measured distinct-gram count
    // (cached only on THAT branch, where the gram explode feeds both the
    // count and the filter aggregate); an explicit expectedItems is
    // trusted without a validation count — sizing correctly is then the
    // caller's contract, and the grams frame is consumed exactly once.
    val sized =
      if (expectedItems > 0L) expectedItems
      else { grams.persist(); math.max(grams.count(), 1L) }
    val bf = grams.stat.bloomFilter("gram", sized, fpp)
    grams.unpersist()
    // zero-extra-pass observability (ADVICE r11): realized fpp from the
    // built filter's bit saturation exposes an undersized explicit count
    if (expectedItems > 0L && bf.expectedFpp() > fpp * 10) {
      org.apache.log4j.Logger.getLogger(getClass).warn(
        f"bloomContaminated: explicit expectedItems=$expectedItems undersized " +
          f"— realized fpp ${bf.expectedFpp()}%.3g vs requested $fpp%.3g; " +
          "hit counts inflate at the realized rate. Pass expectedItems <= 0 " +
          "to auto-size from the measured distinct-gram count.")
    }
    val b = corpus.sparkSession.sparkContext.broadcast(bf)
    val hitCount = udf { (s: String) =>
      val grams = graft.dedup.NgramJaccard.gramSet(s, n)
      var c = 0L
      val it = grams.iterator()
      while (it.hasNext) if (b.value.mightContainString(it.next())) c += 1
      c
    }
    corpus
      .select(col(idCol), hitCount(col(textCol)).as("contaminated_grams"))
      .withColumn("flagged", col("contaminated_grams") > 0)
  }

  /** Embedding-space decontamination — the SEMANTIC member of the decon
    * family beside the verbatim n-gram paths ([[overlapScore]],
    * [[bloomContaminated]], `ExactSubstring.contaminatedSpans`): a
    * paraphrased eval question shares no 13-gram with its source but
    * sits next to it in embedding space, so pipelines also drop corpus
    * rows whose max cosine against ANY benchmark embedding reaches
    * `tau` (the same screen SemDeDup applies between corpus rows,
    * pointed at the eval set).
    *
    * Scale shape: the benchmark is tiny next to a 100 TB corpus, so it
    * broadcasts (with norms precomputed once per side) into a
    * broadcast nested-loop join — linear in the corpus, no corpus-side
    * shuffle except the per-id hit-count aggregate, which partial-
    * aggregates map-side to one tiny row per corpus id (every id's
    * benchmark pairs are co-located in its own input partition by NLJ
    * construction). Output is integer/boolean only — the doubles stay
    * inside the `>= tau` predicate, which both engines evaluate on
    * bit-identical cosine chains ([[graft.similarity.Ann.dotFast]]).
    */
  def embeddingContaminated(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, embCol: String, tau: Double): DataFrame = {
    import graft.similarity.Ann
    val b = broadcast(benchmark.select(col(embCol).as("__be__"),
      Ann.normFast(col(embCol)).as("__bn__")))
    // LEFT OUTER with the hit predicate AS the join condition (ADVICE r9,
    // two findings): (1) an inner cross join + groupBy silently dropped
    // every corpus row when the benchmark was empty — left-outer keeps the
    // per-row contract "(id, n_hits, contaminated) for every input row"
    // with n_hits = 0; (2) a zero-norm embedding made the cosine 0/0 =
    // NaN, and NaN >= tau is TRUE in both engines' comparison order — the
    // `__cn__ > 0 AND __bn__ > 0` guard short-circuits before the divide,
    // so degenerate vectors count as uncontaminated instead of matching
    // everything. Still one BroadcastNestedLoopJoin pass, linear in the
    // corpus; count("__bn__") counts only matched benchmark rows.
    val hit = col("__cn__") > 0 && col("__bn__") > 0 &&
      Ann.dotFast(col("__ce__"), col("__be__")) /
        (col("__cn__") * col("__bn__")) >= tau
    corpus.select(col(idCol), col(embCol).as("__ce__"),
        Ann.normFast(col(embCol)).as("__cn__"))
      .join(b, hit, "left_outer")
      .groupBy(idCol)
      .agg(count(col("__bn__")).as("n_hits"))
      .select(col(idCol), col("n_hits"),
        (col("n_hits") > 0).as("contaminated"))
  }
}

/** Corpus profile statistics: the length-distribution report every corpus
  * card carries. Buckets are log2 via binary-string length — an INTEGER
  * computation both Spark (`length(bin(x))`) and any SQL engine with a
  * binary formatter reproduce exactly, where `floor(log2(x))` on doubles
  * can straddle a power-of-two boundary by one ulp between libms.
  * One partially-aggregated groupBy — the cheapest possible distributed
  * shape; at 100 TB the shuffle carries (groups x ~40 buckets) rows.
  */
object CorpusStats {

  def lengthHistogram(df: DataFrame, lenCol: String,
      groupCols: Seq[String]): DataFrame =
    // bin(0) = "0" has length 1 (same as bin(1)), and a negative length
    // would hit the 64-char two's-complement rendering — route both to a
    // dedicated bucket 0 so bucket b >= 1 always means len in [2^(b-1), 2^b).
    df.groupBy(groupCols.map(col) :+
        when(col(lenCol) <= 0, lit(0L))
          .otherwise(length(bin(col(lenCol))).cast("long")).as("len_bucket"): _*)
      .agg(count(lit(1)).as("n_docs"),
        min(col(lenCol)).as("min_len"),
        max(col(lenCol)).as("max_len"))

  /** The "data card" rollup shipped with a released corpus: per-(source x
    * lang) cells PLUS per-source, per-lang, and grand-total margins, in
    * ONE pass via CUBE — Spark plans an Expand (4 grouping sets) feeding a
    * single partially-aggregated shuffle, instead of four scans. All
    * aggregates are integers (counts/sums/min/max), so the frame is
    * hash-exact across engines. `grp` = grouping_id(source, lang)
    * (source bit MSB): 0 = leaf cell, 1 = per-source margin, 2 = per-lang
    * margin, 3 = grand total — disambiguates a rolled-up NULL from a
    * (here impossible) literal NULL group value.
    */
  def corpusCard(df: DataFrame, sourceCol: String, langCol: String,
      tokenCount: Column): DataFrame =
    df.withColumn("_toks", tokenCount)
      .cube(col(sourceCol), col(langCol))
      .agg(count(lit(1)).as("n_docs"),
        sum("_toks").as("total_tokens"),
        min("_toks").as("min_tokens"),
        max("_toks").as("max_tokens"),
        // grouping_id must resolve against the Aggregate node itself —
        // cube-column order makes source the MSB, matching
        // GROUPING(source)*2 + GROUPING(lang) in the oracle
        grouping_id().cast("long").as("grp"))
}
