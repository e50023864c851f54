package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact word-n-gram Jaccard similarity + LSH-accelerated near-dedup:
  * MinHash banding proposes candidates (recall), exact Jaccard verifies
  * (precision) — the classic two-stage shape. All set math is `Column`-only.
  */
object NgramJaccard {

  /** Distinct word n-grams (lowercased `[a-z0-9_]+` words). Column-only:
    * `sequence` + `slice` + `concat_ws`, no UDF. NOTE: the split
    * subexpression is re-evaluated per lambda element — when applying to
    * many rows, stage the word array in its own projection first
    * ([[ngramsFromWords]]) or the cost is O(words²) per row.
    */
  def wordNgrams(c: Column, n: Int): Column =
    ngramsFromWords(
      filter(split(lower(c), "[^a-z0-9_]+"), w => length(w) > 0), n)

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

  /** Near-dedup via MinHash candidates + exact-Jaccard verification at
    * `threshold`, keep-first. More precise than banding alone (LSH false
    * positives are filtered by the exact check).
    */
  def deduplicate(df: DataFrame, column: String, n: Int = 5,
      threshold: Double = 0.7,
      cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    val withId = df
      .withColumn(MinHashDedup.IdCol, monotonically_increasing_id())
      .persist()
    val sig = MinHashDedup.signatureColumn(cfg.copy(ngramSize = n,
      minNgramSize = n, threshold = threshold))
    // Candidate edges are STAR-SHAPED per bucket (each member vs the bucket
    // min — the reference's own union-to-min shape): O(bucket) edges, not
    // O(bucket²) pairs, and only bare id pairs shuffle — the n-gram arrays
    // are joined back just for the verification stage.
    val banded = withId.select(col(MinHashDedup.IdCol).as("id"),
      posexplode(sig(col(column))).as(Seq("band", "bsig")))
    val candidates = banded.groupBy("band", "bsig")
      .agg(collect_list(col("id")).as("ids"))
      .where(size(col("ids")) > 1)
      .select(explode(col("ids")).as("x"), array_min(col("ids")).as("y"))
      .where(col("x") =!= col("y"))
      .distinct()
      .persist()
    // n-grams ONLY for rows that appear in a candidate pair (usually a
    // tiny fraction of the corpus), with the word split staged once per
    // row — not re-evaluated inside the n-gram lambda
    val candIds = candidates.select(col("x").as("gid"))
      .union(candidates.select(col("y").as("gid"))).distinct()
    val grams = withId
      .select(col(MinHashDedup.IdCol).as("gid"), col(column))
      .join(candIds, Seq("gid"), "left_semi")
      .withColumn("__w__",
        filter(split(lower(col(column)), "[^a-z0-9_]+"),
          w => length(w) > 0))
      .select(col("gid"), ngramsFromWords(col("__w__"), n).as("g"))
      .persist()
    val verified = candidates
      .join(grams.select(col("gid").as("x"), col("g").as("ga")), Seq("x"))
      .join(grams.select(col("gid").as("y"), col("g").as("gb")), Seq("y"))
      .where(jaccard(col("ga"), col("gb")) >= threshold)
      .select(col("x"), col("y")).groupBy("x").agg(min("y").as("y"))
    val edges = verified.collect().map(r => (r.getLong(0), r.getLong(1)))
    candidates.unpersist()
    grams.unpersist()
    val roots = ConnectedComponents.unionFindRoots(edges)
    val bRoots = df.sparkSession.sparkContext.broadcast(roots)
    val keepUdf = udf { (id: Long) => bRoots.value.getOrElse(id, id) == id }
    withId.where(keepUdf(col(MinHashDedup.IdCol))).drop(MinHashDedup.IdCol)
  }
}
