package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact word-n-gram Jaccard similarity + LSH-accelerated near-dedup:
  * MinHash banding proposes candidates (recall), exact Jaccard verifies
  * (precision) — the classic two-stage shape. All set math is `Column`-only.
  */
object NgramJaccard {

  /** Distinct word n-grams (lowercased `[a-z0-9_]+` words). Column-only:
    * `sequence` + `slice` + `concat_ws`, no UDF.
    */
  def wordNgrams(c: Column, n: Int): Column = {
    val words = filter(split(lower(c), "[^a-z0-9_]+"), w => length(w) > 0)
    when(size(words) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n))))))
  }

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
    val grams = withId.select(col(MinHashDedup.IdCol).as("gid"),
      wordNgrams(col(column), n).as("g")).persist()
    val verified = candidates
      .join(grams.select(col("gid").as("x"), col("g").as("ga")), Seq("x"))
      .join(grams.select(col("gid").as("y"), col("g").as("gb")), Seq("y"))
      .where(jaccard(col("ga"), col("gb")) >= threshold)
      .select(col("x"), col("y")).groupBy("x").agg(min("y").as("y"))
    val edges = verified.collect().map(r => (r.getLong(0), r.getLong(1)))
    grams.unpersist()
    val roots = ConnectedComponents.unionFindRoots(edges)
    val bRoots = df.sparkSession.sparkContext.broadcast(roots)
    val keepUdf = udf { (id: Long) => bRoots.value.getOrElse(id, id) == id }
    withId.where(keepUdf(col(MinHashDedup.IdCol))).drop(MinHashDedup.IdCol)
  }
}
