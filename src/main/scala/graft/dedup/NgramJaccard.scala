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
    val grams = withId.select(col(MinHashDedup.IdCol).as("id"),
      wordNgrams(col(column), n).as("g"),
      posexplode(sig(col(column))).as(Seq("band", "bsig")))
    val candidates = grams.groupBy("band", "bsig")
      .agg(collect_list(struct(col("id"), col("g"))).as("bucket"))
      .where(size(col("bucket")) > 1)
      .select(explode(col("bucket")).as("a"), col("bucket"))
      .select(col("a"), explode(col("bucket")).as("b"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("x"), col("b.id").as("y"),
        col("a.g").as("ga"), col("b.g").as("gb"))
      .dropDuplicates("x", "y")
    val verified = candidates
      .where(jaccard(col("ga"), col("gb")) >= threshold)
      .select(col("y"), col("x")).groupBy("y").agg(min("x").as("x"))
    val edges = verified.collect().map(r => (r.getLong(0), r.getLong(1)))
    val roots = ConnectedComponents.unionFindRoots(edges)
    val bRoots = df.sparkSession.sparkContext.broadcast(roots)
    val keepUdf = udf { (id: Long) => bRoots.value.getOrElse(id, id) == id }
    withId.where(keepUdf(col(MinHashDedup.IdCol))).drop(MinHashDedup.IdCol)
  }
}
