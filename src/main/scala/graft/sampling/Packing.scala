package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batches: assign documents to
  * fixed-token-budget bins by contiguous fill over a deterministic order
  * (bin = floor(running-token-prefix / budget) — the "concat then chunk"
  * packing used by most pretraining data loaders; a document whose tokens
  * straddle a boundary belongs to the bin its FIRST token lands in).
  *
  * [[assignBins]] is the exact global form (one total-order window —
  * SQL-mirrorable, fine up to validation scale). [[assignBinsPartitioned]]
  * is the 100 TB shape: documents are first bucketed by a partition key
  * (e.g. a hash range), packing runs per bucket in parallel, and bin ids
  * are made globally unique as (bucket, local bin) — bin FILL is as tight,
  * only bin NUMBERING differs from the global form.
  */
object Packing {

  /** Exact global packing: bin id per document over `order`. */
  def assignBins(df: DataFrame, tokenCol: String, order: Seq[Column],
      budget: Long, binCol: String = "bin"): DataFrame = {
    val w = Window.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(binCol,
      floor(coalesce(sum(col(tokenCol)).over(w), lit(0L)) / budget))
  }

  /** Scale path: per-bucket packing, globally-unique (bucket, bin) pair. */
  def assignBinsPartitioned(df: DataFrame, tokenCol: String,
      bucketCol: Column, order: Seq[Column], budget: Long,
      binCol: String = "bin"): DataFrame = {
    val w = Window.partitionBy(bucketCol).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__bucket__", bucketCol)
      .withColumn(binCol,
        floor(coalesce(sum(col(tokenCol)).over(w), lit(0L)) / budget))
  }
}
