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
  * (e.g. a hash range), packing runs per bucket in parallel, and the
  * emitted bin id is globally unique — `bucket * 2^32 + localBin`, a
  * single scalar callers can group on directly. Bin FILL is as tight,
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

  /** Scale path: per-bucket packing, one globally-unique scalar bin id.
    *
    * `binCol` = `bucket << 32 | localBin` — unique across buckets for any
    * integral bucket values because the local bin index is always in
    * [0, 2^32) (2^32 budget-sized bins per bucket is beyond any real
    * bucket's size; bucket the data finer long before that). No helper
    * columns are added to the output.
    */
  def assignBinsPartitioned(df: DataFrame, tokenCol: String,
      bucketCol: Column, order: Seq[Column], budget: Long,
      binCol: String = "bin"): DataFrame = {
    val w = Window.partitionBy(bucketCol).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val localBin = floor(coalesce(sum(col(tokenCol)).over(w), lit(0L)) / budget)
    df.withColumn(binCol, shiftleft(bucketCol.cast("long"), 32) + localBin)
  }
}
