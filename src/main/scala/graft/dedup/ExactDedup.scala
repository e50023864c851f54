package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact deduplication — hash-groupBy on the key expression(s), keeping the
  * row with the smallest order column ("keep first"). One shuffle on the
  * key; at 100 TB the groupBy partial-aggregates map-side so only distinct
  * keys shuffle.
  */
object ExactDedup {

  /** Keep one row per key: the one minimizing `order`. Implemented as a
    * window `row_number` so the FULL row survives (a groupBy+min would drop
    * non-key columns).
    */
  def deduplicate(df: DataFrame, keys: Seq[Column], order: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order)
    df.withColumn("__rn__", row_number().over(w))
      .where(col("__rn__") === 1)
      .drop("__rn__")
  }

  /** Whole-row exact dedup (`DISTINCT`). */
  def distinctRows(df: DataFrame): DataFrame = df.distinct()

  /** Incremental exact dedup against a reference corpus via a BROADCAST
    * Bloom filter: drop `newDf` rows whose `column` value is (probably)
    * already in `refDf`.
    *
    * The 100 TB rationale: the exact formulation is a left-anti join —
    * a full shuffle of BOTH corpora on the dedup key every time a new
    * batch arrives. A Bloom filter of the reference keys is built once
    * (one aggregate pass, `expectedItems`/`fpp`-sized bits on the
    * driver), broadcast, and applied as a narrow filter on the new
    * batch — no shuffle of either side. The trade is explicit: a false
    * positive drops a genuinely-new row with probability ≤ `fpp`
    * (choose 1e-9 and the expected loss on a billion-row batch is one
    * row); false negatives are impossible, so no duplicate ever
    * survives that the exact join would have caught.
    *
    * Spark's `DataFrameStatFunctions.bloomFilter` aggregates the filter
    * distributedly (per-partition filters OR-merged), so only the final
    * bit array reaches the driver.
    */
  def bloomDedupAgainst(newDf: DataFrame, refDf: DataFrame, column: String,
      expectedItems: Long = 0L, fpp: Double = 1e-9): DataFrame = {
    // Sizing contract (ADVICE r9 + r10): an undersized filter silently
    // degrades fpp — at 4.5× oversubscription the realized false-positive
    // rate reaches tens of percent and genuinely-fresh rows are silently
    // dropped. expectedItems <= 0 auto-sizes from a measured reference
    // count (one column-pruned counting job). An EXPLICIT expectedItems
    // is TRUSTED without validation (r10 advice): counting the reference
    // to validate it costs a full pass over a potentially huge corpus per
    // call, undercutting the "only the bit array reaches the driver" cost
    // profile — so when you size explicitly, the no-oversubscription
    // guarantee is YOUR contract; pass <= 0 to have it measured. To keep
    // that contract OBSERVABLE at zero extra passes (ADVICE r11), the
    // built filter's REALIZED fpp (BloomFilter.expectedFpp() — computed
    // from actual bit saturation, so oversubscription shows up directly)
    // is checked against the request: >10× degradation logs loudly.
    val sized =
      if (expectedItems > 0L) expectedItems
      else math.max(refDf.count(), 1L)
    val bf = refDf.stat.bloomFilter(column, sized, fpp)
    if (expectedItems > 0L && bf.expectedFpp() > fpp * 10) {
      org.apache.log4j.Logger.getLogger(getClass).warn(
        f"bloomDedupAgainst: explicit expectedItems=$expectedItems undersized " +
          f"— realized fpp ${bf.expectedFpp()}%.3g vs requested $fpp%.3g; " +
          "genuinely-fresh rows WILL be dropped at the realized rate. " +
          "Pass expectedItems <= 0 to auto-size from a measured count.")
    }
    val b = newDf.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf { (v: String) => v != null && b.value.mightContainString(v) }
    newDf.where(!mightContain(col(column)))
  }
}
