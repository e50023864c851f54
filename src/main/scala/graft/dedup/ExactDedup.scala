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
}
