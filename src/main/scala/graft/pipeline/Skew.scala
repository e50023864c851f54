package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at scale.
  *
  * AQE's skew-join handling covers joins; for AGGREGATIONS over power-law
  * keys (the `user_id` distributions this pipeline meets constantly) the
  * classic fix is two-stage salted aggregation: shuffle once on
  * (key, salt) so a hot key's rows spread over `saltBuckets` reducers,
  * then combine the partials with a second (tiny) shuffle on the key.
  */
object Skew {

  /** Two-stage salted count per key — result identical to
    * `df.groupBy(key).count()`, shuffle skew bounded by `saltBuckets`.
    */
  def saltedCount(df: DataFrame, key: String,
      saltBuckets: Int = 32): DataFrame =
    df.withColumn("__salt__",
        pmod(spark_partition_id() + monotonically_increasing_id(),
          lit(saltBuckets)))
      .groupBy(col(key), col("__salt__"))
      .agg(count(lit(1)).as("__partial__"))
      .groupBy(col(key))
      .agg(sum(col("__partial__")).as("count"))

  /** General two-stage salted aggregation for algebraic aggregates: pass
    * the partial aggregate and its combiner (e.g. sum/sum, count/sum,
    * min/min).
    */
  def saltedAgg(df: DataFrame, key: String, valueCol: Column,
      partial: Column => Column, combine: Column => Column,
      resultName: String, saltBuckets: Int = 32): DataFrame =
    df.withColumn("__salt__",
        pmod(spark_partition_id() + monotonically_increasing_id(),
          lit(saltBuckets)))
      .withColumn("__v__", valueCol)
      .groupBy(col(key), col("__salt__"))
      .agg(partial(col("__v__")).as("__partial__"))
      .groupBy(col(key))
      .agg(combine(col("__partial__")).as(resultName))

  /** Salted join for a skewed LEFT side against a right side too big to
    * broadcast: left rows get a random salt in [0, saltBuckets), right
    * rows are replicated once per salt value, and the join key becomes
    * (key, salt) — a hot key's rows spread over `saltBuckets` reducers
    * instead of serializing on one. Result is identical to
    * `left.join(right, key, joinType)`.
    *
    * Use when AQE's runtime skew-split can't help: skew inside a single
    * key (AQE splits skewed PARTITIONS, but one giant key hashed to one
    * partition can only be split by changing the key), or plans where
    * the skewed exchange feeds a window/aggregate first. The cost is
    * explicit: the right side shuffles `saltBuckets`× its size — size
    * the bucket count to the skew, not higher.
    *
    * `joinType` must be "inner" or a left join ("left", "left_outer",
    * "left_semi", "left_anti"): an unmatched LEFT row carries exactly
    * one salt so appears exactly once, but unmatched RIGHT rows exist
    * once per replica and would duplicate under right/full joins.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int = 32, joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(allowed.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val l = left.withColumn("__salt__",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)).cast("int"))
    val r = right.withColumn("__salt__",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    l.join(r, Seq(key, "__salt__"), joinType).drop("__salt__")
  }
}
