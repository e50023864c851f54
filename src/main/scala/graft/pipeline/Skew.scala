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
}
