package graft.sampling

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stratified-by-user sampling (SURVEY.md §2.5 P9/P10 — utils.py:205-236):
  * groups with <5 rows are kept whole; larger groups are uniformly sampled
  * down to ⌊len·fraction⌋ rows (tames superusers). One window shuffle on
  * the user key; seeded (the reference's pandas `.sample()` is unseeded —
  * deliberate determinism divergence, SURVEY.md §7.4).
  */
object Sampling {

  /** P10 `sample_dataset` — utils.py:218-236. */
  def sampleDataset(df: DataFrame, userCol: String, fraction: Double,
      seed: Long = 42): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    val wOrd = w.orderBy(rand(seed))
    df.withColumn("__cnt__", count(lit(1)).over(w))
      .withColumn("__rn__", row_number().over(wOrd))
      .where(col("__cnt__") < 5 ||
        col("__rn__") <= floor(col("__cnt__") * fraction))
      .drop("__cnt__", "__rn__")
  }

  /** P9 `sample_datasets` — utils.py:205-215: mix N datasets at target
    * proportions; effective target = min(target, min_i(len_i / prop_i));
    * per-dataset fraction = target·prop/len, then stratified-sample each
    * and union.
    */
  def sampleDatasets(datasets: Seq[DataFrame], proportions: Seq[Double],
      targetSize: Double, userCol: String, seed: Long = 42): DataFrame = {
    require(datasets.nonEmpty && datasets.size == proportions.size)
    // ONE sizing job over the tagged union (map-side-combined counts)
    // instead of a count() action per input dataset
    val counts = datasets.zipWithIndex
      .map { case (df, i) => df.select(lit(i).as("__ds__")) }
      .reduce(_.union(_))
      .groupBy("__ds__").agg(count(lit(1)).as("__n__"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sizes = datasets.indices.map(i => counts.getOrElse(i, 0L).toDouble)
    val effective = (targetSize +: sizes.zip(proportions).map {
      case (len, p) => len / p
    }).min
    val sampled = datasets.zip(proportions).zip(sizes).map {
      case ((df, p), len) =>
        sampleDataset(df, userCol, effective * p / len, seed)
    }
    sampled.reduce(_.unionByName(_))
  }
}
