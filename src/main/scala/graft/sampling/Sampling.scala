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

  /** ONE sizing job over the tagged union (map-side-combined counts)
    * instead of a count() action per input dataset.
    */
  private def datasetSizes(datasets: Seq[DataFrame]): Seq[Double] = {
    val counts = datasets.zipWithIndex
      .map { case (df, i) => df.select(lit(i).as("__ds__")) }
      .reduce(_.union(_))
      .groupBy("__ds__").agg(count(lit(1)).as("__n__"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    datasets.indices.map(i => counts.getOrElse(i, 0L).toDouble)
  }

  private def mix(datasets: Seq[DataFrame], proportions: Seq[Double],
      sizes: Seq[Double], targetSize: Double, userCol: String,
      seed: Long): DataFrame = {
    val effective = (targetSize +: sizes.zip(proportions).map {
      case (len, p) => len / p
    }).min
    val sampled = datasets.zip(proportions).zip(sizes).map {
      case ((df, p), len) =>
        sampleDataset(df, userCol, effective * p / len, seed)
    }
    sampled.reduce(_.unionByName(_))
  }

  /** P9 `sample_datasets` — utils.py:205-215: mix N datasets at target
    * proportions; effective target = min(target, min_i(len_i / prop_i));
    * per-dataset fraction = target·prop/len, then stratified-sample each
    * and union.
    */
  def sampleDatasets(datasets: Seq[DataFrame], proportions: Seq[Double],
      targetSize: Double, userCol: String, seed: Long = 42): DataFrame = {
    require(datasets.nonEmpty && datasets.size == proportions.size)
    mix(datasets, proportions, datasetSizes(datasets), targetSize,
      userCol, seed)
  }

  /** Temperature-weighted mixing (the multilingual/multi-corpus LLM
    * recipe — T5/mT5, XLM-R): dataset `i` gets proportion
    * `n_i^(1/T) / Σ_j n_j^(1/T)`. T=1 reproduces natural (by-size)
    * proportions; T→∞ approaches uniform; the usual T∈[2,5] up-weights
    * small corpora without drowning large ones. Proportions are derived
    * from the SAME single sizing job, then the mix follows
    * [[sampleDatasets]]' effective-size rules.
    *
    * `math.pow(n, 0.5)` is not IEEE-exact-rounded, so for T=2 the weight
    * uses `math.sqrt` (which IS) — cross-engine mirrors (the DuckDB
    * oracle) reproduce the driver's doubles bit-for-bit.
    */
  def temperatureMix(datasets: Seq[DataFrame], temperature: Double,
      targetSize: Double, userCol: String, seed: Long = 42): DataFrame = {
    require(datasets.nonEmpty && temperature > 0)
    val sizes = datasetSizes(datasets)
    val weights = sizes.map { n =>
      if (temperature == 2.0) math.sqrt(n) else math.pow(n, 1.0 / temperature)
    }
    val total = weights.sum
    val props = weights.map(_ / total)
    mix(datasets, props, sizes, targetSize, userCol, seed)
  }
}
