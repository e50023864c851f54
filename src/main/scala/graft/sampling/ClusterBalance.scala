package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-balanced diversity sampling — cap every learned k-means cell
  * of the embedding space at a per-cell quota (DataComp / SSL-curation
  * shape: SemDeDup removes near-duplicate REGIONS, this caps
  * over-represented TOPICS; together they flatten the cluster-size
  * distribution a web crawl's redundancy induces).
  *
  * The cells come from [[graft.similarity.Ann.kmeansAssign]] — the same
  * seeded Lloyd trainer the IVF index and SemDeDup use (sample-trained:
  * driver holds k×dim doubles regardless of corpus size). Within a cell,
  * rows are kept in seeded-md5 order (the [[Mixture]] key shape) so the
  * sample is deterministic under any partitioning, or by a caller-
  * supplied priority column (quality-descending — keep the BEST of each
  * topic, not a random slice).
  *
  * Scale shape: one window shuffle partitioned by cell. Parallelism is
  * #cells — unlike the per-source mixture window (5-20 sources at
  * 100 TB, the r8 scale-killer), k is a KNOB: pick k ≫ executor count
  * (FAISS-style 4·√n cells puts ~√n/4 rows in a cell) and each task
  * sorts corpus/k rows. The quota output is bounded at k×quota rows.
  */
object ClusterBalance {

  /** Keep at most `quota` rows per k-means cell, in seeded-md5 order
    * (`orderBy = None`) or by an explicit priority column. Returns the
    * kept rows plus the `cellCol` assignment.
    */
  def sampleBalanced(df: DataFrame, embCol: String, idCol: String,
      k: Int, quota: Int, seed: Long, cellCol: String = "cell",
      iters: Int = 3, trainFraction: Double = 1.0,
      orderBy: Option[Column] = None): DataFrame = {
    val assigned = graft.similarity.Ann.kmeansAssign(df, embCol, idCol,
      cellCol, k, iters, trainFraction)
    capPerCell(assigned, idCol, cellCol, quota, seed, orderBy)
  }

  /** The quota pass alone, over an existing cell assignment. */
  def capPerCell(assigned: DataFrame, idCol: String, cellCol: String,
      quota: Int, seed: Long, orderBy: Option[Column] = None): DataFrame = {
    val key = orderBy.getOrElse(
      md5(concat(lit(s"$seed:"), col(idCol).cast("string"))))
    val w = Window.partitionBy(col(cellCol)).orderBy(key, col(idCol))
    assigned.withColumn("__rn__", row_number().over(w))
      .where(col("__rn__") <= quota)
      .drop("__rn__")
  }
}
