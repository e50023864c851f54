package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan capture for the dedup CANDIDATE trunks (r20): the declared dedup
  * queries' final plans are the post-clustering keep filter — the
  * signature/banding/edge subtree runs inside the eager edge probe and
  * never appears in `Explain`'s output. This prints the edge-frame plans
  * so trunk-level claims (e.g. the fused shingleability gate replacing
  * `size(split(...))`) are auditable from committed artifacts.
  */
object TrunkExplain {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Queries.table(spark, sf, "documents")
    val cfg = graft.dedup.MinHashConfig(ngramSize = 3, minNgramSize = 3)
    val withId = docs.withColumn(graft.dedup.MinHashDedup.IdCol,
      col("doc_id").cast("long"))
    println("\n===== minhash_candidate_edges =====")
    graft.dedup.MinHashDedup.candidateEdges(withId, "text", cfg)
      .explain("formatted")
    println("\n===== ngram_jaccard_verified_edges =====")
    graft.dedup.NgramJaccard.verifiedEdges(withId, "text", 3, 0.5, cfg)
      .explain("formatted")
    spark.stop()
  }
}
