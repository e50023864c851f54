package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.{DedupMetrics, MinHashConfig, MinHashDedup}

/** One-shot scale soak (VERDICT r6 #1): at the derived sf1 corpus, run
  * minhash dedup through BOTH clustering paths — driver UnionFind and the
  * `maxDriverEdges`-overflow distributed min-label branch — and assert
  * identical kept counts, printing the DedupMetrics proof that the
  * 100 TB branch actually executed at this scale. (ScaleSoakSpec proves
  * set-level equality at sf0.01 on every test run; this main exercises
  * the same crossover on 50k docs / ~10^5-edge lists.)
  *
  * Usage: runMain graft.Soak [sfDir]
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val cfg = MinHashConfig(ngramSize = 3, minNgramSize = 3)

    val t0 = System.nanoTime()
    val keptDriver = MinHashDedup.deduplicate(docs, "text", cfg,
      maxDriverEdges = 10_000_000L, orderCol = Some("doc_id")).count()
    val tDriver = (System.nanoTime() - t0) / 1e9

    val before = DedupMetrics.distributedPath.get
    val t1 = System.nanoTime()
    val keptDist = MinHashDedup.deduplicate(docs, "text", cfg,
      maxDriverEdges = 1L, orderCol = Some("doc_id")).count()
    val tDist = (System.nanoTime() - t1) / 1e9
    val fired = DedupMetrics.distributedPath.get == before + 1

    println(f"[soak] dir=$dir docs=${docs.count()} " +
      f"driverPath: kept=$keptDriver in $tDriver%.1fs; " +
      f"distributedPath: kept=$keptDist in $tDist%.1fs; " +
      f"branchFired=$fired equal=${keptDriver == keptDist} " +
      s"(${DedupMetrics.snapshot})")
    assert(fired && keptDriver == keptDist,
      "distributed clustering diverged or did not fire")

    // Skewed-banding soak: a ~20k-deep NEAR-dup cluster (unique suffixes,
    // so the identical-text collapse cannot absorb it — every row really
    // reaches banding and lands in the same hot (band, bsig) buckets).
    // The streaming window bucket-min must survive it without a
    // reducer-side array; the star edges keep the edge count linear in
    // bucket depth (not quadratic).
    val hotText = docs.where(col("doc_id") === 7)
      .select("text").head().getString(0)
    val hot = spark.range(20000).select(
      (col("id") + 100_000_000L).as("doc_id"),
      concat(lit(hotText), lit(" v"), col("id")).as("text"))
    val skewed = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("text")).unionByName(hot)
    val t2 = System.nanoTime()
    val top = graft.dedup.MinHashDedup
      .clusterSizeStats(skewed, "text", cfg, orderCol = Some("doc_id"))
      .orderBy(col("cluster_size").desc).limit(1).collect()
    val tSkew = (System.nanoTime() - t2) / 1e9
    val largest = top.head.getLong(0)
    println(f"[soak] skew: ${skewed.count()} docs incl one 20k near-dup " +
      f"class; largest cluster=$largest in $tSkew%.1fs")
    assert(largest >= 20000L,
      s"hot near-dup class did not cluster (largest=$largest)")
    spark.stop()
  }
}
