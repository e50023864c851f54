package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{DedupMetrics, MinHashConfig, MinHashDedup}

/** sf100 soak (VERDICT r16 #8 — the last decade the sandbox can hold):
  * ~5M documents / ~150M orders, one more decade above the r16 sf10 run.
  * Generates the two tables the targets read (documents for the dedup
  * family, orders for the flagship's synthetic conversations), then
  * times
  *   1. the FLAGSHIP chat pipeline end-to-end,
  *   2. one full `dedup_minhash`-shaped clustering pass (default
  *      routing — reporting which clustering branch DedupMetrics says
  *      actually ran, and that bounded guards routed, at 1000× the
  *      bench corpus),
  *   3. one store-increment night (nightly store build reported
  *      separately, then the |delta|-bound increment).
  *
  * Generation is the SCALABLE shape — a crossJoin with
  * `spark.range(factor)` (one broadcast nested loop over a 1000-row
  * range, no 1000-branch union plan like ScaleGen's `copies`, whose
  * analysis cost grows with the factor): per-copy key offsets keep join
  * consistency, per-copy text suffixes make near- (never exact-)
  * duplicates, so every row genuinely reaches banding and cluster sizes
  * grow with the factor — dedup's worst-scaling dimension.
  *
  * Usage: runMain graft.Sf100Soak [srcDir] [destDir] [factor]
  * Set SPARK_GRAFT_SF100_REUSE=1 to skip generation when destDir is
  * already populated. Prints one JSON line with all wall times.
  */
object Sf100Soak {

  private val DocStride = 1_000_000L
  private val KeyStride = 10_000_000L
  private val CustStride = 1_000_000L

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dest = if (args.length > 1) args(1) else "/tmp/graft_sf100"
    val factor = if (args.length > 2) args(2).toInt else 1000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // Reuse is PER TABLE on the _SUCCESS marker (r19): a killed run's
    // complete tables survive, a partial dir (no marker) regenerates.
    val reuseEnv = sys.env.get("SPARK_GRAFT_SF100_REUSE").contains("1")
    def have(table: String): Boolean =
      new java.io.File(s"$dest/$table/_SUCCESS").exists()
    var reuse = reuseEnv
    val genSec = {
      val (_, g) = timed {
        val copies = spark.range(factor).toDF("copy")
        // repartition the SOURCE before the crossJoin: each sf0.1 table is
        // ONE parquet file = one scan split, so without it the ×1000
        // expansion — 150M rows through the shuffle for repartition(64) —
        // serializes through a single map task (measured r19: that one
        // task spilled >9 GB of sort runs for 37 min on one core while 31
        // cores idled; r18 paid the same shape at 450 s). 32-way source
        // parallelism makes the expansion + shuffle write use the machine.
        def expand(table: String)(f: DataFrame => DataFrame): Unit =
          if (reuseEnv && have(table)) ()
          else {
            reuse = false
            f(spark.read.parquet(s"$src/$table").repartition(32)
              .crossJoin(copies))
              .drop("copy")
              .repartition(64)
              .write.mode("overwrite").parquet(s"$dest/$table")
          }
        expand("documents.parquet") { df =>
          df.withColumn("doc_id", col("doc_id") + col("copy") * DocStride)
            .withColumn("text", when(col("copy") === 0, col("text"))
              .otherwise(concat(col("text"), lit(" variant"), col("copy"))))
        }
        expand("orders.parquet") { df =>
          df.withColumn("o_orderkey", col("o_orderkey") +
            col("copy") * KeyStride)
            .withColumn("o_custkey", col("o_custkey") +
              col("copy") * CustStride)
        }
      }
      g
    }
    val docs = spark.read.parquet(s"$dest/documents.parquet")
    val nDocs = docs.count()
    val nOrders = spark.read.parquet(s"$dest/orders.parquet").count()
    System.err.println(
      f"[sf100] generated docs=$nDocs orders=$nOrders in $genSec%.1fs " +
        s"(reuse=$reuse)")

    // 1. flagship — the full chat pipeline over 1000× the bench orders
    val (flagRows, flagSec) = timed {
      graft.chat.ChatPipeline.flagship(spark, dest).count()
    }
    System.err.println(f"[sf100] flagship rows=$flagRows in $flagSec%.1fs")
    spark.catalog.clearCache()
    graft.dedup.MinHash.clearPermCache()
    System.gc()

    // 2. dedup_minhash shape (the bench query's config) at 5M docs with
    //    DEFAULT routing — record which clustering branch actually ran
    val cfg = MinHashConfig(ngramSize = 3, minNgramSize = 3)
    val dedupBefore = DedupMetrics.counts
    val (dedupKept, dedupSec) = timed {
      MinHashDedup.deduplicate(
        docs.select(col("doc_id"), col("text")), "text", cfg,
        orderCol = Some("doc_id")).count()
    }
    val distFired =
      DedupMetrics.counts.distributed > dedupBefore.distributed
    // PHASE deltas, not cumulative counters: a prior phase's hit must
    // not read beside this phase's flag (r17 VERDICT "what's wrong" #3)
    System.err.println(f"[sf100] dedup_minhash kept=$dedupKept in " +
      f"$dedupSec%.1fs distributedBranch=$distFired " +
      s"(phase ${DedupMetrics.deltaString(dedupBefore)})")
    spark.catalog.clearCache()
    graft.dedup.MinHash.clearPermCache()
    System.gc()

    // 2b. banded-hamming family at the decade (VERDICT r18 #6): one
    //     dedup_simhash-shaped pass — 64-bit signatures, pigeonhole
    //     banding, the depth-bounded bucket recursion — with the guard's
    //     ROUTING EVIDENCE printed (levels run, level-0 max bucket
    //     depth, deep-split levels taken). The 1000×-replicated corpus
    //     is exactly the shape the guard exists for: every "variantN"
    //     family lands its near-identical signatures in one bucket, so
    //     depths scale with the factor, not the corpus.
    val splitsBefore = DedupMetrics.bucketDeepSplits.get
    val simhashBefore = DedupMetrics.counts
    val (simhashKept, simhashSec) = timed {
      graft.dedup.SimHash.deduplicate(
        docs.select(col("doc_id"), col("text")), "text",
        orderCol = Some("doc_id")).count()
    }
    val simhashLevels = DedupMetrics.lastBucketLevels.get
    val simhashMaxDepth = DedupMetrics.lastBucketMaxDepth.get
    val simhashSplits = DedupMetrics.bucketDeepSplits.get - splitsBefore
    System.err.println(f"[sf100] dedup_simhash kept=$simhashKept in " +
      f"$simhashSec%.1fs guard: levels=$simhashLevels " +
      s"maxDepth=$simhashMaxDepth deepSplitLevels=$simhashSplits " +
      s"(phase ${DedupMetrics.deltaString(simhashBefore)})")
    spark.catalog.clearCache()
    graft.dedup.MinHash.clearPermCache()
    System.gc()

    // 3. store-increment night: retained corpus = ≢0 mod 11 slice,
    //    increment = the ≡0 slice (the IncrBench split, one decade up)
    val inc = docs.where(col("doc_id") % 11 === 0)
      .select(col("doc_id"), col("text"))
    val ref = docs.where(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), col("text"))
    val buildBefore = DedupMetrics.counts
    val (store, buildSec) = timed {
      MinHashDedup.exportBandedStore(ref, "text",
        "/tmp/graft_sf100_store", cfg, orderCol = Some("doc_id"))
    }
    System.err.println(f"[sf100] store build $buildSec%.1fs " +
      s"(phase ${DedupMetrics.deltaString(buildBefore)})")
    spark.catalog.clearCache()
    graft.dedup.MinHash.clearPermCache()
    System.gc()
    val incBefore = DedupMetrics.counts
    val (incKept, incSec) = timed {
      MinHashDedup.deduplicateAgainstStore(inc, store, "text", cfg,
        orderCol = Some("doc_id")).count()
    }
    System.err.println(f"[sf100] increment kept=$incKept in $incSec%.1fs " +
      s"(phase ${DedupMetrics.deltaString(incBefore)})")
    spark.catalog.clearCache()
    System.gc()

    // 4. arrow interop at the decade (r17 VERDICT ask #5): save the full
    //    corpus in the HF layout (zstd batches — the publish-scale
    //    configuration) and stream it back; one task per shard both
    //    ways, so this is the 1000×-scale proof of the
    //    shard-per-partition / batch-streaming design. Dir dropped after
    //    the read — the bytes, not the artifact, are the datum.
    val arrowDir = s"$dest/arrow_zstd"
    val (_, arrowSaveSec) = timed {
      graft.sources.ArrowDataset.save(
        docs.select(col("doc_id"), col("text")), arrowDir,
        compression = "zstd")
    }
    val arrowBytes = {
      val d = new java.io.File(arrowDir)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".arrow")).map(_.length()).sum
    }
    val (arrowRows, arrowLoadSec) = timed {
      graft.sources.ArrowDataset.load(spark, arrowDir).count()
    }
    System.err.println(f"[sf100] arrow save $arrowSaveSec%.1fs " +
      f"(${arrowBytes / 1e6}%.0f MB zstd), load+count $arrowLoadSec%.1fs " +
      s"rows=$arrowRows (match=${arrowRows == nDocs})")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(arrowDir))

    println(f"""{"metric":"sf100_soak","docs":$nDocs,"orders":$nOrders,""" +
      f""""factor":$factor,"gen_sec":$genSec%.1f,""" +
      f""""flagship_rows":$flagRows,"flagship_sec":$flagSec%.1f,""" +
      f""""dedup_kept":$dedupKept,"dedup_sec":$dedupSec%.1f,""" +
      f""""distributed_branch":$distFired,""" +
      f""""simhash_kept":$simhashKept,"simhash_sec":$simhashSec%.1f,""" +
      f""""simhash_levels":$simhashLevels,""" +
      f""""simhash_max_depth":$simhashMaxDepth,""" +
      f""""simhash_deep_split_levels":$simhashSplits,""" +
      f""""store_build_sec":$buildSec%.1f,""" +
      f""""incr_kept":$incKept,"incr_sec":$incSec%.1f,""" +
      f""""arrow_save_sec":$arrowSaveSec%.1f,""" +
      f""""arrow_mb_zstd":${arrowBytes / 1e6}%.0f,""" +
      f""""arrow_load_sec":$arrowLoadSec%.1f,""" +
      f""""arrow_rows_match":${arrowRows == nDocs}""" + "}")
    spark.stop()
  }
}
