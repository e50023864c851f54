package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase split for flagship_chat_pipeline (r19, guide §1): R1/R2 flat
  * trunk vs cleaners vs filters vs dedup vs prefix rebuild. Ad-hoc.
  */
object FsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.chat.ChatPipeline
    import graft.pipeline.{MiniYaml, PipelineConfig, Preprocessor}

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[fsprobe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val cfg = MiniYaml.parse(ChatPipeline.FlagshipYaml)
    val respCfg = PipelineConfig.columnConfig(
      cfg("response_config").asInstanceOf[Map[String, Any]])
    val instrCfg = PipelineConfig.columnConfig(
      cfg("instruction_config").asInstanceOf[Map[String, Any]])

    def io = {
      val msgs = ChatPipeline.syntheticMessages(spark, sfDir)
      val numPart = math.max(spark.sparkContext.defaultParallelism,
        spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)
      msgs.where(col("do_train"))
        .select(col("custkey"), col("pos0"), col("role"), col("source"),
          graft.text.Cleaners.stripWs(col("content")).as("response"),
          when(col("pos0") > 0, graft.text.Cleaners.stripWs(col("prev")))
            .otherwise(lit("")).as("instruction"),
          (col("custkey") * (1L << 20) + col("pos0")).as("__mid__"))
        .repartition(numPart, col("custkey"), col("pos0"))
    }

    graft.chat.ChatPipeline.flagship(spark, sfDir, None).count() // warm

    (1 to 2).foreach { rep =>
      println(s"[fsprobe] --- rep $rep ---")
      spark.catalog.clearCache(); graft.dedup.MinHash.clearPermCache(); System.gc()
      timed("R1R2 flat io (noop)") { noop(io) }
      timed("+ cleaners (noop)") {
        noop(new Preprocessor(io, "response", respCfg.cleaners,
          Seq.empty, None).run())
      }
      timed("+ filters (noop)") {
        noop(new Preprocessor(io, "response", respCfg.cleaners,
          respCfg.filters, None).run())
      }
      timed("+ resp dedup = kept1 (noop)") {
        noop(new Preprocessor(io, "response", respCfg.cleaners,
          respCfg.filters, respCfg.dedup, dedupOrderCol = Some("__mid__")).run())
      }
      spark.catalog.clearCache(); graft.dedup.MinHash.clearPermCache(); System.gc()
      timed("flagshipKept (noop)") {
        noop(graft.chat.ChatPipeline.flagshipKept(spark, sfDir))
      }
      spark.catalog.clearCache(); graft.dedup.MinHash.clearPermCache(); System.gc()
      timed("full flagship.count()") {
        graft.chat.ChatPipeline.flagship(spark, sfDir, None).count()
      }
      spark.catalog.clearCache(); graft.dedup.MinHash.clearPermCache(); System.gc()
      locally {
        val f = timed("flagship BUILD only") {
          graft.chat.ChatPipeline.flagship(spark, sfDir, None)
        }
        println("[fsprobe]   persisted RDDs after build = " +
          spark.sparkContext.getPersistentRDDs.size)
        timed("flagship COUNT after build") { f.count() }
        timed("flagship COUNT again") { f.count() }
      }
      // what-if: hold the filtered-trunk pin across the whole action so
      // the post-releasePinIf re-run reads cache instead of recomputing
      spark.catalog.clearCache(); graft.dedup.MinHash.clearPermCache(); System.gc()
      timed("flagship w/ pinned trunk") {
        val cleaned = Preprocessor.clean(io, "response", respCfg.cleaners)
        val filtered = Preprocessor.applyFilters(cleaned, "response",
          respCfg.filters).persist()
        try {
          val kept1 = graft.dedup.MinHashDedup.deduplicate(filtered,
            "response", respCfg.dedup.get, orderCol = Some("__mid__"))
          val kept = new Preprocessor(kept1, "instruction", Seq.empty,
            instrCfg.filters, instrCfg.dedup,
            dedupOrderCol = Some("__mid__")).run()
          val msgs = ChatPipeline.syntheticMessages(spark, sfDir)
          val prefixParts = kept.select(col("custkey").as("k"), col("pos0").as("p"))
            .join(msgs.select(col("custkey").as("k"), col("pos0").as("mp"),
              col("content").as("mc"), col("role").as("mr")), Seq("k"))
            .where(col("mp") < col("p"))
            .groupBy(col("k"), col("p"))
            .agg(count(lit(1)).as("np"))
          println("[fsprobe]   kept rows = " + kept.join(prefixParts,
            col("custkey") === col("k") && col("pos0") === col("p"), "left").count())
        } finally filtered.unpersist()
      }
    }
    spark.stop()
  }
}
