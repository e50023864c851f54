package graft.sources

import org.apache.spark.sql.SparkSession

/** PERF probe for the r17 HF-arrow interop path (FtfyProbe/SpDivergence
  * precedent: measure, don't guess): times `ArrowDataset.save` and
  * `.load` of the documents table against the same data's parquet
  * write/read, plus a column-pruned arrow load. One JSON line.
  *
  *   sbt "runMain graft.sources.ArrowProbe [sfDir] [shards]"
  */
object ArrowProbe {
  private def t[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shards = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(shards).persist()
    val rows = docs.count() // materialize once; exclude read from timings

    val arrowDir = "/tmp/graft_arrow_probe"
    val pqDir = "/tmp/graft_arrow_probe_pq"
    // clean slate: save() overwrites manifested shards by name, so a
    // prior run with MORE shards would leave orphans that inflate the
    // size sum below (load follows state.json either way)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(arrowDir))
    val (saveS, _) = t { ArrowDataset.save(docs, arrowDir) }
    val (pqWriteS, _) = t {
      docs.write.mode("overwrite").parquet(pqDir)
    }
    val (loadS, loadedRows) =
      t { ArrowDataset.load(spark, arrowDir).count() }
    val (pqReadS, _) = t { spark.read.parquet(pqDir).count() }
    val (prunedS, _) = t {
      ArrowDataset.load(spark, arrowDir,
        columns = Seq("doc_id", "n_chars")).count()
    }
    require(loadedRows == rows, s"row loss: $loadedRows != $rows")

    // compressed save (r18): IPC body compression, the publish-scale
    // configuration — measures the write premium and the byte saving
    val zstdDir = "/tmp/graft_arrow_probe_zstd"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(zstdDir))
    val (zstdSaveS, _) =
      t { ArrowDataset.save(docs, zstdDir, compression = "zstd") }
    val (zstdLoadS, zstdRows) =
      t { ArrowDataset.load(spark, zstdDir).count() }
    require(zstdRows == rows, s"zstd row loss: $zstdRows != $rows")

    def dirBytes(d: String, suffix: String): Long =
      new java.io.File(d).listFiles()
        .filter(_.getName.endsWith(suffix)).map(_.length).sum
    val arrowBytes = dirBytes(arrowDir, ".arrow")
    val zstdBytes = dirBytes(zstdDir, ".arrow")
    val pqBytes = dirBytes(pqDir, ".parquet")
    println(f"""{"metric":"arrow_probe","sf":"$sfDir","rows":$rows,""" +
      f""""shards":$shards,"save_s":$saveS%.3f,"load_s":$loadS%.3f,""" +
      f""""load_pruned_s":$prunedS%.3f,"pq_write_s":$pqWriteS%.3f,""" +
      f""""pq_read_s":$pqReadS%.3f,""" +
      f""""zstd_save_s":$zstdSaveS%.3f,"zstd_load_s":$zstdLoadS%.3f,""" +
      f""""arrow_mb":${arrowBytes / 1e6}%.1f,""" +
      f""""arrow_mb_zstd":${zstdBytes / 1e6}%.1f,""" +
      f""""pq_mb":${pqBytes / 1e6}%.1f}""")
    spark.stop()
  }
}
