package graft

import org.apache.spark.sql.SparkSession

import graft.sources.ArrowDataset

/** Round 17: the HF `save_to_disk` / `load_from_disk` round-trip as a
  * driver-gated oracle query (S4 — preprocessor.py:68,72). The corpus is
  * saved in the HF on-disk layout (Arrow IPC stream shards + state.json
  * + dataset_info.json, `sources/ArrowDataset.scala`) and loaded back
  * through the arrow reader; the oracle reads the ORIGINAL parquet — a
  * hash match certifies every value survived the format conversion
  * byte-exactly. Interop with the real ecosystem is pinned separately:
  * ArrowDatasetSpec reads committed pyarrow-written fixtures (reader
  * direction) and tools/arrow_interop.py has pyarrow validate our shards
  * (writer direction, log committed).
  */
object QueriesExtra12 {

  /** Scale-keyed round-trip dir (VERDICT r16 "what's wrong" #3
    * discipline): the key folds in the sf dir path AND the source
    * parquet's (name, length, mtime) listing, so a driver-regenerated
    * corpus at the same path can never alias a stale dump.
    */
  private def rtDir(dir: String): String = {
    val src = new java.io.File(s"$dir/documents.parquet")
    val sig = Option(src.listFiles()).getOrElse(Array.empty)
      .sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString(dir + "|", ",", "")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"/tmp/graft_arrow_rt_$key"
  }

  private val done =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Write-once per (corpus generation): an OS file lock serializes
    * concurrent verify/bench JVMs and the marker file makes the write
    * idempotent — after ensure returns, no JVM writes the dir again, so
    * concurrent readers are safe (shard bytes depend on shuffle order
    * and are NOT cross-JVM identical, unlike the ExtLm dumps).
    */
  private def ensureRoundTrip(s: SparkSession, dir: String): String = {
    val out = rtDir(dir)
    if (!done.contains(out)) synchronized {
      if (!done.contains(out)) {
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
        val lockCh = java.nio.channels.FileChannel.open(
          java.nio.file.Paths.get(s"$out/.lock"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        val lock = lockCh.lock()
        try {
          val marker = java.nio.file.Paths.get(s"$out/_GRAFT_ARROW_OK")
          if (!java.nio.file.Files.exists(marker)) {
            val docs = Queries.table(s, dir, "documents")
              .repartition(4, org.apache.spark.sql.functions.col("doc_id"))
            ArrowDataset.save(docs, out)
            java.nio.file.Files.createFile(marker)
          }
        } finally { lock.release(); lockCh.close() }
        done.add(out)
      }
    }
    out
  }

  val s4ArrowRoundTrip: QueryDef = QueryDef("s4_arrow_roundtrip",
    (s, dir) => {
      val out = ensureRoundTrip(s, dir)
      ArrowDataset.load(s, out)
        .select("doc_id", "text", "lang", "source", "n_chars")
    },
    Some("SELECT doc_id, text, lang, source, n_chars FROM documents"))

  /** The STREAMING publish path under the same gate: the corpus arrives
    * as three `appendBatch` micro-batches (split by doc_id mod 3, with
    * batch 1 re-delivered once — the foreachBatch at-least-once case),
    * and the loaded dataset must still hash-equal the source parquet:
    * exactly-once convergence, manifest-ordered, value-faithful.
    */
  private def ensureAppended(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val out = rtDir(dir) + "_append"
    if (!done.contains(out)) synchronized {
      if (!done.contains(out)) {
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
        val lockCh = java.nio.channels.FileChannel.open(
          java.nio.file.Paths.get(s"$out/.lock"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        val lock = lockCh.lock()
        try {
          val marker = java.nio.file.Paths.get(s"$out/_GRAFT_ARROW_OK")
          if (!java.nio.file.Files.exists(marker)) {
            val docs = Queries.table(s, dir, "documents")
            def slice(k: Int) = docs
              .where(org.apache.spark.sql.functions.col("doc_id") % 3
                === k)
              .repartition(2,
                org.apache.spark.sql.functions.col("doc_id"))
            (0 to 2).foreach(k =>
              ArrowDataset.appendBatch(slice(k), out, k.toLong))
            ArrowDataset.appendBatch(slice(1), out, 1L) // replay batch 1
            java.nio.file.Files.createFile(marker)
          }
        } finally { lock.release(); lockCh.close() }
        done.add(out)
      }
    }
    out
  }

  val s4ArrowAppend: QueryDef = QueryDef("s4_arrow_append",
    (s, dir) => {
      val out = ensureAppended(s, dir)
      ArrowDataset.load(s, out)
        .select("doc_id", "text", "lang", "source", "n_chars")
    },
    Some("SELECT doc_id, text, lang, source, n_chars FROM documents"))

  val all: Seq[QueryDef] = Seq(s4ArrowRoundTrip, s4ArrowAppend)
}
