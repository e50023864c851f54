package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.sources.ArrowDataset

/** Round 18: the interop/publish story's two new surfaces under the
  * correctness gate.
  *
  *  - `s4_arrow_zstd` — the COMPRESSED save path (Arrow IPC body
  *    compression, `ArrowDataset.save(compression = "zstd")`): at a
  *    100 TB publish the uncompressed HF layout costs ~3× parquet bytes
  *    (PERF.md interop table); zstd closes that. The oracle reads the
  *    original parquet, so a hash match certifies compression is
  *    value-lossless end-to-end through our writer AND reader. pyarrow
  *    reads the same shards transparently (tools/arrow_interop_r18.log).
  *  - `s3_dict_splits` — the HF DatasetDict layout
  *    (`dataset_dict.json` + one subdir per split): the reference's
  *    first act on a dict-shaped dataset is concatenating its splits
  *    (main.py:82, utils.py:173-176). The corpus is saved as a 2-split
  *    dict (doc_id parity) and loaded back through the dict-sniffing
  *    reader, which unions in dict order — the oracle is the whole
  *    table, so the hash certifies no row is lost/duplicated across the
  *    split boundary.
  *
  * Both reuse the r17 write-once gate (OS file lock + marker, dir keyed
  * on the source parquet listing) so concurrent verify/bench JVMs never
  * race the writes.
  */
object QueriesExtra13 {

  private def keyedDir(dir: String, tag: String): String = {
    val src = new java.io.File(s"$dir/documents.parquet")
    val sig = Option(src.listFiles()).getOrElse(Array.empty)
      .sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString(dir + "|", ",", "")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"/tmp/graft_arrow_${tag}_$key"
  }

  private val done =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def writeOnce(out: String)(write: => Unit): String = {
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
            write
            java.nio.file.Files.createFile(marker)
          }
        } finally { lock.release(); lockCh.close() }
        done.add(out)
      }
    }
    out
  }

  val s4ArrowZstd: QueryDef = QueryDef("s4_arrow_zstd",
    (s, dir) => {
      // keyedDir computed ONCE: it hashes the source parquet's mtime
      // listing, so a second evaluation during a concurrent testdata
      // refresh could diverge from the locked/marked dir
      val target = keyedDir(dir, "zstd")
      val out = writeOnce(target) {
        val docs = Queries.table(s, dir, "documents")
          .repartition(4, col("doc_id"))
        ArrowDataset.save(docs, target, compression = "zstd")
      }
      ArrowDataset.load(s, out)
        .select("doc_id", "text", "lang", "source", "n_chars")
    },
    Some("SELECT doc_id, text, lang, source, n_chars FROM documents"))

  val s3DictSplits: QueryDef = QueryDef("s3_dict_splits",
    (s, dir) => {
      val target = keyedDir(dir, "dict") // once — see s4ArrowZstd
      val out = writeOnce(target) {
        val docs = Queries.table(s, dir, "documents")
        val even = docs.where(col("doc_id") % 2 === 0)
          .repartition(2, col("doc_id"))
        val odd = docs.where(col("doc_id") % 2 === 1)
          .repartition(2, col("doc_id"))
        ArrowDataset.saveDict(Seq("train" -> even, "test" -> odd), target)
      }
      // dict-sniffing load unions the splits (the reference's
      // concatenate-splits semantics) — every doc exactly once
      ArrowDataset.load(s, out)
        .select("doc_id", "text", "lang", "source", "n_chars")
    },
    Some("SELECT doc_id, text, lang, source, n_chars FROM documents"))

  val all: Seq[QueryDef] = Seq(s4ArrowZstd, s3DictSplits)
}
