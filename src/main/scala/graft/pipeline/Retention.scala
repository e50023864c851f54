package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.dedup.{MinHashDedup, SimHash}

/** Config-reachable takedown (VERDICT r15 #4: retention was API-only):
  * the journal → delete → compact cycle as one YAML block, so a pipeline
  * operator can honor a takedown without writing Scala —
  *
  * {{{
  * retention:
  *   family: minhash              # or simhash (the sig-journal family)
  *   journal_path: /data/journal  # parquet written by the dedup pass
  *                                # (deduplication.journal_path) or a
  *                                # streaming journal sink
  *   delete_ids: [3, 60]          # inline id list, and/or
  *   delete_ids_path: /req/ids    # a one-column parquet of ids
  *   compact_store_path: /data/store        # output: compacted store
  *   compacted_journal_path: /data/journal2 # optional: surviving journal
  * }}}
  *
  * Semantics are exactly [[MinHashDedup.deleteFromJournal]] +
  * [[MinHashDedup.compactJournal]] (or the [[SimHash]] twins): the
  * compacted store equals the store of the physically-filtered corpus
  * (DedupRetentionSpec's identity), so deleted content becomes
  * re-ingestable and bucket minima promote. The store write mirrors
  * [[MinHashDedup.exportBandedStore]]'s layout (repartitioned on the
  * join keys so increment band-joins read co-located buckets).
  */
object Retention {

  final case class RetentionConfig(
      family: String,
      journalPath: String,
      deleteIds: Seq[Long],
      deleteIdsPath: Option[String],
      compactStorePath: String,
      compactedJournalPath: Option[String])

  /** Parse the `retention:` block; None when absent. Unknown families
    * and missing required keys raise descriptive errors (the skew_salts
    * precedent: a config typo must name the key).
    */
  def fromConfig(config: Map[String, Any]): Option[RetentionConfig] =
    config.get("retention") match {
      case Some(m: Map[String @unchecked, Any @unchecked]) =>
        def str(k: String): Option[String] =
          m.get(k).filter(_ != null).map(_.toString)
        def req(k: String): String = str(k).getOrElse(
          sys.error(s"retention.$k is required"))
        val family = str("family").getOrElse("minhash")
        if (family != "minhash" && family != "simhash") sys.error(
          s"retention.family must be minhash or simhash, got: $family")
        val inline = m.get("delete_ids") match {
          case Some(l: List[Any @unchecked]) => l.map { v =>
            try v.toString.trim.toLong
            catch {
              case _: NumberFormatException =>
                sys.error(s"retention.delete_ids must be integers, got: $v")
            }
          }
          case Some(other) if other != null =>
            sys.error("retention.delete_ids must be a list of ids, " +
              s"got: $other")
          case _ => Nil
        }
        Some(RetentionConfig(family, req("journal_path"), inline,
          str("delete_ids_path"), req("compact_store_path"),
          str("compacted_journal_path")))
      case _ => None
    }

  /** Run the takedown: read the journal, drop the requested ids, write
    * the compacted store (and optionally the surviving journal), return
    * the read-back store — the frame a resumed pipeline or
    * `deduplicateAgainstStore` increment joins against.
    */
  /** Canonical form for the in-place-rewrite guards (ADVICE r16): raw
    * string comparison lets aliases of one location — trailing slash,
    * relative vs absolute, `..` segments — slip past and Retention would
    * overwrite the parquet directory it is concurrently reading. Local
    * paths normalize through java.nio; URI-schemed paths (hdfs://, s3a://)
    * normalize through Hadoop's Path, which collapses `.`/`..`/double
    * slashes while keeping the scheme+authority.
    */
  private[pipeline] def canonPath(p: String): String =
    if (p.contains("://"))
      new org.apache.hadoop.fs.Path(p).toString
    else
      try java.nio.file.Paths.get(p).toAbsolutePath.normalize.toString
      catch { case _: java.nio.file.InvalidPathException => p }

  def run(spark: SparkSession, rc: RetentionConfig): DataFrame = {
    import spark.implicits._
    // every output path must differ from the input journal AND from each
    // other — Spark cannot overwrite a path it is reading, and a store
    // silently clobbering the surviving journal is a half-done takedown.
    // Compared CANONICALIZED (ADVICE r16) so path aliases can't bypass.
    val journalC = canonPath(rc.journalPath)
    val storeC = canonPath(rc.compactStorePath)
    val compJournalC = rc.compactedJournalPath.map(canonPath)
    require(storeC != journalC,
      "retention.compact_store_path must differ from journal_path " +
        "(Spark cannot overwrite a parquet path it is reading)")
    require(!compJournalC.contains(journalC),
      "retention.compacted_journal_path must differ from journal_path " +
        "(Spark cannot overwrite a parquet path it is reading)")
    require(!compJournalC.contains(storeC),
      "retention.compacted_journal_path must differ from " +
        "compact_store_path (the store write would clobber the journal)")
    val journal = spark.read.parquet(rc.journalPath)
    val fromPath = rc.deleteIdsPath.map { p =>
      val raw = spark.read.parquet(p)
      // cast explicitly: journal ids are 2^62-scale Longs, and a STRING
      // id column (a JSON/CSV-exported takedown request) would otherwise
      // make Spark coerce BOTH join sides to DOUBLE — at that magnitude
      // ulp is 1024, so unrelated near-by ids would silently delete
      raw.select(col(raw.columns.head).cast("long")).toDF("id")
    }
    val inline =
      if (rc.deleteIds.nonEmpty) Some(rc.deleteIds.toDF("id")) else None
    val ids = (fromPath.toSeq ++ inline.toSeq)
      .reduceOption(_.unionByName(_))
    val retained = ids match {
      case Some(d) if rc.family == "simhash" =>
        SimHash.deleteFromSigJournal(journal, d)
      case Some(d) => MinHashDedup.deleteFromJournal(journal, d)
      case None => journal
    }
    rc.compactedJournalPath.foreach(p =>
      retained.write.mode("overwrite").parquet(p))
    // compact AFTER the optional journal rewrite so both outputs come
    // from one retained frame; repartition on the store's join keys
    // (exportBandedStore's layout) so increments read co-located buckets
    val (store, keys) =
      if (rc.family == "simhash")
        (SimHash.compactSigJournal(retained), Seq(col("sig")))
      else
        (MinHashDedup.compactJournal(retained), Seq(col("band"), col("bsig")))
    val n = math.max(spark.sparkContext.defaultParallelism,
      spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    store.repartition(n, keys: _*)
      .write.mode("overwrite").parquet(rc.compactStorePath)
    spark.read.parquet(rc.compactStorePath)
  }

  /** One-call form: parse + run, no-op None when the config has no
    * retention block.
    */
  def runFromConfig(spark: SparkSession,
      config: Map[String, Any]): Option[DataFrame] =
    fromConfig(config).map(run(spark, _))
}
