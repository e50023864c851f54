package graft

import org.apache.spark.sql.functions._

import graft.dedup.{MinHashConfig, MinHashDedup}

/** Round-10 additions: incremental near-dedup against a persisted
  * banded-signature store (|delta|-cost nightly ingestion — VERDICT r9
  * #1), the crawl-ingestion composition (WARC → HTML → C4 → dedup), and
  * IVF-PQ promoted to an oracled suite query.
  */
object QueriesExtra9 {

  private val d = "doc_id"

  /** 2^62 — the increment side's id offset (every store id orders below
    * every increment id, so keep-first can never prefer a new row over a
    * retained one). DuckDB BIGINT carries it exactly.
    */
  private val Off = MinHashDedup.NewIdOffset

  private val IncrCfg = MinHashConfig(ngramSize = 3, minNgramSize = 3)

  /** A 36-word constant base shared between retained "seed" docs and the
    * increment's exact/near variants: long enough that a two-token edit
    * keeps 3-gram shingle Jaccard ≈ 0.95, which the (25, 10) banding
    * catches with near-certainty — and MinHash is DETERMINISTIC, so
    * "near-certainty" is a fixed, replayable outcome, not a coin flip
    * (the spec pins that the near-dup stage actually fires).
    */
  private val LongBase = "the quick shared paragraph that appears across " +
    "many crawled pages talks about data pipelines shuffling partitions " +
    "and joining tables while keeping every band signature stable for " +
    "deterministic replay of the whole clustering chain end to end"

  private def storePath(key: String) = s"/tmp/graft_dedup_store_incrnear_$key"

  private val storeWritten =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Retained corpus: every non-(≡0 mod 11) doc, with ≡3 mod 19 docs
    * carrying the two-parity seed text the increment collides with.
    */
  private def refFrame(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Queries.table(s, dir, "documents")
    docs.where(col(d) % 11 =!= 0).select(col(d),
      when(col(d) % 19 === 3,
        concat(lit(LongBase + " variant "), (col(d) % 2).cast("string")))
        .otherwise(col("text")).as("text"))
  }

  private val incTextSpark = when(col(d) % 19 === 3,
      concat(lit(LongBase + " variant "), (col(d) % 2).cast("string")))
    .when(col(d) % 7 === 2,
      concat(lit(LongBase + " altered "), (col(d) % 2).cast("string")))
    .when(col(d) % 5 === 1,
      concat(lit("fresh fresh fresh delta epsilon zeta "),
        (col(d) % 2).cast("string")))
    .otherwise(col("text"))

  private val incTextSql =
    s"CASE WHEN doc_id % 19 = 3 THEN '$LongBase variant ' || (doc_id % 2) " +
      s"WHEN doc_id % 7 = 2 THEN '$LongBase altered ' || (doc_id % 2) " +
      "WHEN doc_id % 5 = 1 THEN 'fresh fresh fresh delta epsilon zeta ' " +
      "|| (doc_id % 2) ELSE text END"

  /** Incremental NEAR-dedup at |delta| cost (VERDICT r9 #1): the retained
    * corpus's banded-signature store is built ONCE per (JVM, scale) —
    * nightly state, not per-run work — and the timed query computes
    * signatures for the ≡0 mod 11 increment only, band-joins them against
    * the store, and keep-first-dedups within the increment. Constructed so
    * every path fires: ≡3 mod 19 increment docs are EXACT copies of
    * retained seeds (identical signatures → all 25 bands collide), ≡2
    * mod 7 docs are two-token NEAR variants of those seeds (LSH collision
    * without text equality), ≡1 mod 5 docs form a fresh two-parity
    * exact-dup class absent from the store (within-increment keep-first),
    * and the rest are genuinely fresh corpus texts. The oracle re-derives
    * the ENTIRE decision from the two exported signature frames: bucket-min
    * edges within the increment, identical/short-class edges from the
    * reconstructed increment texts, store collisions via the same
    * (band, bsig) join, transitive closure, component-min roots, and the
    * root-below-offset death rule.
    */
  val incrNearDedup: QueryDef = QueryDef("incr_near_dedup",
    (s, dir) => {
      val key = QueriesExtra2.scaleKey(dir)
      val store =
        if (storeWritten.contains(key)) s.read.parquet(storePath(key))
        else {
          val st = MinHashDedup.exportBandedStore(refFrame(s, dir), "text",
            storePath(key), IncrCfg, orderCol = Some(d))
          storeWritten.add(key)
          st
        }
      val docs = Queries.table(s, dir, "documents")
      val inc = docs.where(col(d) % 11 === 0)
        .select(col(d), incTextSpark.as("text"))
      MinHashDedup.deduplicateAgainstStore(inc, store, "text", IncrCfg,
        orderCol = Some(d),
        bandedSink = QueriesExtra2.sinkOnce(
          QueriesExtra2.bandedPath("incrnear", key)))
        .select(col(d))
        .orderBy(d)
    },
    Some {
      val incGlob = QueriesExtra2
        .bandedPath("incrnear", QueriesExtra2.OracleScaleKey) + "/*.parquet"
      val stGlob = storePath(QueriesExtra2.OracleScaleKey) + "/*.parquet"
      "WITH RECURSIVE " +
        s"dsrc AS (SELECT doc_id + $Off AS id, $incTextSql AS t " +
        "FROM documents WHERE doc_id % 11 = 0), " +
        s"bnd AS (SELECT id, band, bsig FROM parquet_scan('$incGlob')), " +
        "lshm AS (SELECT id, min(id) OVER (PARTITION BY band, bsig) " +
        "AS mn FROM bnd), " +
        "lshe AS (SELECT DISTINCT id AS a, mn AS b FROM lshm " +
        "WHERE id <> mn), " +
        "tokc AS (SELECT id, len(regexp_split_to_array(coalesce(t, ''), " +
        "'[^A-Za-z_0-9]')) < 3 AS sh, coalesce(t, '') AS tt FROM dsrc), " +
        "cmk AS (SELECT id, min(id) OVER (PARTITION BY sh, CASE WHEN sh " +
        "THEN '' ELSE tt END) AS kmin FROM tokc), " +
        "ide AS (SELECT id AS a, kmin AS b FROM cmk WHERE id <> kmin), " +
        s"st AS (SELECT band, bsig, id AS sid FROM parquet_scan('$stGlob')), " +
        "crs AS (SELECT DISTINCT b.id AS a, st.sid AS b FROM bnd b " +
        "JOIN st USING (band, bsig)), " +
        "e0 AS (SELECT a, b FROM lshe UNION SELECT a, b FROM ide " +
        "UNION SELECT a, b FROM crs), " +
        QueriesExtra2.closureFromE0 + " " +
        s"SELECT d.id - $Off AS doc_id FROM dsrc d " +
        "LEFT JOIN root r ON d.id = r.id " +
        "WHERE r.root IS NULL OR r.root = d.id ORDER BY doc_id"
    })

  val all: Seq[QueryDef] = Seq(incrNearDedup)
}
