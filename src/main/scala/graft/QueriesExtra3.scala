package graft

import org.apache.spark.sql.functions._

/** Batch 5: event-time operators (as-of join, sessionization, bounded-gap
  * range join), corpus term statistics (heavy-hitter n-grams, TF-IDF
  * ingredients), and Bloom-filter incremental dedup. Every query here is
  * DuckDB-oracled — the as-of oracle uses DuckDB's native ASOF JOIN, a
  * genuinely independent implementation of the same semantics.
  */
object QueriesExtra3 {

  /** As-of join: each click event picks up the latest at-or-before
    * purchase by the same user (backward-inclusive). (user_id, ts) is
    * unique in the events table, so the match is deterministic; misses
    * surface as -1 sentinels (nullable ints degrade to float64 NaN in
    * the driver's pandas hash path).
    */
  val evAsof: QueryDef = QueryDef("ev_asof_join",
    (s, dir) => {
      val ev = Queries.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          unix_micros(col("ts")).as("purchase_us"), col("value"))
      graft.temporal.Temporal
        .asofJoin(clicks, purchases, Seq("user_id"), "ts",
          Seq("purchase_us", "value"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("click_us"),
          coalesce(col("purchase_us_asof"), lit(-1L)).as("purchase_us"),
          coalesce(col("value_asof"), lit(-1.0)).as("purchase_value"))
        .orderBy("event_id")
    },
    Some("WITH l AS (SELECT event_id, user_id, ts FROM events WHERE " +
      "event_type='click'), r AS (SELECT user_id, ts, value FROM events " +
      "WHERE event_type='purchase') SELECT l.event_id, l.user_id, " +
      "epoch_us(l.ts) AS click_us, coalesce(epoch_us(r.ts), -1) AS " +
      "purchase_us, coalesce(r.value, -1.0) AS purchase_value " +
      "FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts " +
      "ORDER BY event_id"))

  /** Gap-based sessionization: 30-minute-idle session boundaries per
    * user, one row per session.
    */
  val evSessionize: QueryDef = QueryDef("ev_sessionize",
    (s, dir) => graft.temporal.Temporal
      .sessionize(Queries.events(s, dir), "user_id", "ts", 1800000000L)
      .orderBy("user_id", "session_start_us"),
    Some("WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events), " +
      "g AS (SELECT user_id, us, CASE WHEN us - lag(us) OVER (PARTITION " +
      "BY user_id ORDER BY us) <= 1800000000 THEN 0 ELSE 1 END AS nw " +
      "FROM e), s AS (SELECT user_id, us, sum(nw) OVER (PARTITION BY " +
      "user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sess FROM g) " +
      "SELECT user_id, min(us) AS session_start_us, max(us) AS " +
      "session_end_us, CAST(count(*) AS BIGINT) AS n_events FROM s " +
      "GROUP BY user_id, sess ORDER BY user_id, session_start_us"))

  /** Bounded-gap range join: ordered same-user event pairs within one
    * hour, via the binned equality-join shape (the oracle is the naive
    * range self-join — same rows, different plan).
    */
  val evNearPairs: QueryDef = QueryDef("ev_near_pairs",
    (s, dir) => graft.temporal.Temporal
      .nearTimePairs(Queries.events(s, dir), Seq("user_id"), "event_id",
        "ts", 3600000000L)
      .select(col("user_id"), col("a_event_id"), col("b_event_id"))
      .orderBy("user_id", "a_event_id", "b_event_id"),
    Some("SELECT a.user_id AS user_id, a.event_id AS a_event_id, " +
      "b.event_id AS b_event_id FROM events a JOIN events b ON " +
      "a.user_id = b.user_id AND epoch_us(b.ts) > epoch_us(a.ts) AND " +
      "epoch_us(b.ts) <= epoch_us(a.ts) + 3600000000 " +
      "ORDER BY a.user_id, a_event_id, b_event_id"))

  /** Heavy hitters: the 20 most frequent word trigrams across the corpus
    * (boilerplate/template detection), ties broken lexicographically.
    */
  val hhTopNgrams: QueryDef = QueryDef("hh_top_ngrams",
    (s, dir) => graft.analysis.TermStats
      .topNgrams(Queries.table(s, dir, "documents"), "text", 3, 20)
      .orderBy(col("n_occurrences").desc, col("gram").asc),
    Some("WITH w AS (SELECT list_filter(regexp_split_to_array(lower(" +
      "text), '[^a-z0-9_]+'), x -> x <> '') AS ws FROM documents), " +
      "g AS (SELECT unnest(CASE WHEN len(ws) < 3 THEN [] ELSE " +
      "list_transform(range(1, len(ws)-1), i -> ws[i] || ' ' || " +
      "ws[i+1] || ' ' || ws[i+2]) END) AS gram FROM w) " +
      "SELECT gram, CAST(count(*) AS BIGINT) AS n_occurrences FROM g " +
      "GROUP BY gram ORDER BY n_occurrences DESC, gram ASC LIMIT 20"))

  /** Per-document top-3 salient terms with TF-IDF ingredients (integer
    * rank: tf desc, df asc, term asc — see TermStats.tfIdfTop).
    */
  val taTfIdf: QueryDef = QueryDef("ta_tfidf_top",
    (s, dir) => graft.analysis.TermStats
      .tfIdfTop(Queries.table(s, dir, "documents"), "doc_id", "text", 3)
      .orderBy("doc_id", "term"),
    Some("WITH w AS (SELECT doc_id, unnest(list_filter(" +
      "regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '')) " +
      "AS term FROM documents), tf AS (SELECT doc_id, term, " +
      "CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY doc_id, term), " +
      "d AS (SELECT *, CAST(count(*) OVER (PARTITION BY term) AS BIGINT) " +
      "AS df FROM tf), r AS (SELECT *, row_number() OVER (PARTITION BY " +
      "doc_id ORDER BY tf DESC, df ASC, term ASC) AS rk FROM d) " +
      "SELECT doc_id, term, tf, df FROM r WHERE rk <= 3 " +
      "ORDER BY doc_id, term"))

  /** Bloom-filter incremental dedup: odd-id documents deduped against a
    * broadcast Bloom filter of even-id documents' texts. At fpp=1e-9
    * over this corpus the filter's false-positive set is empty, so the
    * probabilistic result coincides with the exact anti-join the oracle
    * computes (and Spark's Bloom hashing is deterministic, so the match
    * is stable, not lucky).
    */
  val dedupBloom: QueryDef = QueryDef("dedup_bloom_against",
    (s, dir) => {
      val docs = Queries.table(s, dir, "documents")
      graft.dedup.ExactDedup.bloomDedupAgainst(
        docs.where(col("doc_id") % 2 === 1),
        docs.where(col("doc_id") % 2 === 0),
        // auto-size from the measured ref count (ADVICE r9: 10000 was
        // ~2.5× oversubscribed at sf1 — degraded fpp, silent drops there)
        "text", expectedItems = 0L, fpp = 1e-9)
        .select("doc_id").orderBy("doc_id")
    },
    Some("SELECT doc_id FROM documents WHERE doc_id % 2 = 1 AND text " +
      "NOT IN (SELECT text FROM documents WHERE doc_id % 2 = 0) " +
      "ORDER BY doc_id"))

  /** Temperature-weighted corpus mixing (T=2): the 450-doc majority and
    * 50-doc minority split mix at sqrt-weighted proportions (0.75/0.25
    * instead of natural 0.9/0.1 — the minority corpus up-weighted 2.5×).
    * Oracled on per-user kept COUNTS (which rows are seeded-random, how
    * many is deterministic); every double in the driver's sizing math
    * (sqrt, +, /, min, floor) is IEEE-exact-rounded, so the SQL mirror
    * reproduces the fractions bit-for-bit.
    */
  val p9Temperature: QueryDef = QueryDef("p9_temperature_mix",
    (s, dir) => {
      val docs = Queries.table(s, dir, "documents")
        .withColumn("user_id", col("doc_id") % 50)
      val d1 = docs.where(col("doc_id") % 10 =!= 0)
      val d2 = docs.where(col("doc_id") % 10 === 0)
      graft.sampling.Sampling
        .temperatureMix(Seq(d1, d2), 2.0, 300.0, "user_id")
        .groupBy("user_id").agg(count(lit(1)).as("kept"))
        .orderBy("user_id")
    },
    Some("WITH d1 AS (SELECT doc_id, doc_id%50 AS user_id FROM documents " +
      "WHERE doc_id%10<>0), d2 AS (SELECT doc_id, doc_id%50 AS user_id " +
      "FROM documents WHERE doc_id%10=0), " +
      "n AS (SELECT (SELECT count(*) FROM d1)::DOUBLE AS n1, " +
      "(SELECT count(*) FROM d2)::DOUBLE AS n2), " +
      "p AS (SELECT n1, n2, sqrt(n1)/(sqrt(n1)+sqrt(n2)) AS p1, " +
      "sqrt(n2)/(sqrt(n1)+sqrt(n2)) AS p2 FROM n), " +
      "eff AS (SELECT n1, n2, p1, p2, least(300.0, n1/p1, n2/p2) AS t " +
      "FROM p), " +
      "s1 AS (SELECT user_id, CASE WHEN count(*)<5 THEN count(*) ELSE " +
      "floor(count(*) * (SELECT (t*p1)/n1 FROM eff))::BIGINT END AS kept " +
      "FROM d1 GROUP BY user_id), " +
      "s2 AS (SELECT user_id, CASE WHEN count(*)<5 THEN count(*) ELSE " +
      "floor(count(*) * (SELECT (t*p2)/n2 FROM eff))::BIGINT END AS kept " +
      "FROM d2 GROUP BY user_id) " +
      "SELECT user_id, CAST(sum(kept) AS BIGINT) AS kept FROM " +
      "(SELECT * FROM s1 UNION ALL SELECT * FROM s2) GROUP BY user_id " +
      "ORDER BY user_id"))

  val all: Seq[QueryDef] = Seq(evAsof, evSessionize, evNearPairs,
    hhTopNgrams, taTfIdf, dedupBloom, p9Temperature)
}
