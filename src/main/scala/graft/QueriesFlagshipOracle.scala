package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.Preprocessor
import graft.text.{Cleaners, Filters}

/** The flagship E2E dataflow (main.py:40-75) with EXACT dedup substituted
  * for MinHash — every stage (synthesize → prefix-explode → clean → filter
  * → keep-first dedup → instruction filter → chatml render) is then
  * ANSI-SQL-expressible, so the WHOLE pipeline gets a DuckDB hash oracle
  * instead of a rows-only check. Keep-first is made engine-independent by
  * ranking inside each `response` group over the total order
  * (source, instruction, rendered) — rows tying on all three are identical
  * in every output column, so either engine's pick hashes the same.
  */
object QueriesFlagshipOracle {

  /** Flat-row plan (r3 verdict: the explode-first version carried
    * O(conversation) `input` arrays through clean/filter/window only to
    * render them to ONE string at the end). The rank-window dedup the
    * oracle mirrors only needs scalars (response, source, instruction,
    * rendered), so the prefix is rendered to its final string form
    * INSIDE the same custkey window that computes pos0/prev — no arrays
    * ever enter the heavy stages. Output is row-for-row identical.
    */
  private def run(s: SparkSession, dir: String): DataFrame = {
    val msgs = graft.chat.ChatPipeline.syntheticMessages(s, dir)
    // ONE window pass (already ordered by okey via pos0's window) renders
    // each row's prefix "role:content:false|..." — the string the chatml
    // transform produced from the `input` array in the explode-first plan
    val wAll = Window.partitionBy(col("custkey"))
      .orderBy(col("pos0"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val io = msgs
      .withColumn("__prefix__",
        array_join(collect_list(
          concat_ws(":", col("role"), col("content"), lit("false")))
          .over(wAll), "|"))
      .where(col("do_train"))
      .select(col("source"), col("role").as("__outrole__"),
        col("__prefix__"), (col("pos0") > 0).as("__hasprefix__"),
        when(col("pos0") > 0, Cleaners.stripWs(col("prev")))
          .otherwise(lit("")).as("instruction"),
        Cleaners.stripWs(col("content")).as("response"))
    val cleaners = Seq(
      "normalize_whitespace" -> Cleaners.normalizeWhitespace,
      "normalize_punctuation" -> Cleaners.normalizePunctuation,
      "remove_empty_lines" -> Cleaners.removeEmptyLines)
    val cleaned = Preprocessor.clean(io, "response", cleaners)
    val filters = Seq(
      Filters.checkWordNumber(5, 128),
      Filters.checkCompletion(),
      Filters.checkCharRepetition(10, 0.2),
      Filters.checkLowercaseRatio(0.75))
    val filtered = Preprocessor.applyFilters(cleaned, "response", filters)
    val rendered = filtered.withColumn("rendered",
      concat(col("__prefix__"),
        when(col("__hasprefix__"), lit("|")).otherwise(lit("")),
        col("__outrole__"), lit(":"), col("response"), lit(":true")))
    val w = Window.partitionBy(col("response"))
      .orderBy(col("source"), col("instruction"), col("rendered"))
    val deduped = rendered.withColumn("__rn__", row_number().over(w))
      .where(col("__rn__") === 1).drop("__rn__")
    deduped
      .where(Filters.checkLowercaseRatio(0.55).keep(col("instruction")))
      .select(col("source"), col("rendered"))
      .orderBy("source", "rendered")
  }

  private val oracle: String = {
    import OracleSql._
    val content = "'please handle ' || lower(o_orderpriority) || " +
      "' order number ' || (o_orderkey % 1000) || ' with care.'"
    val cleanedResp = removeEmptyLines(normalizePunctuation(
      normalizeWhitespace(strip("conversation[pos].content"))))
    "WITH conv AS (SELECT o_custkey, list(struct_pack(content := " +
      content + ", do_train := (o_orderkey % 2 = 0), role := CASE WHEN " +
      "o_orderkey % 2 = 0 THEN 'Assistant' ELSE 'User' END) ORDER BY " +
      "o_orderkey) AS conversation, 'synthetic/' || (o_custkey % 20) AS " +
      "source FROM orders GROUP BY o_custkey), " +
      "io AS (SELECT o_custkey, pos, source, CASE WHEN pos > 1 THEN " +
      strip("conversation[pos-1].content") + " ELSE '' END AS instruction, " +
      cleanedResp + " AS response, conversation[pos].role AS out_role, " +
      "coalesce(array_to_string(list_transform(conversation[1:pos-1], " +
      "m -> m.role || ':' || m.content || ':false'), '|'), '') AS prefix, " +
      "(pos > 1) AS has_prefix FROM conv, LATERAL (SELECT unnest(" +
      "generate_series(1, len(conversation))) AS pos) g " +
      "WHERE conversation[pos].do_train), " +
      "io2 AS (SELECT *, prefix || (CASE WHEN has_prefix THEN '|' ELSE '' " +
      "END) || out_role || ':' || response || ':true' AS rendered FROM io), " +
      "src AS (SELECT o_custkey, pos, response AS t FROM io2), " +
      charRepetitionCtes("src", Seq("o_custkey", "pos"), "t", 10) + ", " +
      "fio AS (SELECT io2.* FROM io2 LEFT JOIN __cr_ratio r USING " +
      "(o_custkey, pos) WHERE " + wordCount("response") +
      " BETWEEN 5 AND 128 AND " + completionKeep("response") +
      " AND coalesce(r.ratio, 0.0) <= 0.2 AND " +
      lowercaseRatio("response") + " >= 0.75), " +
      "ded AS (SELECT *, row_number() OVER (PARTITION BY response ORDER " +
      "BY source, instruction, rendered) AS rn FROM fio) " +
      "SELECT source, rendered FROM ded WHERE rn = 1 AND " +
      lowercaseRatio("instruction") + " >= 0.55 ORDER BY source, rendered"
  }

  val flagshipOracle: QueryDef =
    QueryDef("flagship_e2e_exact", run, Some(oracle))
}
