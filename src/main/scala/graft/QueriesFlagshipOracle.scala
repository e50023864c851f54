package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.chat.Conversations
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

  private def run(s: SparkSession, dir: String): DataFrame = {
    val conv = Conversations.synthetic(s, dir)
    val io = Conversations.addContentColumns(
      Conversations.explodeToInputOutput(conv))
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
    val chatml = concat(
      transform(col("input"), m => struct(
        m.getField("content").as("content"),
        lit(false).as("do_train"),
        m.getField("role").as("role"))),
      array(struct(col("response").as("content"), lit(true).as("do_train"),
        col("output.role").as("role"))))
    val rendered = filtered.withColumn("rendered",
      array_join(transform(chatml, m => concat_ws(":",
        m.getField("role"), m.getField("content"),
        m.getField("do_train").cast("string"))), "|"))
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
