package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.Cleaners.stripWs

/** Conversation-restructuring oracle queries (SURVEY §2.2). The
  * conversation corpus is built deterministically from `orders` (one
  * conversation per customer, messages in orderkey order) with the IDENTICAL
  * construction in Spark and DuckDB, then each operator's full transform is
  * hash-compared. Array/struct outputs are rendered to strings for stable
  * cross-engine hashing.
  */
object QueriesChat {

  /** Spark side of the shared corpus: conversation(content, do_train, role)
    * per o_custkey.
    */
  private def conv(s: SparkSession, dir: String): DataFrame = {
    val orders = Queries.table(s, dir, "orders")
    val msg = struct(
      concat(col("o_orderpriority"), lit(" "), col("o_orderstatus"),
        lit(" key "), col("o_orderkey") % 100).as("content"),
      (col("o_orderkey") % 2 === 0).as("do_train"),
      when(col("o_orderkey") % 2 === 0, lit("Assistant"))
        .otherwise(lit("User")).as("role"))
    orders.groupBy(col("o_custkey"))
      .agg(sort_array(collect_list(struct(col("o_orderkey").as("k"),
        msg.as("m")))).as("km"))
      .select(col("o_custkey"),
        transform(col("km"), x => x.getField("m")).as("conversation"))
  }

  /** DuckDB side of the shared corpus. */
  private val convSql =
    "SELECT o_custkey, list(struct_pack(content := o_orderpriority || ' ' " +
      "|| o_orderstatus || ' key ' || (o_orderkey%100), do_train := " +
      "(o_orderkey%2=0), role := CASE WHEN o_orderkey%2=0 THEN 'Assistant' " +
      "ELSE 'User' END) ORDER BY o_orderkey) AS conversation " +
      "FROM orders GROUP BY o_custkey"

  // full ASCII-ws class (RE2 \s misses \x0B) — keep in sync with stripWs
  private val sqlStrip = (e: String) => OracleSql.strip(e)

  /** R1+R2: prefix-explode to (instruction, response) scalars. */
  val r1r2: QueryDef = QueryDef("r1_r2_explode_io",
    (s, dir) => conv(s, dir)
      .select(col("o_custkey"), col("conversation"),
        posexplode(col("conversation")).as(Seq("pos0", "msg")))
      .where(col("msg.do_train"))
      .select(col("o_custkey"), (col("pos0") + 1).as("pos"),
        when(col("pos0") > 0,
          stripWs(element_at(col("conversation"), col("pos0"))
            .getField("content"))).otherwise(lit("")).as("instruction"),
        stripWs(col("msg.content")).as("response"))
      .orderBy("o_custkey", "pos"),
    Some(s"WITH conv AS ($convSql) SELECT o_custkey, i AS pos, " +
      s"CASE WHEN i>1 THEN ${sqlStrip("conversation[i-1].content")} ELSE '' END" +
      s" AS instruction, ${sqlStrip("conversation[i].content")} AS response " +
      "FROM conv, LATERAL (SELECT unnest(generate_series(1, " +
      "len(conversation))) AS i) g WHERE conversation[i].do_train " +
      "ORDER BY o_custkey, pos"))

  /** R3: chatml reassembly (prefix do_train→false + appended trained
    * message), rendered role:content:do_train joined by '|'.
    */
  val r3: QueryDef = QueryDef("r3_chatml",
    (s, dir) => {
      val io = conv(s, dir)
        .select(col("o_custkey"), col("conversation"),
          posexplode(col("conversation")).as(Seq("pos0", "msg")))
        .where(col("msg.do_train"))
        .select(col("o_custkey"), (col("pos0") + 1).as("pos"),
          slice(col("conversation"), lit(1), col("pos0")).as("input"),
          col("msg").as("output"),
          stripWs(col("msg.content")).as("response"))
      val chatml = concat(
        transform(col("input"), m => struct(
          m.getField("content").as("content"), lit(false).as("do_train"),
          m.getField("role").as("role"))),
        array(struct(col("response").as("content"), lit(true).as("do_train"),
          col("output.role").as("role"))))
      io.select(col("o_custkey"), col("pos"),
        array_join(transform(chatml, m => concat_ws(":",
          m.getField("role"), m.getField("content"),
          m.getField("do_train").cast("string"))), "|").as("rendered"))
        .orderBy("o_custkey", "pos")
    },
    Some(s"WITH conv AS ($convSql) SELECT o_custkey, i AS pos, " +
      "coalesce(array_to_string(list_transform(conversation[1:i-1], " +
      "m -> m.role || ':' || m.content || ':false'), '|'), '') || " +
      "(CASE WHEN i>1 THEN '|' ELSE " +
      s"'' END) || conversation[i].role || ':' || " +
      s"${sqlStrip("conversation[i].content")} || ':true' AS rendered " +
      "FROM conv, LATERAL (SELECT unnest(generate_series(1, " +
      "len(conversation))) AS i) g WHERE conversation[i].do_train " +
      "ORDER BY o_custkey, pos"))

  /** R5: dedup text prep — blank-line-joined trained contents, stripped. */
  val r5: QueryDef = QueryDef("r5_dedup_prep",
    (s, dir) => conv(s, dir)
      .select(col("o_custkey"),
        graft.chat.Conversations.dedupText(col("conversation")).as("text"))
      .orderBy("o_custkey"),
    Some(s"WITH conv AS ($convSql) SELECT o_custkey, " +
      sqlStrip("coalesce(array_to_string(list_transform(list_filter(" +
        "conversation, m -> m.do_train), m -> m.content), " +
        "chr(10)||chr(10)), '')") +
      " AS text FROM conv ORDER BY o_custkey"))

  /** R4: seeded full shuffle — now the engine-independent md5-keyed
    * permutation ([[graft.chat.Conversations.shuffleSeeded]]), so the
    * whole permutation (not just the row set) is DuckDB-hash-checked.
    * The rank window is single-partition — a harness materialization of
    * the order for comparison, not the operator (the operator is a plain
    * distributed sort).
    */
  val r4: QueryDef = QueryDef("r4_shuffle_seeded",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(
        md5(concat(lit("42:"), col("doc_id").cast("string"))), col("doc_id"))
      graft.chat.Conversations
        .shuffleSeeded(Queries.table(s, dir, "documents"), 42, col("doc_id"))
        .withColumn("shuffle_rank", row_number().over(w).cast("long"))
        .select("doc_id", "shuffle_rank")
        .orderBy("doc_id")
    },
    Some("SELECT doc_id, CAST(row_number() OVER (ORDER BY " +
      "md5('42:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS " +
      "shuffle_rank FROM documents ORDER BY doc_id"))

  val all: Seq[QueryDef] = Seq(r1r2, r3, r4, r5)
}
