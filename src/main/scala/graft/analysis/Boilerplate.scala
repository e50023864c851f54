package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4-style cross-document boilerplate removal (Raffel et al. 2020, §2.2:
  * lines appearing repeatedly across the corpus — "subscribe", cookie
  * banners, copyright footers — are discarded from every page): a line
  * whose distinct-document frequency reaches `minDocs` is dropped from
  * every document; surviving lines are reassembled in their original
  * order. Complements [[TextAnalysis.dedupLines]] (within-document) with
  * the corpus-wide variant.
  *
  * Plan shape at 100 TB: one explode + groupBy(line) computes the frequent
  * set, which is tiny relative to the corpus (only lines repeated across
  * ≥ minDocs documents survive the HAVING) — so the removal join is a
  * broadcast left-anti, and the reassembly groupBy(doc) is the only big
  * shuffle. Line-frequency skew (the empty line, boilerplate headers)
  * sits inside the partially-aggregated groupBy, never in a join.
  */
object Boilerplate {

  /** Returns `df` with `textCol` rewritten; other columns pass through.
    * A document whose every line is frequent comes back as "".
    */
  def removeFrequentLines(df: DataFrame, idCol: String, textCol: String,
      minDocs: Long, sep: String = "\n"): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    // limit -1: keep trailing empty lines (Spark default drops them;
    // DuckDB string_split keeps them — semantics must agree)
    val parts = df.select(col(idCol),
      posexplode(split(col(textCol), sepRe, -1)).as(Seq("__pos__", "__line__")))
    val frequent = parts.groupBy("__line__")
      .agg(countDistinct(col(idCol)).as("__df__"))
      .where(col("__df__") >= minDocs)
      .select("__line__")
    val kept = parts.join(broadcast(frequent), Seq("__line__"), "left_anti")
    val rebuilt = kept.groupBy(idCol).agg(
      array_join(
        transform(
          array_sort(collect_list(struct(col("__pos__"), col("__line__")))),
          s => s.getField("__line__")),
        sep).as(textCol))
    df.drop(textCol)
      .join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col(textCol), lit("")))
  }
}
