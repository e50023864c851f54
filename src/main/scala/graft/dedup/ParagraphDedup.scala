package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level PARAGRAPH dedup — the sub-document granularity between
  * whole-document exact dedup ([[ExactDedup]]) and line-level
  * boilerplate removal (`analysis.Boilerplate`): every distinct
  * paragraph survives only at its globally FIRST occurrence (smallest
  * (doc id, position)), all later occurrences are cut and each
  * document's remaining paragraphs are reassembled in order. This is
  * the "remove duplicated paragraphs across documents" step of the
  * Gopher/CCNet recipes — repeated intros, navigation blocks, and
  * licence footers disappear while the first copy of the prose stays.
  *
  * Scale shape — deliberately NO window over the paragraph key (a viral
  * paragraph would put millions of rows through one rank task):
  *  1. split + posexplode (narrow);
  *  2. `groupBy(paragraph).agg(min(struct(id, pos)))` — the keeper per
  *     paragraph. min() partial-aggregates MAP-SIDE, so a paragraph
  *     repeated a million times collapses to one row per input
  *     partition before it ever shuffles — the same skew armor as exact
  *     dedup's distinct-key aggregate. The aggregate's output IS the
  *     kept set: no join back to the exploded frame.
  *  3. regroup the keepers by doc id and stitch with the separator.
  * Two map-side-combined shuffles total, both over kept data only.
  *
  * Empty paragraphs (leading/trailing/doubled separators) are dropped,
  * normalizing separator runs — same philosophy as C4/`remove_empty_lines`
  * (reference `cleaners.py:71-72` INTENDED semantics).
  */
object ParagraphDedup {

  /** Returns (`idCol`, `outCol`): each document's text with only the
    * globally-first occurrence of every distinct paragraph kept.
    * Documents whose paragraphs all lose (or that had none) keep a row
    * with an empty string — row count is preserved.
    */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
      outCol: String, sep: String = "\n\n"): DataFrame = {
    val parts = df
      .select(col(idCol), posexplode(
        split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos__", "__para__")))
      .where(col("__para__") =!= "")
    val keepers = parts
      .groupBy("__para__")
      .agg(min(struct(col(idCol).as("_id"), col("__pos__").as("_pos")))
        .as("__first__"))
      .select(col("__first__._id").as(idCol),
        col("__first__._pos").as("__pos__"), col("__para__"))
    val stitched = keepers
      .groupBy(idCol)
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__pos__"), col("__para__")))),
          s => s.getField("__para__")),
        sep).as(outCol))
    df.select(col(idCol))
      .join(stitched, Seq(idCol), "left")
      .na.fill(Map(outCol -> ""))
  }
}
