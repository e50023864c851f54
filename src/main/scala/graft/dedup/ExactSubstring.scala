package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document exact-substring detection (the detection stage of Lee
  * et al. 2022, "Deduplicating Training Data Makes Language Models
  * Better": find spans of ≥ L characters that occur verbatim in more than
  * one document). Spark-shaped: every length-L character window is keyed
  * by its md5 (16-byte shuffle keys, not L-char text); windows whose hash
  * occurs in >1 document are merged into maximal per-document spans with
  * a gaps-and-islands window. The reference algorithm builds a corpus
  * suffix array — the right structure on one machine, but not a shuffle
  * shape; the hash-join form trades the L× window blowup (bounded by the
  * md5 key width) for full distribution. Trimming is a caller-side
  * substring removal over the returned spans.
  */
object ExactSubstring {

  /** Length-L window hashes per (row, position). */
  private def windowHashes(text: Column, L: Int): Column =
    transform(
      sequence(lit(0), length(text) - L),
      i => md5(text.substr(i + lit(1), lit(L))))

  /** Maximal per-document spans [span_start, span_end) (0-based,
    * exclusive end) covered by length-`L` windows whose content occurs in
    * MORE THAN ONE document. Rows shorter than L produce no spans.
    */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
      L: Int): DataFrame = {
    val base = df.where(length(col(textCol)) >= L)
    val grams = base.select(col(idCol),
      posexplode(windowHashes(col(textCol), L)).as(Seq("pos", "h")))
    // hashes seen in >1 document (map-side partial distinct applies)
    val shared = grams.groupBy("h")
      .agg(countDistinct(col(idCol)).as("__docs__"))
      .where(col("__docs__") > 1)
      .select("h")
    val marked = grams.join(shared, Seq("h"), "left_semi")
    // merge consecutive positions: pos - row_number is constant per run
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    marked
      .withColumn("__grp__", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("__grp__"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + L).as("span_end"))
      .drop("__grp__")
  }

  /** Remove every repeated span from the documents (the trim step):
    * rebuilds each text with its flagged ranges cut out. Span ranges are
    * merged per row before cutting, so overlaps are safe.
    */
  def trimRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      L: Int): DataFrame = {
    val spans = repeatedSpans(df, idCol, textCol, L)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(
        struct(col("span_start"), col("span_end")))).as("__spans__"))
    df.join(spans, Seq(idCol), "left")
      .withColumn(textCol,
        when(col("__spans__").isNull, col(textCol)).otherwise(
          // keep [prev_end, start) slices plus the tail after the last span
          concat(
            aggregate(col("__spans__"),
              struct(lit(0).as("cursor"), lit("").as("acc")),
              (st, sp) => struct(
                greatest(st.getField("cursor"),
                  sp.getField("span_end")).as("cursor"),
                concat(st.getField("acc"),
                  when(sp.getField("span_start") > st.getField("cursor"),
                    col(textCol).substr(st.getField("cursor") + 1,
                      sp.getField("span_start") - st.getField("cursor")))
                    .otherwise(lit(""))).as("acc")).cast(
                "struct<cursor:int,acc:string>"))
              .getField("acc"),
            col(textCol).substr(
              aggregate(col("__spans__"), lit(0),
                (c, sp) => greatest(c, sp.getField("span_end"))) + 1,
              length(col(textCol))))))
      .drop("__spans__")
  }
}
