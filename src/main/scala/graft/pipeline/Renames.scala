package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Projection/rename surface of utils.py (SURVEY §2.2 R6-R9). */
object Renames {

  /** R6 `rename_dry_run_columns` — utils.py:160-169: prefix newly-added
    * score columns with `{filterColumn}__`, skipping the protected set and
    * anything already prefixed.
    */
  def renameDryRunColumns(df: DataFrame, filterColumn: String): DataFrame = {
    val protectedCols =
      Set("output_text", "input_text", "summary", "user_id")
    df.columns.foldLeft(df) { (acc, c) =>
      if (protectedCols.contains(c) || c.contains("__")) acc
      else acc.withColumnRenamed(c, s"${filterColumn}__$c")
    }
  }

  /** R6 `prepare_edit_dataset` — utils.py:178-187. */
  def prepareEditDataset(df: DataFrame): DataFrame = {
    val renamed = df
      .withColumnRenamed("model_input", "input_text")
      .withColumnRenamed("edited_response", "output_text")
    val keep = Seq("input_text", "output_text", "user_id", "response")
      .filter(renamed.columns.contains)
    renamed.select(keep.map(col): _*)
  }

  /** R7 `remove_unused_columns` — utils.py:190-194. */
  def removeUnusedColumns(df: DataFrame): DataFrame = {
    val keep = Seq("user_id", "input_text", "output_text")
      .filter(df.columns.contains)
    df.select(keep.map(col): _*)
  }

  /** R8 `add_concatenated_column` — utils.py:296-301. */
  def addConcatenatedColumn(df: DataFrame, name: String,
      specialToken: String): DataFrame =
    df.withColumn(name,
      concat(col("response"), lit(specialToken), col("output_text")))

  /** R9 `post_process_output_text` — utils.py:197-202:
    * `" " + clean_new_lines(x) + "\n"`.
    */
  def postProcessOutputText(df: DataFrame): DataFrame =
    df.withColumn("output_text",
      concat(lit(" "),
        graft.text.Cleaners.cleanNewLines(col("output_text")), lit("\n")))
}
