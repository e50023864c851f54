package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators Spark lacks as built-ins, each expressed as a
  * shuffle shape that survives 100 TB rather than a join Spark can't
  * plan well:
  *
  *  - [[asofJoin]] — "latest right row at-or-before each left row" via a
  *    tagged UNION + one running-window pass: one shuffle on the key,
  *    NO join operator at all. The naive formulation (left join on key +
  *    ts range, then keep the max-ts match per left row) explodes on hot
  *    keys — a key with n left × m right rows materializes n·m join rows
  *    before the window prunes them; the union form carries n+m rows,
  *    period.
  *  - [[sessionize]] — gaps-and-islands sessionization. The session
  *    boundary flag and the per-session aggregate share ONE hash
  *    partitioning: the groupBy keys refine the window's partition key,
  *    so Catalyst plans zero additional exchanges after the first
  *    shuffle-by-user.
  *  - [[nearTimePairs]] — bounded-gap self-pairing via bucket join: each
  *    probe row is emitted into its own time bucket AND the next one, so
  *    every qualifying pair co-locates under exactly ONE (key, bucket)
  *    — equality join keys (shuffle-hash-joinable, AQE-skew-splittable),
  *    no range-join nested loop, no double counting.
  */
object Temporal {

  /** As-of join: for every `left` row, the payload of the LATEST `right`
    * row with the same `keys` and `right.tsCol` ≤ `left.tsCol`
    * (`direction = "backward"`, inclusive — the market-data convention),
    * or the EARLIEST right row with ts ≥ left's for
    * `direction = "forward"`. Left rows with no match get nulls.
    *
    * `payload` names the right-side columns to attach (each surfaced as
    * `<name><suffix>`). Right rows should be unique per (keys, ts) —
    * with several right rows on the same key and timestamp the payload
    * of an arbitrary one wins (document-order nondeterminism, exactly
    * like multi-match ASOF in other engines).
    *
    * Plan: union right (side 0) and left (side 1) rows, sort each key
    * partition by (ts, side) — ascending for backward, descending for
    * forward; either way a right row at the exact left timestamp sorts
    * FIRST and is therefore visible — and carry payloads forward with
    * `last(ignoreNulls)` over an unbounded-preceding running frame.
    * One shuffle, codegen'd window, n+m rows.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payload: Seq[String],
      suffix: String = "_asof",
      direction: String = "backward"): DataFrame = {
    val tsOrd = direction match {
      case "backward" => (c: Column) => c.asc
      case "forward" => (c: Column) => c.desc
      case other =>
        throw new IllegalArgumentException(
          s"direction must be backward|forward, got $other")
    }
    val leftCols = left.columns
    val sideCol = "__asof_side__"
    val l = left
      .withColumn(sideCol, lit(1))
      .select((leftCols.map(col) ++
        (payload.map(p => lit(null).as(p + suffix)) :+ col(sideCol)))
        .toIndexedSeq: _*)
    val r = right
      .select(keys.map(col) ++ (col(tsCol) +: payload.map(p => col(p).as(p + suffix))): _*)
      .withColumn(sideCol, lit(0))
    // left-only columns are null on right rows
    val rAligned = l.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }.select(l.columns.map(col).toIndexedSeq: _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrd(col(tsCol)), col(sideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(l.unionByName(rAligned)) { (df, p) =>
      df.withColumn(p + suffix,
        last(col(p + suffix), ignoreNulls = true).over(w))
    }
    carried.where(col(sideCol) === 1).drop(sideCol)
  }

  /** Gap-based sessionization: rows of `df` sharing `keyCol` belong to
    * one session while consecutive event-time gaps stay ≤ `maxGap`
    * microseconds. Returns one row per session:
    * (keyCol, session_start_us, session_end_us, n_events).
    *
    * The running sum of new-session flags and the final aggregate both
    * cluster by `keyCol` (the aggregate's (key, session) grouping is a
    * refinement), so the whole operator is ONE shuffle.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      maxGapUs: Long): DataFrame = {
    val us = unix_micros(col(tsCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(us.asc)
    val run = Window.partitionBy(col(keyCol)).orderBy(us.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__us__", us)
      .withColumn("__new__",
        when(col("__us__") - lag(col("__us__"), 1).over(w) <= maxGapUs,
          lit(0L)).otherwise(lit(1L)))
      .withColumn("__sess__", sum(col("__new__")).over(run))
      .groupBy(col(keyCol), col("__sess__"))
      .agg(min(col("__us__")).as("session_start_us"),
        max(col("__us__")).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .drop("__sess__")
  }

  /** Ordered near-in-time pairs: every (a, b) with equal `keys`,
    * `a.ts < b.ts ≤ a.ts + maxGapUs`. Returns
    * (keys..., a_<idCol>, b_<idCol>, a_us, b_us).
    *
    * Binned equality join: b lands in bucket ⌊us/maxGap⌋; a probes its
    * own bucket and the next (any b within the gap is in one of the
    * two), so the join key is (keys, bucket) — a plain shuffle-hash
    * join — and the exact predicate filters residue. Each qualifying
    * pair is produced exactly once because b's bucket is single-valued.
    */
  def nearTimePairs(df: DataFrame, keys: Seq[String], idCol: String,
      tsCol: String, maxGapUs: Long): DataFrame = {
    val base = df.select(
      keys.map(col) ++ Seq(col(idCol), unix_micros(col(tsCol)).as("__us__")): _*)
    val bkt = floor(col("__us__") / maxGapUs)
    val probe = base
      .withColumn("__bkt__", explode(array(bkt, bkt + 1)))
      .select(keys.map(col) ++ Seq(col(idCol).as(s"a_$idCol"),
        col("__us__").as("a_us"), col("__bkt__")): _*)
    val build = base
      .withColumn("__bkt__", bkt)
      .select(keys.map(col) ++ Seq(col(idCol).as(s"b_$idCol"),
        col("__us__").as("b_us"), col("__bkt__")): _*)
    probe.join(build, keys :+ "__bkt__")
      .where(col("b_us") > col("a_us") &&
        col("b_us") <= col("a_us") + maxGapUs)
      .drop("__bkt__")
  }
}
