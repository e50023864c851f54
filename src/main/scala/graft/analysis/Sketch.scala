package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min Sketch term frequency (Cormode & Muthukrishnan 2005) — the
  * sketch-based scale path beside [[TermStats.topNgrams]]'s exact
  * aggregate: the exact path shuffles every distinct gram; the sketch
  * shuffles AT MOST `depth × width` cells no matter how many distinct
  * grams the corpus holds (the grid partial-aggregates map-side), and
  * point estimates come from a broadcast-sized grid join. The classic
  * trade, explicit: estimates can only OVER-count (each cell is a sum
  * over colliding grams; the min across `depth` independent rows bounds
  * the inflation at ε·N with probability 1−δ for w=⌈e/ε⌉, d=⌈ln 1/δ⌉);
  * an estimate below a threshold is therefore a PROOF the gram is
  * below it — the direction heavy-hitter screens need.
  *
  * Determinism is the point of this implementation: the row hashes are
  * seeded md5 prefixes (`conv(substring(md5(r:gram),1,8),16,10) % w` —
  * the DSIR/NB house hash), not JVM murmur, so the ENTIRE sketch — grid
  * and estimates — is replayed bit-exactly in SQL by the oracle; no
  * "approx results don't hash-match" escape hatch.
  */
object Sketch {

  /** The sketch grid over a (gram-occurrence) frame: (r, bucket, cnt)
    * with one row per NON-EMPTY cell — ≤ depth × width rows, map-side
    * combined. `grams` must carry one row per occurrence (multiplicity
    * preserved), matching [[TermStats.topNgrams]] counting.
    */
  def cmsBuild(grams: DataFrame, gramCol: String, depth: Int,
      width: Int): DataFrame = {
    val rows = explode(array((0 until depth).map(lit): _*)).as("r")
    grams.select(col(gramCol).as("__g__"), rows)
      .withColumn("bucket",
        // one md5 per (gram, r): the seed is in the hashed string
        conv(substring(md5(concat(col("r").cast("string"), lit(":"),
          col("__g__"))), 1, 8), 16, 10).cast("long") % width)
      .groupBy("r", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `candidates` (gramCol): min over the depth rows
    * of the grid cell each hash lands in — the CMS upper bound. The grid
    * is broadcast (≤ depth × width rows by construction).
    */
  def cmsEstimate(candidates: DataFrame, gramCol: String, grid: DataFrame,
      depth: Int, width: Int): DataFrame = {
    val rows = explode(array((0 until depth).map(lit): _*)).as("r")
    candidates.select(col(gramCol), rows)
      .withColumn("bucket",
        conv(substring(md5(concat(col("r").cast("string"), lit(":"),
          col(gramCol))), 1, 8), 16, 10).cast("long") % width)
      .join(broadcast(grid), Seq("r", "bucket"), "left")
      .groupBy(gramCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))
  }
}
