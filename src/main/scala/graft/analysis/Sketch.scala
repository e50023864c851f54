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
        // one md5 per (gram, r): the seed is in the hashed string.
        // r19: fused digest-prefix kernel == conv(substring(md5(x),1,8),
        // 16,10) (Md5PrefixSpec) — no hex string/substring/parse per cell
        Md5Prefix(concat(col("r").cast("string"), lit(":"),
          col("__g__")), 8) % width)
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
        Md5Prefix(concat(col("r").cast("string"), lit(":"),
          col(gramCol)), 8) % width)
      .join(broadcast(grid), Seq("r", "bucket"), "left")
      .groupBy(gramCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))
  }

  // ---- HyperLogLog distinct-cardinality sketch ----------------------------

  /** Hash width in bits: 15 md5 hex chars → 60 bits, the widest prefix
    * `conv(…,16,10)` holds without signed-64 overflow (the CMS/DSIR/NB
    * house hash, widened).
    */
  private val HashBits = 60

  /** HyperLogLog register frame (Flajolet et al. 2007) — the
    * CARDINALITY estimation gap beside [[cmsBuild]]'s frequency grid:
    * exact `count(distinct token)` over 100 TB shuffles every distinct
    * token; the HLL register frame shuffles AT MOST `2^p` rows (map-side
    * combined `max`), and two corpora's register frames union-merge by
    * the same `max` — see [[hllMerge]] — so per-shard sketches roll up
    * without ever touching the raw corpus again.
    *
    * One row per NON-EMPTY register: (bucket, maxrho). bucket = the low
    * `p` hash bits; rho = leading-zero count of the remaining
    * `60-p` bits + 1, computed in BOTH engines as
    * `(61-p) - length(ltrim(bin(h >> p), '0'))` — `bin` renders without
    * leading zeros in Spark and DuckDB alike and `ltrim` guards the
    * rem=0 row, so the whole register frame (and therefore the
    * estimate) replays bit-exactly in SQL. Standard error ≈
    * 1.04/√(2^p); p=9 → ~4.6%.
    */
  def hllRegisters(items: DataFrame, itemCol: String, p: Int): DataFrame =
    hllRegistersBy(items, Nil, itemCol, p)

  /** Grouped register frames — one independent sketch per key tuple
    * (per-language vocabulary, per-source dedup-key cardinality, …):
    * ≤ |keys| × 2^p rows out of ONE map-side-combined aggregate, the
    * data-card granularity without |keys| corpus passes.
    */
  def hllRegistersBy(items: DataFrame, keys: Seq[String], itemCol: String,
      p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p out of range: $p")
    val m = 1 << p
    // r19: fused digest-prefix kernel, same value as the conv/substring
    // chain (Md5PrefixSpec pins the 15-hex width too)
    val h = Md5Prefix(concat(lit("hll:"), col(itemCol)), 15)
    items.select(keys.map(col) :+ h.as("__h__"): _*)
      .select(keys.map(col) ++ Seq((col("__h__") % m).as("bucket"),
        (lit(HashBits - p + 1) -
          length(ltrim(bin(shiftright(col("__h__"), p)), "0"))).as("rho")): _*)
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("maxrho"))
  }

  /** Merge two register frames (sketches of different corpora →
    * sketch of the union): groupBy-max, still ≤ 2^p rows.
    */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bucket").agg(max("maxrho").as("maxrho"))

  /** One-row cardinality estimate from a register frame. All-integer
    * except the final division: the harmonic sum Σ 2^−Mj is carried as
    * the INTEGER `harmonic_num` = Σ 2^(R−Mj) (R = 61−p; empty registers
    * contribute 2^R; ≤ 2^p·2^R ≤ 2^61 — no overflow, no float-sum
    * order sensitivity), and the estimate ships as `est_x1000` =
    * ⌊est·1000 + 0.5⌋ so the only doubles crossing the engine boundary
    * come from one literal-folded constant and one division — bit-exact
    * replay. Small-range linear counting (raw ≤ 2.5m, zeros > 0) is
    * included for spec-level use on tiny sets; the `alpha_m` constant
    * assumes m ≥ 128.
    */
  def hllEstimate(registers: DataFrame, p: Int): DataFrame =
    hllEstimateBy(registers, Nil, p)

  /** Per-key estimates from a [[hllRegistersBy]] frame — same integer
    * harmonic-sum / fix-point arithmetic, one row per key tuple.
    */
  def hllEstimateBy(registers: DataFrame, keys: Seq[String],
      p: Int): DataFrame = {
    val m = 1 << p
    val r = HashBits - p + 1
    val mD = m.toDouble
    val alphaM2R = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(mD)) *
      lit(mD) * lit(mD) * lit(math.pow(2.0, r))
    val zeros = lit(m.toLong) - col("n_nonempty")
    val raw = alphaM2R / col("harmonic_num").cast("double")
    val est = when(raw <= lit(2.5 * mD) && zeros > 0,
      lit(mD) * log(lit(mD) / zeros.cast("double"))).otherwise(raw)
    registers
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_nonempty"),
        // coalesce: a sum over ZERO register rows (empty corpus) is NULL,
        // which would NULL the whole estimate chain; 0 degrades it to the
        // linear-counting value m·ln(m/m) = 0 instead (ADVICE r9). The
        // oracle SQL carries the same coalesce.
        coalesce(sum(pow(lit(2.0),
            lit(r.toDouble) - col("maxrho").cast("double")).cast("long")),
          lit(0L)).as("hsum"))
      .select(keys.map(col) ++ Seq(lit(m.toLong).as("m"),
        col("n_nonempty"), zeros.as("zeros"),
        (col("hsum") + zeros * lit(1L << r)).as("harmonic_num")): _*)
      .withColumn("est_x1000", floor(est * lit(1000.0) + lit(0.5)).cast("long"))
  }
}
