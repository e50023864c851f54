package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.scoring.NaiveBayes

/** DSIR-style importance resampling — "Data Selection via Importance
  * Resampling" (Xie et al., NeurIPS 2023): select raw-corpus documents
  * whose hashed-n-gram distribution looks like a TARGET corpus. The
  * reference pipeline has no trained selection stage at all (its filters
  * are hand heuristics); at 100 TB this is the standard way a pretraining
  * corpus is steered toward a domain (the DoReMi/DSIR/DCLM lineage).
  *
  * Model: bag of hashed unigrams+bigrams into `buckets` buckets; the
  * importance weight of bucket b is `log p_target(b) - log p_raw(b)`
  * (add-one smoothed); a document's score is the sum of its grams'
  * bucket weights. Resampling keeps the top-k by score (the
  * temperature-0 variant; [[gumbelTopK]] is the paper's sampled
  * variant — Gumbel-top-k over the same scores with seeded noise).
  *
  * Cross-engine exactness by construction (the NaiveBayes trick): the
  * per-bucket log-ratios are quantized to integer micro-nats with
  * `StrictMath.log` at fit time, so a document score is a sum of longs —
  * independent of summation order, partitioning, and libm. The
  * `dsir_select` oracle replays scoring in DuckDB from the exported
  * integer weight table; `dsir_bucket_counts` re-derives the raw count
  * grid (tokenize → hash → count) entirely in SQL.
  *
  * Scale shape:
  *  - FIT: two map-side-combined aggregations (target and raw bucket
  *    counts) whose outputs are `buckets` rows each — the one driver
  *    materialization is the bounded weight table, never corpus rows.
  *  - SCORE: zero shuffle — grams, hashing, and the weight lookup run
  *    per-row with the dense weight array in the UDF closure.
  *  - SELECT: `orderBy(score).limit(k)` plans as TakeOrdered (per-
  *    partition top-k + driver merge of k·parallelism rows), no global
  *    sort; [[gumbelTopK]] keeps the same shape.
  */
object Dsir {

  /** Hash a gram to a bucket: first 8 hex chars of md5 read as an
    * unsigned 32-bit int, mod `buckets`. Chosen because both engines
    * derive it from the SAME primitive (`md5` hex text): Spark
    * `conv(substring(md5(g), 1, 8), 16, 10)` ≡ DuckDB
    * `('0x' || substr(md5(g), 1, 8))::BIGINT`.
    */
  def hashBucket(gram: Column, buckets: Int): Column =
    // r19: fused digest-prefix kernel == conv(substring(md5(g),1,8),16,10)
    // (Md5PrefixSpec differential pins the value equality)
    graft.analysis.Md5Prefix(gram, 8) % buckets

  /** Unigrams + adjacent bigrams (joined with '_') over the shared
    * engine tokenizer (same tokens as [[NaiveBayes.tokensCol]] — `\w+` on
    * lowercased text, in lock-step with the oracle's
    * `regexp_extract_all`).
    */
  def gramsCol(text: Column): Column =
    // r18: fused kernel — token-for-token and gram-for-gram identical to
    // the previous zip_with/slice composition (FusedTextSpec pins it);
    // the md5 hashing downstream makes byte identity load-bearing
    graft.text.FusedText.wordGrams(text)

  /** Per-row array of bucket ids (with multiplicity). */
  def bucketsCol(text: Column, buckets: Int): Column =
    transform(gramsCol(text), g => hashBucket(g, buckets))

  /** Sparse (bucket, cnt) gram-occurrence counts — one explode + one
    * map-side-combined aggregate; at most `buckets` rows shuffle.
    */
  def bucketCounts(df: DataFrame, text: Column, buckets: Int): DataFrame =
    df.select(explode(bucketsCol(text, buckets)).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Dense target-vs-raw count grid over all `buckets` buckets (zeros
    * explicit) — the `dsir_bucket_counts` artifact and [[fit]]'s input.
    */
  def countGrid(target: DataFrame, raw: DataFrame, text: Column,
      buckets: Int): DataFrame = {
    val spark = target.sparkSession
    val t = bucketCounts(target, text, buckets)
      .withColumnRenamed("cnt", "target_cnt")
    val r = bucketCounts(raw, text, buckets)
      .withColumnRenamed("cnt", "raw_cnt")
    spark.range(buckets).select(col("id").as("bucket"))
      .join(t, Seq("bucket"), "left")
      .join(r, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("target_cnt"), lit(0L)).as("target_cnt"),
        coalesce(col("raw_cnt"), lit(0L)).as("raw_cnt"))
  }

  /** Fit the importance-weight table from a target and a raw corpus:
    * `lw[b] = floor((ln((t_b+1)/(T+B)) - ln((r_b+1)/(R+B))) * 1e6)`.
    * The collect is the B-row model download (B is a config constant —
    * DSIR uses 10k buckets at paper scale), never corpus rows.
    */
  def fit(target: DataFrame, raw: DataFrame, text: Column,
      buckets: Int): DsirModel =
    fitWithGrid(target, raw, text, buckets)._1

  /** [[fit]] plus the dense grid rows it collected — so a caller that
    * needs BOTH the model and the (bucket, target_cnt, raw_cnt) grid
    * (the `dsir_fit` suite line joins exactly this grid with the fitted
    * weights) reuses the fit's own B-row download instead of re-running
    * the two gram aggregations a second time (r19, guide §1.2: the
    * timed dsir_fit line paid 4 corpus gram passes for 2 passes' worth
    * of information).
    */
  def fitWithGrid(target: DataFrame, raw: DataFrame, text: Column,
      buckets: Int): (DsirModel, Array[org.apache.spark.sql.Row]) = {
    val grid = countGrid(target, raw, text, buckets).collect()
    val tc = new Array[Long](buckets)
    val rc = new Array[Long](buckets)
    grid.foreach { row =>
      val b = row.getLong(0).toInt
      tc(b) = row.getLong(1)
      rc(b) = row.getLong(2)
    }
    val tTot = tc.sum + buckets
    val rTot = rc.sum + buckets
    def ln(x: Double): Double = StrictMath.log(x)
    val lw = Array.tabulate(buckets) { b =>
      math.floor(
        (ln((tc(b) + 1).toDouble / tTot) - ln((rc(b) + 1).toDouble / rTot))
          * 1e6).toLong
    }
    (DsirModel(buckets, lw), grid)
  }

  /** The weight table as a DataFrame — the integer side-channel the
    * `dsir_select` oracle consumes: (bucket, lw_micro), dense.
    */
  def modelFrame(spark: org.apache.spark.sql.SparkSession,
      m: DsirModel): DataFrame = {
    import spark.implicits._
    m.lwMicro.indices.map(b => (b.toLong, m.lwMicro(b)))
      .toDF("bucket", "lw_micro")
  }

  /** Adds `dsir_score_micro`: the document's summed bucket weights.
    * Zero shuffle — the dense weight array rides in the UDF closure
    * (per-executor reuse, same pattern as the NB/F2 scorers). A document
    * with no grams scores 0.
    */
  def score(df: DataFrame, text: Column, model: DsirModel): DataFrame = {
    val lw = model.lwMicro
    val sumUdf = udf { (bs: Seq[Long]) =>
      var s = 0L
      if (bs != null) bs.foreach(b => s += lw(b.toInt))
      s
    }
    df.withColumn("dsir_score_micro",
      sumUdf(bucketsCol(text, model.buckets)))
  }

  /** Deterministic top-k by (score desc, id asc) — TakeOrdered, no
    * global sort. The temperature-0 resample.
    */
  def topK(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored.orderBy(col("dsir_score_micro").desc, col(idCol)).limit(k)

  /** Gumbel-top-k resampling (the paper's sampler): keep the k largest
    * `score + g_i` where `g_i = -ln(-ln(u_i))` and `u_i` is a seeded
    * per-row uniform derived from md5 (the engine's standard seeded-
    * shuffle primitive — see Mixture/R4). Equivalent to sampling k
    * documents without replacement with probability ∝ exp(score).
    * Noise is quantized to micro-nats so selection stays a long
    * comparison; `StrictMath` keeps it platform-reproducible.
    */
  def gumbelTopK(scored: DataFrame, idCol: String, k: Int,
      seed: Long): DataFrame = {
    val gumbelUdf = udf { (hex8: String) =>
      // (hash + 1) / (2^32 + 1) ∈ (0, 1): never 0 or 1, so both ln are finite
      val u = (java.lang.Long.parseLong(hex8, 16) + 1.0) / 4294967297.0
      math.floor(-StrictMath.log(-StrictMath.log(u)) * 1e6).toLong
    }
    scored
      .withColumn("_gumbel_micro",
        gumbelUdf(substring(
          md5(concat(lit(s"$seed:"), col(idCol).cast("string"))), 1, 8)))
      .withColumn("_keyed", col("dsir_score_micro") + col("_gumbel_micro"))
      .orderBy(col("_keyed").desc, col(idCol))
      .limit(k)
      .drop("_gumbel_micro", "_keyed")
  }
}

/** Dense per-bucket importance weights in micro-nats. */
final case class DsirModel(buckets: Int, lwMicro: Array[Long])
  extends Serializable
