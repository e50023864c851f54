package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * - `bruteForceTopK`: exact cosine top-k — broadcast the query, one narrow
  *   codegen'd pass, TakeOrdered for the top-k (no full sort, no shuffle of
  *   the corpus). The per-row math is `Column`-only (`zip_with` +
  *   `aggregate`), bit-mirrorable in the DuckDB oracle.
  * - `ivfTopK`: IVF-style scale path — corpus pre-bucketed by a coarse
  *   quantizer (cells learned by [[kmeansAssign]], or any existing cell
  *   column), probe only the `nprobe` cells whose centroids are nearest
  *   the query. At 100 TB the corpus is written bucketed/partitioned by
  *   cell id so a probe prunes partitions at the source.
  */
object Ann {

  /** Double-precision dot product: cast floats up FIRST (mirrors DuckDB's
    * `::DOUBLE[]`), sequential left-fold sum.
    */
  def dot(a: Column, b: Column): Column = {
    def d(c: Column) = transform(c, x => x.cast("double"))
    aggregate(zip_with(d(a), d(b), (p, q) => p * q), lit(0.0),
      (acc, v) => acc + v)
  }

  /** L2 norm (double). Precompute ONCE per row before a pair join — norms
    * recomputed per pair are 2/3 of the cosine work.
    */
  def norm(c: Column): Column = sqrt(dot(c, c))

  /** Primitive dot/norm kernels with BIT-IDENTICAL math to [[dot]]/[[norm]]
    * (float→double casts, then a sequential left-fold sum — same rounding
    * at every step), as codegen'd Catalyst expressions
    * ([[FloatDotExpr]]/[[FloatNormExpr]]): no per-element interpretation
    * (the HOFs are CodegenFallback) and no ScalaUDF `Seq[Float]` boxing.
    * Use in pair joins; keep the `Column` versions where a single narrow
    * pass is bit-mirrored in oracle SQL.
    */
  val dotFast: (Column, Column) => Column = (a, b) => FloatDot(a, b)

  val normFast: Column => Column = c => FloatNorm(c)

  /** Elementwise-double cosine (per-pair norms; prefer dot/norm columns in
    * join-heavy paths).
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k rows by cosine against a single query row (DataFrame with
    * one row holding `embCol`). Deterministic tie-break on `idCol`.
    */
  def bruteForceTopK(corpus: DataFrame, query: DataFrame, embCol: String,
      idCol: String, k: Int): DataFrame = {
    val q = broadcast(query.select(col(embCol).as("__q__"),
      normFast(col(embCol)).as("__qn__"))) // query norm computed once
    val scored = corpus.crossJoin(q)
      .withColumn("__cos__",
        dotFast(col(embCol), col("__q__"))
          / (normFast(col(embCol)) * col("__qn__")))
    val top = scored
      .orderBy(col("__cos__").desc, col(idCol))
      .limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("__cos__").desc, col(idCol))))
      .drop("__q__")
  }

  /** Per-cell centroids: posexplode → groupBy(cell, dim) avg (map-side
    * combine; one double per (cell × dim) shuffles, never whole vectors) →
    * reassemble ordered arrays.
    */
  def centroids(corpus: DataFrame, embCol: String,
      cellCol: String): DataFrame =
    corpus
      .select(col(cellCol), posexplode(col(embCol)).as(Seq("__i__", "__v__")))
      .groupBy(col(cellCol), col("__i__"))
      .agg(avg(col("__v__")).as("__m__"))
      .groupBy(col(cellCol))
      .agg(transform(
        sort_array(collect_list(struct(col("__i__"), col("__m__")))),
        s => s.getField("__m__")).as("__centroid__"))

  /** Seeded Lloyd k-means over the embedding column — the learned coarse
    * quantizer for IVF (replaces the earlier `label`-column stand-in).
    * Deterministic: initial centroids are the `k` rows with the smallest
    * `idCol`; each of the fixed `iters` rounds assigns rows to their
    * max-cosine centroid (broadcast k×dim doubles, primitive per-row
    * kernel) and recomputes centroids with the same (cell × dim)-shuffle
    * aggregate as [[centroids]] — the driver only ever holds k×dim
    * doubles, so the loop is a fixed small number of aggregate jobs at
    * any corpus size. Cosine (not L2) assignment keeps training and probe
    * geometry identical. Cells that lose all members keep their previous
    * centroid. Returns the corpus plus `cellCol`.
    */
  def kmeansAssign(corpus: DataFrame, embCol: String, idCol: String,
      cellCol: String, k: Int, iters: Int = 3,
      trainFraction: Double = 1.0): DataFrame = {
    val spark = corpus.sparkSession
    // trainFraction < 1: Lloyd iterations over a seeded sample — the
    // standard IVF build shape at scale (FAISS trains coarse quantizers on
    // ~1% of large corpora): centroid quality converges with the sample,
    // so training cost stops scaling with the corpus, while the single
    // full assignment pass below always covers every row exactly.
    val train =
      if (trainFraction < 1.0) corpus.sample(trainFraction, 42L)
      else corpus
    var cents: Array[Array[Double]] = train.orderBy(col(idCol)).limit(k)
      .select(col(embCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    // corpora smaller than k simply get one cell per row
    val kEff = cents.length
    if (kEff == 0) return corpus.withColumn(cellCol, lit(0))
    def assignUdf(cs: Array[Array[Double]]) = {
      val b = spark.sparkContext.broadcast(cs)
      val u = udf { (v: Seq[Float]) =>
        val cc = b.value
        var best = 0
        var bestSim = Double.NegativeInfinity
        var c = 0
        while (c < cc.length) {
          val cent = cc(c)
          val n = math.min(cent.length, v.length)
          var dot = 0.0; var nv = 0.0; var nc = 0.0
          var j = 0
          while (j < n) {
            val x = v(j).toDouble
            dot += x * cent(j); nv += x * x; nc += cent(j) * cent(j)
            j += 1
          }
          val sim = if (nv == 0.0 || nc == 0.0) 0.0
            else dot / math.sqrt(nv * nc)
          if (sim > bestSim) { bestSim = sim; best = c }
          c += 1
        }
        best
      }
      (u, b)
    }
    var it = 0
    while (it < iters - 1) {
      val (u, b) = assignUdf(cents)
      val assigned = train.withColumn(cellCol, u(col(embCol)))
      val next = centroids(assigned, embCol, cellCol)
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
        .toMap
      // this round's centroids are fully consumed by the collect above —
      // release the broadcast before the next round re-broadcasts k×dim
      b.destroy()
      cents = Array.tabulate(kEff)(c => next.getOrElse(c, cents(c)))
      it += 1
    }
    // the FINAL broadcast stays alive: the returned (lazy) frame reads it
    corpus.withColumn(cellCol, assignUdf(cents)._1(col(embCol)))
  }

  /** Learned-quantizer IVF in one call: k-means cells, ONE persisted
    * assignment (the probe and the pruned brute-force both reuse it — an
    * unpersisted cells frame would re-run the assignment kernel per
    * consumer), shared centroid aggregate. At 100 TB the cells frame is
    * published bucketed by cell id instead of persisted (see
    * `Sources.publishBucketed`) and this helper's layout is the write
    * schema.
    */
  def kmeansIvfTopK(corpus: DataFrame, query: DataFrame, embCol: String,
      idCol: String, kCells: Int, topK: Int, nprobe: Int,
      iters: Int = 3): DataFrame = {
    val cells = kmeansAssign(corpus, embCol, idCol, "__cell__",
      kCells, iters).persist()
    // the probe result is topK rows — materialize it eagerly (lineage cut,
    // tiny local checkpoint) so the cells cache can be released NOW instead
    // of holding executor storage until the caller's action
    val out = ivfTopK(cells, query, embCol, idCol, "__cell__", topK, nprobe)
      .drop("__cell__")
      .localCheckpoint(true)
    cells.unpersist()
    out
  }

  /** The `nprobe` cell ids whose centroids are nearest the query —
    * deterministic (ties broken on cell id). Exposed so callers (and the
    * correctness oracle) can materialize the probe decision itself.
    */
  def probeCells(corpus: DataFrame, query: DataFrame, embCol: String,
      cellCol: String, nprobe: Int): DataFrame = {
    val cents = centroids(corpus, embCol, cellCol)
    val q = broadcast(query.select(col(embCol).as("__q__")))
    cents.crossJoin(q)
      .withColumn("__csim__", cosine(col("__centroid__"), col("__q__")))
      .orderBy(col("__csim__").desc, col(cellCol))
      .limit(nprobe)
      .select(col(cellCol))
  }

  /** IVF probe: rank cells by centroid similarity to the query, brute-force
    * only the top `nprobe` cells. `cellCol` is the coarse-quantizer cell id.
    */
  def ivfTopK(corpus: DataFrame, query: DataFrame, embCol: String,
      idCol: String, cellCol: String, k: Int, nprobe: Int): DataFrame = {
    // cell list is tiny → broadcast semi-join prunes the corpus scan
    val pruned = corpus.join(
      broadcast(probeCells(corpus, query, embCol, cellCol, nprobe)),
      Seq(cellCol), "left_semi")
    bruteForceTopK(pruned, query, embCol, idCol, k)
  }

  /** Blocked kNN JOIN: for every row of `queries`, its top-k neighbors in
    * `corpus` among rows sharing `cellCol` (coarse-quantizer blocking —
    * same recall trade as ivfTopK with nprobe=1, but set-to-set). Norms
    * precomputed per side; ranking via a window partitioned by the query
    * id, so the shuffle key is (cell) for the join and (query id) for the
    * rank — no global sort.
    */
  def knnJoin(queries: DataFrame, corpus: DataFrame, embCol: String,
      idCol: String, cellCol: String, k: Int): DataFrame = {
    val q = queries.select(col(cellCol).as("__cell__"),
      col(idCol).as("query_id"), col(embCol).as("__qe__"),
      normFast(col(embCol)).as("__qn__"))
    val c = corpus.select(col(cellCol).as("__cell__"),
      col(idCol).as("neighbor_id"), col(embCol).as("__ce__"),
      normFast(col(embCol)).as("__cn__"))
    val scored = q.join(c, Seq("__cell__"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        dotFast(col("__qe__"), col("__ce__"))
          / (col("__qn__") * col("__cn__")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
