package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) — the 100 TB memory story for embedding
  * search that IVF alone doesn't give: each D-dim float vector (D·4
  * bytes) is stored as `m` one-byte codes (one k≤256-centroid codebook
  * per D/m-dim subspace), a 32× compression at the default (64-dim
  * float → 8 codes), and a query scans codes with table lookups instead
  * of float dot products (ADC — asymmetric distance computation).
  *
  * Division of labor, mirroring [[Ann.kmeansAssign]]/IVF:
  *  - TRAIN on a bounded seeded sample (TakeOrdered by a seeded md5 key —
  *    per-partition top-N, no global sort); the driver runs Lloyd per
  *    subspace over sample×(D/m) doubles — codebooks are m·k·(D/m) = k·D
  *    doubles total, independent of corpus size.
  *  - ENCODE is a zero-shuffle per-row pass (codebooks in the closure).
  *  - QUERY builds the m×k ADC table once on the driver, quantized to
  *    integer micro-units (`floor(d² · 1e6)`), so a row's approximate
  *    distance is a SUM OF LONGS — independent of summation order and
  *    libm, and exactly replayable by the `ann_pq_topk` DuckDB oracle
  *    from the exported (codes, table) side-channel frames. Top-k is
  *    TakeOrdered.
  *
  * At 100 TB the codes frame is the thing you persist (32× smaller than
  * the embeddings), bucketed by an IVF cell id (`Ann.kmeansAssign`) so a
  * probe prunes partitions at the source and ADC-scans only the probed
  * cells' codes.
  */
object Pq {

  /** Deterministic bounded training sample: the `maxTrain` smallest
    * seeded-md5 keys — uniform-ish, order-stable, and planned as
    * TakeOrderedAndProject (no shuffle of the corpus).
    */
  private def trainSample(corpus: DataFrame, embCol: String, idCol: String,
      maxTrain: Int, seed: Long): Array[Array[Float]] =
    corpus
      .select(col(idCol), col(embCol))
      .where(col(embCol).isNotNull) // a null row must not NPE the train
      .orderBy(md5(concat(lit(s"$seed:"), col(idCol).cast("string"))),
        col(idCol))
      .limit(maxTrain)
      .collect()
      .map(_.getSeq[Float](1).toArray)

  /** Lloyd k-means with L2 over one subspace's sample slices, on the
    * driver. Deterministic: init = the first `k` DISTINCT subvectors in
    * sample order (duplicate inits would pin dead centroids), fixed
    * `iters` rounds, argmin ties keep the lowest code, emptied cells
    * keep their previous centroid.
    */
  private def lloyd(slices: Array[Array[Double]], k: Int,
      iters: Int, dim: Int): Array[Array[Double]] = {
    val init = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val seen = scala.collection.mutable.HashSet.empty[Seq[Double]]
    var i = 0
    while (i < slices.length && init.length < k) {
      val s = slices(i)
      if (seen.add(s.toSeq)) init += s.clone()
      i += 1
    }
    var cents = init.toArray
    // an empty sample must still yield a centroid of the SUBSPACE
    // dimension — a 0-length centroid would violate the invariant
    // adcTable/adcTopK/queryGrid index against (cent(j) AIOOBE)
    if (cents.isEmpty) return Array(new Array[Double](dim))
    var it = 0
    while (it < iters) {
      val dim = cents(0).length
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      slices.foreach { s =>
        val c = nearest(cents, s)
        counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += s(j); j += 1 }
      }
      cents = Array.tabulate(cents.length) { c =>
        if (counts(c) == 0L) cents(c)
        else {
          val out = new Array[Double](dim)
          var j = 0
          while (j < dim) { out(j) = sums(c)(j) / counts(c); j += 1 }
          out
        }
      }
      it += 1
    }
    cents
  }

  /** Argmin-L2 code; strict `<` keeps the LOWEST index on exact ties —
    * the cross-engine-stable tie-break the encode UDF shares.
    */
  private def nearest(cents: Array[Array[Double]],
      v: Array[Double]): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d = 0.0
      var j = 0
      val n = math.min(cent.length, v.length)
      while (j < n) {
        val diff = v(j) - cent(j)
        d += diff * diff
        j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Train per-subspace codebooks. `dim` must be divisible by `m`. */
  def train(corpus: DataFrame, embCol: String, idCol: String, dim: Int,
      m: Int, k: Int, iters: Int = 5, maxTrain: Int = 10000,
      seed: Long = 42L): PqModel = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val sample = trainSample(corpus, embCol, idCol, maxTrain, seed)
    val books = Array.tabulate(m) { sub =>
      val slices = sample.map { v =>
        Array.tabulate(subDim)(j => v(sub * subDim + j).toDouble)
      }
      lloyd(slices, k, iters, subDim)
    }
    PqModel(m, k, subDim, books)
  }

  /** Adds `codeCol`: the m-byte PQ code as `array<int>`. Zero shuffle —
    * codebooks ride in the UDF closure.
    */
  def encode(corpus: DataFrame, embCol: String, model: PqModel,
      codeCol: String): DataFrame = {
    val mm = model
    val enc = udf { (v: Seq[Float]) =>
      if (v == null) None
      else {
        val arr = v.toArray
        Some(Array.tabulate(mm.m) { sub =>
          val slice = Array.tabulate(mm.subDim)(j =>
            arr(sub * mm.subDim + j).toDouble)
          nearest(mm.codebooks(sub), slice)
        })
      }
    }
    // null embeddings get NULL codes (never a crashed job); downstream
    // scans filter them out — an unembeddable row can't be served
    corpus.withColumn(codeCol, enc(col(embCol)))
  }

  /** The exploded codes frame — (id, sub, code), the compact published
    * layout and the oracle side-channel.
    */
  def codesFrame(encoded: DataFrame, idCol: String,
      codeCol: String): DataFrame =
    encoded.select(col(idCol),
      posexplode(col(codeCol)).as(Seq("sub", "code")))

  /** The query's ADC lookup table, micro-quantized: (sub, code,
    * d2_micro) with `d2_micro = floor(||q_sub - centroid||² · 1e6)`.
    * m×k rows — driver-built, broadcast-sized.
    */
  def adcTable(spark: SparkSession, query: Array[Float],
      model: PqModel): DataFrame = {
    import spark.implicits._
    val grid = queryGrid(model, query.toSeq)
    val rows = for {
      sub <- 0 until model.m
      code <- grid(sub).indices
    } yield (sub, code, grid(sub)(code))
    rows.toDF("sub", "code", "d2_micro")
  }

  /** ADC top-k over an encoded corpus: per-row integer table-lookup sum
    * (zero shuffle), then TakeOrdered by (distance asc, id asc). Returns
    * (rank, id, pq_d2_micro).
    */
  def adcTopK(encoded: DataFrame, idCol: String, codeCol: String,
      query: Array[Float], model: PqModel, k: Int): DataFrame = {
    // dense m×k lookup array in the closure — THE SAME integers as
    // adcTable/adcTablesFrame by construction (one quantization loop)
    val table = queryGrid(model, query.toSeq)
    val dist = udf { (codes: Seq[Int]) =>
      var s = 0L
      var sub = 0
      while (sub < table.length) { s += table(sub)(codes(sub)); sub += 1 }
      s
    }
    val scored = encoded.where(col(codeCol).isNotNull)
      .withColumn("pq_d2_micro", dist(col(codeCol)))
      .orderBy(col("pq_d2_micro"), col(idCol))
      .limit(k)
    scored.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("pq_d2_micro"), col(idCol))))
      .select(col("rank"), col(idCol), col("pq_d2_micro"))
  }

  /** IVF-PQ (the FAISS serving architecture): probe the `nprobe`
    * coarse cells nearest the query ([[Ann.probeCells]] over the cell
    * column learned by [[Ann.kmeansAssign]]), then ADC-scan only the
    * probed cells' codes. At 100 TB the codes frame is PUBLISHED
    * bucketed/partitioned by the cell id, so the broadcast semi-join
    * prunes partitions at the source and the scan touches nprobe/k of
    * the corpus — compounding PQ's 32× byte shrink with IVF's scan
    * shrink. Pass the result through [[refineTopK]]'s re-rank pattern
    * when exact ordering matters.
    */
  def ivfAdcTopK(encoded: DataFrame, idCol: String, codeCol: String,
      embCol: String, cellCol: String, query: Array[Float],
      model: PqModel, k: Int, nprobe: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val qDf = Seq(Tuple1(query.toSeq)).toDF(embCol)
    val probed = Ann.probeCells(encoded, qDf, embCol, cellCol, nprobe)
    adcTopK(encoded.join(broadcast(probed), Seq(cellCol), "left_semi"),
      idCol, codeCol, query, model, k)
  }

  /** The per-query ADC lookup grid as driver-free row math: for a query
    * embedding, `out(sub)(code) = floor(||q_sub − centroid||² · 1e6)` —
    * the same integers [[adcTable]] builds for one driver-held query,
    * computed INSIDE the row so a query BATCH never touches the driver.
    * Identical loop order to [[adcTable]] (deterministic IEEE doubles),
    * so an exported frame and the serving closure agree bit-for-bit.
    */
  private def queryGrid(model: PqModel, v: Seq[Float]): Array[Array[Long]] = {
    val arr = v.toArray
    Array.tabulate(model.m) { sub =>
      model.codebooks(sub).indices.map { code =>
        val cent = model.codebooks(sub)(code)
        var d = 0.0
        var j = 0
        while (j < model.subDim) {
          val diff = arr(sub * model.subDim + j).toDouble - cent(j)
          d += diff * diff
          j += 1
        }
        math.floor(d * 1e6).toLong
      }.toArray
    }
  }

  /** (query_id, sub, code, d2_micro) for EVERY query row — the exported
    * oracle frame / published serving artifact of a query batch's ADC
    * tables (Q·m·k rows; bounded by the batch, never by the corpus).
    */
  def adcTablesFrame(queries: DataFrame, embCol: String,
      queryIdCol: String, model: PqModel): DataFrame = {
    val mm = model
    // null embedding → no grid rows (posexplode of null emits nothing),
    // mirroring encode()'s null passthrough — never a crashed job
    val grid = udf { (v: Seq[Float]) =>
      if (v == null) None else Some(queryGrid(mm, v)) }
    queries
      .select(col(queryIdCol).as("query_id"), grid(col(embCol)).as("__g__"))
      .select(col("query_id"), posexplode(col("__g__")).as(Seq("sub", "__r__")))
      .select(col("query_id"), col("sub"),
        posexplode(col("__r__")).as(Seq("code", "d2_micro")))
  }

  /** Batched probe decision — the set-to-set twin of [[Ann.probeCells]]:
    * for EACH query row, the `nprobe` cells whose centroids are nearest
    * (cosine, ties on cell id). Centroids are a k×dim aggregate
    * broadcast against the query batch (BroadcastNestedLoopJoin linear
    * in |queries|, never in the corpus); per-query ranking is a window
    * on query_id — no global sort, no per-query driver round-trips.
    * Returns (query_id, cell).
    */
  def probeCellsBatch(corpus: DataFrame, queries: DataFrame,
      embCol: String, queryIdCol: String, cellCol: String,
      nprobe: Int): DataFrame = {
    val cents = broadcast(Ann.centroids(corpus, embCol, cellCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__csim__").desc, col(cellCol))
    queries
      .where(col(embCol).isNotNull) // unembeddable queries probe nothing
      .select(col(queryIdCol).as("query_id"), col(embCol).as("__qe__"))
      .crossJoin(cents)
      .withColumn("__csim__", Ann.cosine(col("__centroid__"), col("__qe__")))
      .withColumn("__pr__", row_number().over(w))
      .where(col("__pr__") <= nprobe)
      .select(col("query_id"), col(cellCol).as("cell"))
  }

  /** Batched IVF-PQ serving (VERDICT r10 #6): top-k ADC neighbors in the
    * encoded corpus for EVERY row of a query batch — the set-to-set twin
    * of [[ivfAdcTopK]], which collects ONE query vector to the driver
    * (fine for a probe, wrong as the serving shape; [[Ann.knnJoin]] is
    * the precedent). Self-pairs (query_id = corpus id) are excluded,
    * matching knnJoin.
    *
    * Plan shape (the 100 TB contract): the corpus is NEVER shuffled —
    *  - the probe decision (Q·nprobe rows) broadcast-semi-prunes the
    *    corpus scan to probed cells (partition pruning when the codes
    *    frame is published partitioned by cell),
    *  - the query batch's ADC grids (Q rows × m·k longs) broadcast-join
    *    candidates on cell membership,
    *  - per-pair distance is an O(m) integer lookup sum,
    *  - the ONLY exchange is the per-query rank window on query_id over
    *    candidate pairs (|probed corpus| × probing queries), and top-k
    *    filters inside it.
    * `probes`: pass a materialized [[probeCellsBatch]] frame to pin/share
    * the float probe decision (the oracle contract); None computes it.
    * Returns (query_id, rank, neighbor_id, pq_d2_micro).
    */
  def ivfAdcKnnJoin(queries: DataFrame, encoded: DataFrame, embCol: String,
      queryIdCol: String, idCol: String, cellCol: String, codeCol: String,
      model: PqModel, k: Int, nprobe: Int,
      probes: Option[DataFrame] = None): DataFrame = {
    val mm = model
    val pr = probes.getOrElse(
      probeCellsBatch(encoded, queries, embCol, queryIdCol, cellCol, nprobe))
    // null-embedding query rows are dropped (can't be served), mirroring
    // encode(): the serving path must never crash on an unembeddable row
    val grid = udf { (v: Seq[Float]) =>
      if (v == null) None else Some(queryGrid(mm, v)) }
    val qGrids = queries.where(col(embCol).isNotNull)
      .select(col(queryIdCol).as("query_id"), grid(col(embCol)).as("__qt__"))
    val dist = udf { (qt: Seq[Seq[Long]], codes: Seq[Int]) =>
      var s = 0L
      var sub = 0
      while (sub < codes.length) { s += qt(sub)(codes(sub)); sub += 1 }
      s
    }
    val cand = encoded
      .where(col(codeCol).isNotNull) // unembeddable rows can't be served
      .select(col(cellCol).as("cell"), col(idCol).as("neighbor_id"),
        col(codeCol).as("__c__"))
      .join(broadcast(pr), Seq("cell"))
      .join(broadcast(qGrids), Seq("query_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("pq_d2_micro", dist(col("__qt__"), col("__c__")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("pq_d2_micro"), col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("pq_d2_micro"))
  }

  /** Batched ADC shortlist + EXACT re-rank — [[refineTopK]] for a query
    * batch, completing the serving family: [[ivfAdcKnnJoin]] nominates
    * `shortlist` candidates per query with cheap integer ADC, then ONLY
    * those Q·shortlist pairs pay the double-precision L2 against the
    * raw embeddings (both joins broadcast the bounded shortlist/query
    * side — the corpus is scanned once for the re-rank, never
    * shuffled; the only exchange is the per-query rank window). Recall
    * is set by `shortlist` and `nprobe`, final ordering by the exact
    * distance (ties on neighbor id). Returns (query_id, rank,
    * neighbor_id) — the exact d2 stays internal: its last-ulp value is
    * summation-order-dependent across engines while the RANKING is
    * stable (the `ann_bruteforce_topk` oracle precedent).
    */
  def ivfAdcRefineKnnJoin(queries: DataFrame, encoded: DataFrame,
      embCol: String, queryIdCol: String, idCol: String, cellCol: String,
      codeCol: String, model: PqModel, k: Int, shortlist: Int,
      nprobe: Int, probes: Option[DataFrame] = None): DataFrame = {
    val short = ivfAdcKnnJoin(queries, encoded, embCol, queryIdCol,
      idCol, cellCol, codeCol, model, shortlist, nprobe, probes)
      .select(col("query_id"), col("neighbor_id"))
    def dbl(c: Column) = transform(c, x => x.cast("double"))
    val cand = encoded
      .select(col(idCol).as("neighbor_id"), col(embCol).as("__ce__"))
      .join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(queries.select(col(queryIdCol).as("query_id"),
        col(embCol).as("__qe__"))), Seq("query_id"))
      .withColumn("__d2__", aggregate(
        zip_with(dbl(col("__ce__")), dbl(col("__qe__")),
          (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, v) => acc + v))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__d2__"), col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** ADC shortlist + EXACT re-rank — how PQ is actually served: the
    * cheap code scan nominates `shortlist` candidates, then only those
    * rows (broadcast semi-join of ≤ shortlist ids) pay the exact
    * double-precision L2 against the raw embedding. Returns (rank, id,
    * d2) over the top `k`. Recall is set by `shortlist`, exactness of
    * the final ordering by the re-rank.
    */
  def refineTopK(encoded: DataFrame, idCol: String, codeCol: String,
      embCol: String, query: Array[Float], model: PqModel, k: Int,
      shortlist: Int): DataFrame = {
    val short = adcTopK(encoded, idCol, codeCol, query, model, shortlist)
      .select(col(idCol))
    val qLit = typedLit(query.toSeq)
    val cand = encoded.join(broadcast(short), Seq(idCol), "left_semi")
      .withColumn("d2", aggregate(
        zip_with(col(embCol), qLit,
          (a, b) => (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double"))),
        lit(0.0), (acc, v) => acc + v))
      .orderBy(col("d2"), col(idCol))
      .limit(k)
    cand.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("d2"), col(idCol))))
      .select(col("rank"), col(idCol), col("d2"))
  }
}

/** Per-subspace codebooks: m × k × subDim doubles (k·D total). */
final case class PqModel(m: Int, k: Int, subDim: Int,
    codebooks: Array[Array[Array[Double]]]) extends Serializable
