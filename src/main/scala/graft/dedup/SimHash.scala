package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SimHash near-deduplication (Charikar 2002 / Manku et al. WWW'07 shape):
  * 64-bit signature from word-feature bit votes; candidate pairs via the
  * pigeonhole band trick (hamming ≤ k ⇒ at least one of k+1 bands equal);
  * verification via `bit_count(xor)`; cluster → keep-first.
  *
  * Dataflow at scale: narrow signature map → IDENTICAL signatures collapse
  * to one representative first (hamming 0 — star edges via a streaming
  * window, which removes the all-zero-signature hot key from the band
  * join) → explode k+1 small band keys over the distinct signatures →
  * shuffle on (band, chunk) → self-join inside buckets (bounded by
  * distinct-signature bucket size) → edge list → min-label clustering
  * through [[MinHashDedup.keepFirst]] (driver UnionFind small, distributed
  * min-label propagation beyond `maxDriverEdges`).
  */
object SimHash {

  /** FNV-1a 64-bit — public-domain hash, stable across JVMs. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit simhash over lowercase `\w+` word features. */
  def simhash64(text: String): Long = {
    if (text == null) return 0L
    val votes = new Array[Int](64)
    val m = java.util.regex.Pattern.compile("[a-z0-9_]+")
      .matcher(text.toLowerCase)
    while (m.find()) {
      val h = fnv1a64(m.group())
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  private val simhashUdf = udf { (s: String) => simhash64(s) }

  def signature(c: Column): Column = simhashUdf(c)

  /** Near-dedup rows whose signatures are within `maxHamming` bits,
    * keeping each cluster's first row (min id in row order). Components
    * are unchanged by the identical-signature collapse: ham(a, b) depends
    * only on the signatures, so any ≤k pair is represented by its
    * representatives' edge plus the hamming-0 star edges.
    */
  def deduplicate(df: DataFrame, column: String,
      maxHamming: Int = 3,
      maxDriverEdges: Long = 10_000_000L,
      orderCol: Option[String] = None): DataFrame = {
    val withId = MinHashDedup.assignId(df, orderCol)
    MinHashDedup.keepFirst(withId,
      verifiedEdges(withId, column, maxHamming), maxDriverEdges)
  }

  /** The verified edge list feeding the clustering: hamming-0 star edges
    * plus band-join pairs checked at ≤ `maxHamming` bits. Exposed for the
    * keep-first invariant specs — the component-min of exactly these edges
    * IS the kept set.
    *
    * `sigSink`: when given, the (id, sig) frame is written there
    * (overwrite) and the rest of the dataflow runs off the read-back — the
    * correctness oracle's input is then the 64-bit signatures alone, and
    * DuckDB re-derives banding (shift+mask chunks), the hamming-≤k verify
    * (`bit_count(xor(...))`) and the clustering all by itself
    * (QueriesExtra2.simhashKeepFirstSql).
    */
  private[graft] def verifiedEdges(withId: DataFrame, column: String,
      maxHamming: Int, sigSink: Option[String] = None): DataFrame =
    verifiedEdgesFromSigs(SideChannel.through(
      withId.select(col(MinHashDedup.IdCol).as("id"),
        signature(col(column)).as("sig")),
      sigSink), maxHamming)

  /** The pigeonhole machinery over ANY 64-bit signature frame (id, sig)
    * — shared by text simhash and the image dHash
    * ([[graft.multimodal.ImageHash]]): hamming-0 window collapse,
    * (maxHamming+1)-way bit-sliced banding, bucket self-join,
    * `bit_count(xor) <= k` verify. NULL signatures (undecodable
    * payloads) produce no edges — those rows always survive, they are
    * never silently clustered together.
    */
  private[graft] def verifiedEdgesFromSigs(sigsRaw: DataFrame,
      maxHamming: Int): DataFrame = {
    val bands = maxHamming + 1
    val width = 64 / bands
    val sigs = sigsRaw.where(col("sig").isNotNull)
    // hamming-0 collapse: one streaming window, star edges to the first
    // row of each identical-signature class
    val wSig = Window.partitionBy("sig")
    val withMin = sigs.withColumn("__smin__", min(col("id")).over(wSig))
    val identEdges = withMin.where(col("id") =!= col("__smin__"))
      .select(col("id").as("__x__"), col("__smin__").as("__y__"))
    val reps = withMin.where(col("id") === col("__smin__"))
      .select("id", "sig")
    val banded = reps.select(col("id"), col("sig"),
      explode(array((0 until bands).map(lit): _*)).as("band"))
      .withColumn("chunk",
        expr(s"shiftrightunsigned(sig, band * $width)")
          .bitwiseAND(lit(chunkMask(width))))
    val pairs = banded.as("a")
      .join(banded.as("b"), Seq("band", "chunk"))
      .where(col("a.id") < col("b.id"))
      .where(bit_count(col("a.sig").bitwiseXOR(col("b.sig"))) <= maxHamming)
      .select(col("b.id").as("__x__"), col("a.id").as("__y__"))
    // ALL verified pairs feed the clustering (union-find and the
    // distributed min-label path both absorb multi-edges/duplicates):
    // a per-node min-reduction here would drop cross-links (A-C, B-C with
    // A<B<C keeps only C→A) and over-keep vs transitive clustering —
    // and it cost an extra shuffle (ADVICE r3)
    pairs.union(identEdges)
  }

  /** Near-dedup rows by ANY 64-bit signature of a payload column — the
    * ONE body behind the image/audio/video perceptual dedups
    * ([[graft.multimodal.ImageHash.deduplicateByDHash]] and siblings):
    * signature column, shared pigeonhole edges, shared keepFirst
    * crossover; null signatures (undecodable payloads) always survive.
    * `sigSink` exports the (id, sig) frame for the SQL oracle.
    */
  def deduplicateBySig(df: DataFrame, column: String,
      sigOf: Column => Column,
      maxHamming: Int = 3,
      maxDriverEdges: Long = 10_000_000L,
      orderCol: Option[String] = None,
      sigSink: Option[String] = None): DataFrame = {
    val withId = MinHashDedup.assignId(df, orderCol)
    val sigs = SideChannel.through(
      withId.select(col(MinHashDedup.IdCol).as("id"),
        sigOf(col(column)).as("sig")),
      sigSink)
    MinHashDedup.keepFirst(withId,
      verifiedEdgesFromSigs(sigs, maxHamming), maxDriverEdges)
  }

  // ------------------------------------------------------------------
  // Persisted SIGNATURE store — the hamming family's twin of
  // MinHashDedup's banded store (VERDICT r9 #1 / r10 #5 architecture
  // extended across every 64-bit-signature dedup: text simhash, image
  // dHash, audio eHash). A nightly pipeline persists ONE (sig, id =
  // min retained id) row per DISTINCT retained signature; an increment
  // then dedups at |delta| cost — signatures computed for the increment
  // only, cross edges via the pigeonhole band join against the store.
  //
  // Keeping only the min id per signature is lossless for increment
  // fate by the bucket-min argument: a new row dies iff its cluster
  // holds ANY retained id, and linking it to the signature's min-id
  // representative produces the same clusters over new rows as linking
  // to every member (retained-internal edges only merge clusters that
  // each already contain a retained id). Min-per-sig is associative, so
  // stores MERGE by one bounded groupBy — survivors fold in nightly.
  // ------------------------------------------------------------------

  /** The signature store of a retained corpus: (sig, id) with one row
    * per distinct non-null signature. `sigOf` picks the family (text
    * [[signature]], [[graft.multimodal.ImageHash.dhashUdf]],
    * [[graft.multimodal.AudioHash.ehashUdf]]); undecodable rows (null
    * sig) never enter the store — they were kept, but nothing can be a
    * near-dup of them. `orderCol` (data-derived unique Long) makes
    * store ids deterministic; ids must stay below the increment's
    * offset. Publish the exploded band frame bucketed on (band, chunk)
    * at cluster scale — the layout [[MinHashDedup.exportBandedStore]]
    * uses for the minhash family.
    */
  def sigStore(refDf: DataFrame, column: String,
      sigOf: Column => Column = signature,
      orderCol: Option[String] = None): DataFrame =
    refDf.withColumn(MinHashDedup.IdCol, MinHashDedup.idExpr(orderCol))
      .select(col(MinHashDedup.IdCol).as("id"),
        sigOf(col(column)).as("sig"))
      .where(col("sig").isNotNull)
      .groupBy("sig").agg(min(col("id")).as("id"))

  /** Fold one signature store into another: min-per-sig of the union —
    * ≤ |distinct sigs| rows shuffle, associative, order-free.
    */
  def mergeSigStores(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("sig").agg(min(col("id")).as("id"))

  /** Explode a (…, sig, …) frame into its k+1 pigeonhole (band, chunk)
    * rows — the join layout of both store sides and the increment.
    */
  private[graft] def bandSig(df: DataFrame, maxHamming: Int): DataFrame = {
    val bands = maxHamming + 1
    val width = 64 / bands
    df.withColumn("band", explode(array((0 until bands).map(lit): _*)))
      .withColumn("chunk",
        expr(s"shiftrightunsigned(sig, band * $width)")
          .bitwiseAND(lit(chunkMask(width))))
  }

  /** The low-`width` bitmask. `(1L << 64) - 1` is NOT it: JVM long
    * shifts mask the distance mod 64, so at maxHamming = 0 (one 64-bit
    * band — legal exact-signature dedup) the naive mask is 0, every
    * chunk collapses to 0, and the band join degenerates into a full
    * cross join of all distinct signatures.
    */
  private def chunkMask(width: Int): Long =
    if (width >= 64) -1L else (1L << width) - 1

  /** The PUBLISHED layout of a signature store at cluster scale:
    * [[sigStore]] exploded to (band, chunk, sig, id) — write it through
    * `Sources.publishBucketedBy(…, Seq("band", "chunk"), n)` and the
    * nightly cross join reads the store pre-partitioned with NO
    * store-side exchange (the [[MinHashDedup.exportBandedStore]]
    * contract for the hamming family; `maxHamming` is baked into the
    * layout — republish to change it).
    */
  def bandedSigStore(store: DataFrame, maxHamming: Int = 3): DataFrame =
    bandSig(store, maxHamming)

  /** Increment → store cross edges: both sides banded into the k+1
    * pigeonhole chunks, joined on (band, chunk), verified at
    * `bit_count(xor) ≤ maxHamming`, each hit linking the increment row
    * to the retained representative. Hamming-0 (exact sig match) is
    * covered — equal signatures share every band.
    */
  private[graft] def storeCrossEdges(incSigs: DataFrame, store: DataFrame,
      maxHamming: Int): DataFrame =
    crossEdgesPreBanded(incSigs,
      bandSig(store.withColumnRenamed("id", "__sid__"), maxHamming)
        .withColumnRenamed("sig", "ssig"),
      maxHamming)

  private[graft] def crossEdgesPreBanded(incSigs: DataFrame,
      bandedStore: DataFrame, maxHamming: Int): DataFrame = {
    val inc = bandSig(incSigs.where(col("sig").isNotNull), maxHamming)
    inc.join(bandedStore, Seq("band", "chunk"))
      .where(bit_count(col("sig").bitwiseXOR(col("ssig"))) <= maxHamming)
      .select(col("id").as("__x__"), col("__sid__").as("__y__"))
      .distinct()
  }

  /** Incremental hamming-family near-dedup at |delta| cost — the
    * [[MinHashDedup.deduplicateAgainstStore]] contract for signature
    * stores: drop `newDf` rows within `maxHamming` bits of anything
    * retained (via the persisted store) or of earlier `newDf` rows;
    * return the surviving `newDf` rows. Store ids must be <
    * `newIdOffset`; `orderCol` unique non-null Longs. Null-signature
    * rows always survive. EAGER: survivors localCheckpointed, internal
    * caches released (the per-batch nightly caller must not accumulate
    * cached frames). `sigSink` exports the increment's (id, sig) frame
    * for the SQL oracle.
    */
  def deduplicateAgainstSigStore(newDf: DataFrame, store: DataFrame,
      column: String,
      sigOf: Column => Column = signature,
      maxHamming: Int = 3,
      maxDriverEdges: Long = 10_000_000L,
      orderCol: Option[String] = None,
      newIdOffset: Long = MinHashDedup.NewIdOffset,
      sigSink: Option[String] = None): DataFrame =
    dedupAgainstStoreImpl(newDf, column, sigOf, maxHamming,
      maxDriverEdges, orderCol, newIdOffset, sigSink)(
      sigs => storeCrossEdges(sigs, store, maxHamming))

  /** [[deduplicateAgainstSigStore]] against a PUBLISHED
    * [[bandedSigStore]] (read back from its bucketed table): the store
    * arrives pre-exploded on (band, chunk), so the cross join pays no
    * store-side shuffle — the nightly 100 TB shape. The banded frame's
    * layout fixes `maxHamming`.
    */
  def deduplicateAgainstBandedSigStore(newDf: DataFrame,
      bandedStore: DataFrame, column: String,
      sigOf: Column => Column = signature,
      maxHamming: Int = 3,
      maxDriverEdges: Long = 10_000_000L,
      orderCol: Option[String] = None,
      newIdOffset: Long = MinHashDedup.NewIdOffset,
      sigSink: Option[String] = None): DataFrame =
    dedupAgainstStoreImpl(newDf, column, sigOf, maxHamming,
      maxDriverEdges, orderCol, newIdOffset, sigSink)(
      sigs => crossEdgesPreBanded(sigs,
        bandedStore.withColumnRenamed("id", "__sid__")
          .withColumnRenamed("sig", "ssig"), maxHamming))

  private def dedupAgainstStoreImpl(newDf: DataFrame, column: String,
      sigOf: Column => Column, maxHamming: Int, maxDriverEdges: Long,
      orderCol: Option[String], newIdOffset: Long,
      sigSink: Option[String])(
      crossOf: DataFrame => DataFrame): DataFrame = {
    val withId = newDf.withColumn(MinHashDedup.IdCol,
      MinHashDedup.idExpr(orderCol) + lit(newIdOffset)).persist()
    val sigs = SideChannel.through(
      withId.select(col(MinHashDedup.IdCol).as("id"),
        sigOf(col(column)).as("sig")),
      sigSink)
    val edges = verifiedEdgesFromSigs(sigs, maxHamming)
      .union(crossOf(sigs))
    val out = MinHashDedup.keepFirst(withId, edges, maxDriverEdges)
      .localCheckpoint(true)
    withId.unpersist()
    out
  }

  /** Recompute-path incremental dedup (the spec twin of
    * [[deduplicateAgainstSigStore]], mirroring
    * [[MinHashDedup.deduplicateAgainst]]): signatures for ref ∪ new
    * every call — correct at any scale but |corpus|-cost per run; use
    * the store for nightly pipelines.
    */
  def deduplicateAgainst(newDf: DataFrame, refDf: DataFrame,
      column: String,
      sigOf: Column => Column = signature,
      maxHamming: Int = 3,
      maxDriverEdges: Long = 10_000_000L): DataFrame = {
    val mark = "__graft_sim_new__"
    val ord = "__graft_sim_order__"
    val cols = newDf.columns
    val tagged = refDf.selectExpr(cols.map(c => s"`$c`").toIndexedSeq: _*)
      .withColumn(mark, lit(false))
      .withColumn(ord, monotonically_increasing_id())
      .unionByName(newDf.withColumn(mark, lit(true))
        .withColumn(ord, monotonically_increasing_id() + lit(1L << 62)))
    val withId = MinHashDedup.assignId(tagged, Some(ord))
    val sigs = withId.select(col(MinHashDedup.IdCol).as("id"),
      sigOf(col(column)).as("sig"))
    MinHashDedup.keepFirst(withId,
        verifiedEdgesFromSigs(sigs, maxHamming), maxDriverEdges)
      .where(col(mark)).drop(mark, ord)
  }
}
