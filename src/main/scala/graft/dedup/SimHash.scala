package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-deduplication (Charikar 2002 / Manku et al. WWW'07 shape):
  * 64-bit signature from word-feature bit votes; candidate pairs via the
  * pigeonhole band trick (hamming ≤ k ⇒ at least one of k+1 bands equal);
  * verification via `bit_count(xor)`; cluster → keep-first.
  *
  * Dataflow at scale: narrow signature map → explode k+1 small band keys →
  * shuffle on (band, chunk) → self-join inside buckets (bounded by bucket
  * size) → edge list → min-label clustering. No driver state needed except
  * the final root map (swap for ConnectedComponents.distributed beyond
  * ~10^7 edges).
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
    * keeping each cluster's first row (min id in row order).
    */
  def deduplicate(df: DataFrame, column: String,
      maxHamming: Int = 3): DataFrame = {
    val bands = maxHamming + 1
    val width = 64 / bands
    val withId = df
      .withColumn(MinHashDedup.IdCol, monotonically_increasing_id())
      .persist()
    val sigs = withId.select(col(MinHashDedup.IdCol).as("id"),
      signature(col(column)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      explode(array((0 until bands).map(lit): _*)).as("band"))
      .withColumn("chunk",
        expr(s"shiftrightunsigned(sig, band * $width)")
          .bitwiseAND(lit((1L << width) - 1)))
    val pairs = banded.as("a")
      .join(banded.as("b"), Seq("band", "chunk"))
      .where(col("a.id") < col("b.id"))
      .where(bit_count(col("a.sig").bitwiseXOR(col("b.sig"))) <= maxHamming)
      .select(col("b.id").as("x"), col("a.id").as("y"))
      .groupBy("x").agg(min("y").as("y"))
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val roots = ConnectedComponents.unionFindRoots(edges)
    val bRoots = df.sparkSession.sparkContext.broadcast(roots)
    val keepUdf = udf { (id: Long) => bRoots.value.getOrElse(id, id) == id }
    withId.where(keepUdf(col(MinHashDedup.IdCol))).drop(MinHashDedup.IdCol)
  }
}
