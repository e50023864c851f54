package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata. Header decode is REAL for the container formats whose
  * dimensions live in fixed header fields — PNG (IHDR), JPEG (SOFn
  * segment scan), GIF (logical screen descriptor) — parsed straight off
  * the bytes with no media library. Payloads that match no magic fall
  * back to a clearly-marked deterministic stub (full-frame pixel decode
  * needs codec libs this container doesn't ship). Everything Spark-side
  * is real either way: schema, batched mapPartitions plumbing (the Scala
  * analogue of `mapInPandas`: process rows in fixed-size batches so a
  * vectorized decoder amortizes per-call overhead), partition sizing, and
  * the explode shape for frame sampling.
  */
object Multimodal {

  val MetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("codec", StringType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** PNG: 8-byte signature, then the IHDR chunk (must be first):
    * length(4) "IHDR" width(4 BE) height(4 BE).
    */
  private[multimodal] def decodePng(b: Array[Byte]): Option[(Int, Int, String)] = {
    if (b.length < 24) return None
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) { if (u8(b, i) != (sig(i) & 0xff)) return None; i += 1 }
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return None
    Some((be32(b, 16), be32(b, 20), "png"))
  }

  /** JPEG: FFD8, then marker segments FF xx len(2 BE, includes itself);
    * dimensions live in the first SOFn (C0-CF except C4/C8/CC):
    * precision(1) height(2 BE) width(2 BE).
    */
  private[multimodal] def decodeJpeg(b: Array[Byte]): Option[(Int, Int, String)] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None // desynced — not a marker
      var m = u8(b, i + 1)
      while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) } // fill bytes
      if (m == 0xd9 || m == 0xda) return None // EOI/SOS before any SOF
      val len = be16(b, i + 2)
      if (len < 2) return None
      val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
      if (isSof) {
        if (i + 9 >= b.length) return None
        return Some((be16(b, i + 7), be16(b, i + 5), "jpeg"))
      }
      i += 2 + len
    }
    None
  }

  /** GIF87a/GIF89a: logical screen width/height, 2 bytes each, LE. */
  private[multimodal] def decodeGif(b: Array[Byte]): Option[(Int, Int, String)] = {
    if (b.length < 10) return None
    val h = new String(b, 0, 6, "US-ASCII")
    if (h != "GIF87a" && h != "GIF89a") return None
    Some((le16(b, 6), le16(b, 8), "gif"))
  }

  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  val AudioMetaType: StructType = StructType(Seq(
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType)))

  /** RIFF/WAVE: "RIFF" size "WAVE", then word-aligned chunks of
    * id(4) size(4 LE) payload. The "fmt " chunk carries
    * format(2) channels(2) sampleRate(4) byteRate(4) blockAlign(2)
    * bits(2), all LE; duration derives from the "data" chunk's DECLARED
    * size over byteRate (truncated payloads still report correctly —
    * only the header bytes are read). Chunk order is not assumed: real
    * encoders emit LIST/fact chunks before data, so the walk skips
    * unknown chunks by their declared size.
    */
  def decodeWav(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (b.length < 36) return None
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F') return None
    if (b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var fmt: Option[(Int, Int, Int, Long)] = None // ch, rate, bits, byteRate
    var dataSize = -1L
    // LONG cursor: a hostile declared size near 2^32 could wrap an Int
    // cursor back into bounds (or wrap the `i + 8` comparison) and read
    // out of bounds — with Long arithmetic the loop condition simply
    // fails and the walk stops, keeping whatever fmt/data were seen.
    // sz >= 0 always (4-byte LE), so the cursor strictly advances.
    var i = 12L
    while (i + 8 <= b.length && (fmt.isEmpty || dataSize < 0)) {
      val ii = i.toInt // in-bounds: i + 8 <= b.length <= Int.MaxValue
      val id = new String(b, ii, 4, "US-ASCII")
      val sz = le32(b, ii + 4)
      if (id == "fmt " && sz >= 16 && i + 8 + 16 <= b.length)
        fmt = Some((le16(b, ii + 10), le32(b, ii + 12).toInt,
          le16(b, ii + 22), le32(b, ii + 16)))
      else if (id == "data") dataSize = sz
      i += 8L + sz + (sz & 1L) // chunks are word-aligned
    }
    fmt.collect { case (ch, rate, bits, byteRate)
        if dataSize >= 0 && byteRate > 0 =>
      (ch, rate, bits, dataSize * 1000L / byteRate)
    }
  }

  /** Audio header decode as a scalar UDF: real WAV parsing, null meta
    * for non-audio payloads (no stub here — audio metadata has no
    * meaningful fake, and a null struct lets the pipeline filter
    * undecodable media declaratively).
    */
  val audioMetaUdf: Column => Column = {
    val u = udf { (media: Array[Byte]) =>
      if (media == null) None
      else decodeWav(media).map { case (ch, rate, bits, ms) =>
        (ch, rate, bits, ms, "wav")
      }
    }
    c => u(c).cast(AudioMetaType)
  }

  /** STUB decoder — deterministic fake metadata derived from the payload
    * (swap for a real image/audio decoder: the call site contract —
    * bytes in, typed meta out, batched — is what a real codec needs).
    */
  def decodeStub(media: Array[Byte]): (Int, Int, String) = {
    val len = if (media == null) 0 else media.length
    val first = if (len == 0) 0 else media(0) & 0xff
    val codec = (first % 3) match {
      case 0 => "jpeg"
      case 1 => "png"
      case _ => "webp"
    }
    ((len % 640) + 16, ((len / 3) % 480) + 16, codec)
  }

  /** Real header decode with stub fallback for unrecognized payloads. */
  def decodeBytes(media: Array[Byte]): (Int, Int, String) = {
    if (media == null || media.length == 0) return decodeStub(media)
    decodePng(media)
      .orElse(decodeJpeg(media))
      .orElse(decodeGif(media))
      .getOrElse(decodeStub(media))
  }

  /** Decode metadata for a binary column via BATCHED mapPartitions — the
    * batch (default 1024 rows) is the unit a vectorized decoder would
    * process at once; output schema = input ++ meta struct.
    */
  def decodeMeta(df: DataFrame, binCol: String,
      batchSize: Int = 1024): DataFrame = {
    val schema = df.schema.add("meta", MetaType)
    val idx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder gets the whole batch (GPU/SIMD amortization)
        batch.iterator.map { r =>
          val (w, h, c) = decodeBytes(r.getAs[Array[Byte]](idx))
          Row.fromSeq(r.toSeq :+ Row(w, h, c))
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Same decode expressed as a scalar UDF — stays inside codegen/AQE and
    * is the preferred shape when the decoder is cheap per row.
    */
  val decodeMetaUdf: Column => Column = {
    val u = udf { (media: Array[Byte]) =>
      val (w, h, c) = decodeBytes(media)
      (w, h, c)
    }
    c => u(c).cast(MetaType)
  }

  /** "Resize": pure metadata transform (the bytes stay opaque). */
  def resizeMeta(meta: Column, maxDim: Int): Column = {
    val w = meta.getField("width")
    val h = meta.getField("height")
    val scale = lit(maxDim).cast("double") / greatest(w, h)
    struct(
      when(greatest(w, h) <= maxDim, w)
        .otherwise(floor(w * scale).cast("int")).as("width"),
      when(greatest(w, h) <= maxDim, h)
        .otherwise(floor(h * scale).cast("int")).as("height"),
      meta.getField("codec").as("codec"))
  }

  /** Frame sampling for video-ish payloads: one row per sampled frame
    * offset (explode of a `sequence`) — the fan-out shape a frame
    * extractor plugs into.
    */
  def frameSample(df: DataFrame, binCol: String,
      everyN: Int = 10): DataFrame = {
    val duration = (octet_length(col(binCol)) % 120).cast("int")
    df.withColumn("frame_offset",
      explode(sequence(lit(0), duration, lit(everyN))))
  }
}
