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

  private def be32u(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong
  private def be64(b: Array[Byte], i: Int): Long =
    (be32u(b, i) << 32) | be32u(b, i + 4)

  val VideoMetaType: StructType = StructType(Seq(
    StructField("brand", StringType),
    StructField("duration_ms", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("codec", StringType)))

  /** MP4 / ISO-BMFF (ISO 14496-12): the file is a flat sequence of boxes
    * `size(4 BE) type(4)` — size 1 means a 64-bit largesize follows, size
    * 0 means "to end of enclosing space". Reads `ftyp`'s major brand,
    * `moov/mvhd`'s timescale+duration (version 0 and 1 layouts differ),
    * and the first VIDEO `moov/trak/tkhd`'s 16.16-fixed width/height
    * (audio tracks carry width 0 and are skipped). Box order is not
    * assumed. Long cursors + bounds checks mean a hostile declared size
    * stops the walk instead of wrapping or looping; duration is clamped
    * before the ms conversion so a hostile 64-bit value cannot overflow.
    */
  def decodeMp4(b: Array[Byte]): Option[(String, Long, Int, Int)] = {
    if (b.length < 16) return None
    var brand: Option[String] = None
    var durationMs = -1L
    var width = 0
    var height = 0
    // walk boxes in [start, end); f(type, payloadStart, boxEnd)
    def walk(start: Long, end: Long)(f: (String, Long, Long) => Unit): Unit = {
      var i = start
      var ok = true
      while (ok && i + 8 <= end) {
        val ii = i.toInt // in-bounds: i + 8 <= end <= Int.MaxValue
        var sz: Long = be32u(b, ii)
        var payload = i + 8
        val typ = new String(b, ii + 4, 4, "US-ASCII")
        if (sz == 1L) { // largesize
          if (i + 16 > end) return
          sz = be64(b, ii + 8); payload = i + 16
        } else if (sz == 0L) sz = end - i // box extends to the end
        // hostile sizes (negative 64-bit, smaller than the box's own
        // header, or past the buffer) end the walk, keeping what's seen
        if (sz < payload - i || sz > end - i) ok = false
        else { f(typ, payload, i + sz); i += sz }
      }
    }
    walk(0L, b.length.toLong) {
      case ("ftyp", p, e) if p + 4 <= e =>
        brand = Some(new String(b, p.toInt, 4, "US-ASCII"))
      case ("moov", mp, me) => walk(mp, me) {
        case ("mvhd", p, e) =>
          val v = u8(b, p.toInt)
          // v0: vflags(4) ctime(4) mtime(4) timescale(4) duration(4)
          // v1: vflags(4) ctime(8) mtime(8) timescale(4) duration(8)
          val tsDur =
            if (v == 0 && p + 20 <= e)
              Some((be32u(b, p.toInt + 12), be32u(b, p.toInt + 16)))
            else if (v == 1 && p + 32 <= e)
              Some((be32u(b, p.toInt + 20), be64(b, p.toInt + 24)))
            else None
          tsDur.foreach { case (ts, d) =>
            if (ts > 0 && d >= 0)
              durationMs =
                if (d <= Long.MaxValue / 1000L) d * 1000L / ts
                else d / ts * 1000L
          }
        case ("trak", tp, te) if width == 0 => walk(tp, te) {
          // width/height are 16.16 fixed point; integer part only.
          // v0 payload: ...duration(4)... → width @ 76; v1: @ 88
          case ("tkhd", p, e) if width == 0 =>
            val v = u8(b, p.toInt)
            val off = if (v == 0) 76 else 88
            if (p + off + 8 <= e) {
              val w = (be32u(b, p.toInt + off) >> 16).toInt
              val h = (be32u(b, p.toInt + off + 4) >> 16).toInt
              if (w > 0) { width = w; height = h }
            }
          case _ =>
        }
        case _ =>
      }
      case _ =>
    }
    brand.collect { case br if durationMs >= 0 =>
      (br, durationMs, width, height)
    }
  }

  /** Video header decode as a scalar UDF — null struct for non-MP4
    * payloads, same contract as [[audioMetaUdf]].
    */
  val videoMetaUdf: Column => Column = {
    val u = udf { (media: Array[Byte]) =>
      if (media == null) None
      else decodeMp4(media).map { case (br, ms, w, h) =>
        (br, ms, w, h, "mp4")
      }
    }
    c => u(c).cast(VideoMetaType)
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
