package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata. The decode step is a clearly-marked deterministic STUB (no
  * media libs in this container) — everything Spark-side is real: schema,
  * batched mapPartitions plumbing (the Scala analogue of `mapInPandas`:
  * process rows in fixed-size batches so a vectorized decoder amortizes
  * per-call overhead), partition sizing, and the explode shape for frame
  * sampling.
  */
object Multimodal {

  val MetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("codec", StringType)))

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
          val (w, h, c) = decodeStub(r.getAs[Array[Byte]](idx))
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
      val (w, h, c) = decodeStub(media)
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
