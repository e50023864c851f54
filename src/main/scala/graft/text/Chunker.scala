package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-window document chunking — context-length preparation for
  * training: cut each document into `size`-char windows starting every
  * `stride` chars (stride < size ⇒ overlapping windows, the standard
  * sliding-window chunking for long-document training/retrieval).
  *
  * Scale shape: a per-row `transform` + `posexplode` — narrow and
  * shuffle-free, output partitioning inherits the scan's, the whole thing
  * stays in one whole-stage-codegen span and pipelines straight into the
  * next operator with no exchange. Chunk count per doc is
  * ceil(len/stride); empty documents emit no chunks (matching the SQL
  * `range(0, 0)` = empty unnest).
  */
object Chunker {

  /** Explode `df` into (idCols..., chunk_id: long, chunk: string). */
  def chunk(df: DataFrame, textCol: String, size: Int, stride: Int,
      idCols: Seq[Column]): DataFrame = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    val text = col(textCol)
    val len = length(text)
    // number of window starts i*stride < len, i.e. ceil(len/stride);
    // double divide on purpose — integer `/` truncates in Spark SQL
    val n = ceil(len.cast("double") / stride)
    val starts = when(len > 0, sequence(lit(0L), (n - 1).cast("long")))
      .otherwise(array().cast("array<long>"))
    val chunks = transform(starts,
      i => text.substr((i * stride + 1).cast("int"), lit(size)))
    df.select(idCols :+ posexplode(chunks).as(Seq("chunk_id", "chunk")): _*)
      .withColumn("chunk_id", col("chunk_id").cast("long"))
  }
}
