package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ArrowDataset, Sources}

/** S4 `save_to_disk`/`load_from_disk` interop (preprocessor.py:68,72).
  *
  * Ground truth: `graft/hf_fixture` was written by REAL pyarrow
  * (`tools/make_arrow_fixture.py`) in the HF `save_to_disk` layout —
  * stream-format IPC shards + state.json + dataset_info.json — so the
  * reader tests here pin compatibility against the Arrow implementation
  * the reference ecosystem writes with, not against our own writer.
  * The expected values below mirror the generator verbatim; change them
  * together.
  */
class ArrowDatasetSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def resourceDir(name: String): String = {
    val url = getClass.getClassLoader.getResource(name)
    require(url != null, s"missing test resource $name")
    new java.io.File(url.toURI).getPath
  }

  private val MsgSchema = StructType(Seq(
    StructField("content", StringType),
    StructField("do_train", BooleanType),
    StructField("role", StringType)))

  // -------------------------------------------------------------------
  // reader vs pyarrow ground truth
  // -------------------------------------------------------------------

  test("reads a pyarrow-written HF save_to_disk directory exactly") {
    val df = ArrowDataset.load(spark,
      resourceDir("graft/hf_fixture"))

    assert(df.schema === StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("score", DoubleType),
      StructField("flag", BooleanType),
      StructField("payload", BinaryType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("conversation", ArrayType(MsgSchema)),
      StructField("label", IntegerType))))

    val rows = df.orderBy("doc_id").collect()
    assert(rows.length === 5)

    val r1 = rows(0)
    assert(r1.getLong(0) === 1L)
    assert(r1.getString(1) === "hello world")
    assert(r1.getDouble(2) === 1.5)
    assert(r1.getBoolean(3) === true)
    assert(r1.getAs[Array[Byte]](4).toSeq === Seq(0x00, 0x01, 0xff)
      .map(_.toByte))
    assert(r1.getSeq[Float](5) === Seq(1.0f, 2.5f))
    assert(r1.getSeq[Row](6) === Seq(Row("hi", false, "User")))
    assert(r1.getInt(7) === 7)

    val r2 = rows(1)
    assert(r2.getString(1) === "café — naïve 😀")
    assert(r2.getDouble(2) === -0.25)
    assert(r2.getAs[Array[Byte]](4).length === 0)
    assert(r2.getSeq[Float](5) === Seq.empty)
    assert(r2.getSeq[Row](6) === Seq(Row("ok", true, "Assistant"),
      Row(null, null, null)))
    assert(r2.isNullAt(7))

    val r3 = rows(2)
    assert(r3.getLong(0) === 3L)
    assert((1 to 6).forall(r3.isNullAt))
    assert(r3.getInt(7) === -1)

    val r4 = rows(3) // second batch of shard 0
    assert(r4.getString(1) === "tab\there\nnewline")
    assert(r4.getSeq[Float](5) === Seq(3.0f))
    assert(r4.getSeq[Row](6) === Seq.empty)

    val r5 = rows(4) // shard 1
    assert(r5.getString(1) === "last shard")
    assert(r5.getDouble(2) === 9007199254740992.0) // 2^53 exact
    assert(r5.isNullAt(4))
    assert(r5.getSeq[Float](5) === Seq(-1.5f, 0.0f, 9.75f))
    assert(r5.isNullAt(6))
    assert(r5.getInt(7) === Int.MaxValue)
  }

  test("sniffs and reads the FILE-format (.arrow magic) variant") {
    val df = ArrowDataset.load(spark,
      resourceDir("graft/hf_fixture_file"))
    val rows = df.orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows(0).getString(1) === "hello world")
    assert(rows(1).getSeq[Row](6).last === Row(null, null, null))
  }

  // -------------------------------------------------------------------
  // writer round-trips
  // -------------------------------------------------------------------

  test("round-trips the full supported type lattice through save/load") {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType),
      StructField("d", DoubleType),
      StructField("f", FloatType),
      StructField("i", IntegerType),
      StructField("b", BooleanType),
      StructField("bin", BinaryType),
      StructField("emb", ArrayType(FloatType)),
      StructField("conv", ArrayType(MsgSchema)),
      StructField("nested", ArrayType(ArrayType(LongType)))))
    val data = Seq(
      Row(1L, "plain", 1.25, 2.5f, 42, true, Array[Byte](1, 2),
        Seq(0.5f), Seq(Row("a", true, "User")), Seq(Seq(1L, 2L), Seq())),
      Row(2L, "ümläut 🤖", null, null, null, null,
        null, Seq.empty[Float], Seq(Row(null, null, null)), null),
      Row(3L, null, -0.0, Float.MinPositiveValue, Int.MinValue, false,
        Array.empty[Byte], null, null, Seq(Seq())))
    val df = spark.createDataFrame(data.asJava, schema).repartition(2)

    val out = "/tmp/graft_arrow_spec_lattice"
    ArrowDataset.save(df, out, batchRows = 2)
    val re = ArrowDataset.load(spark, out)
    assert(re.schema === schema.copy(fields = schema.fields.map(
      _.copy(nullable = true))) || re.schema === schema)

    val got = re.orderBy("id").collect()
    val want = data.sortBy(_.getLong(0))
    got.zip(want).foreach { case (g, w) =>
      (0 until schema.length).foreach { c =>
        (g.get(c), w.get(c)) match {
          case (a: Array[Byte], b: Array[Byte]) =>
            assert(a.toSeq === b.toSeq, s"col $c")
          case (a, b) => assert(a === b, s"col $c of id ${w.get(0)}")
        }
      }
    }
  }

  test("round-trips documents.parquet bit-exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = "/tmp/graft_arrow_spec_docs"
    ArrowDataset.save(docs.repartition(3), out)
    val re = ArrowDataset.load(spark, out)
    assert(re.count() === docs.count())
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = re.orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("save writes the HF sidecar layout; empty partitions still shard") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      Seq(Row(1L, "x"), Row(2L, "y")).asJava,
      StructType(Seq(StructField("id", LongType),
        StructField("t", StringType))))
      .repartition(4) // > row count: at least two shards are empty
    val out = "/tmp/graft_arrow_spec_layout"
    ArrowDataset.save(df, out)

    val files = new java.io.File(out).listFiles().map(_.getName).sorted
    assert(files.count(_.endsWith(".arrow")) === 4)
    assert(files.contains("state.json"))
    assert(files.contains("dataset_info.json"))
    assert(files.filter(_.endsWith(".arrow"))
      .forall(_.matches("data-\\d{5}-of-00004\\.arrow")))

    val state = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/state.json")), "UTF-8")
    assert(state.contains("\"_data_files\""))
    assert(state.contains("data-00000-of-00004.arrow"))
    assert(state.contains("\"_fingerprint\""))
    val info = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/dataset_info.json")), "UTF-8")
    assert(info.contains(
      "\"t\": {\"dtype\": \"string\", \"_type\": \"Value\"}"))

    // all four shards (incl. empty ones) read back; rows survive
    val re = ArrowDataset.load(spark, out)
    assert(re.orderBy("id").collect().map(_.getString(1)).toSeq
      === Seq("x", "y"))
  }

  test("column-pruned load keeps requested order and skips conversion") {
    val df = ArrowDataset.load(spark, resourceDir("graft/hf_fixture"),
      columns = Seq("text", "doc_id"))
    assert(df.schema.fieldNames.toSeq === Seq("text", "doc_id"))
    val rows = df.orderBy("doc_id").collect()
    assert(rows.length === 5)
    assert(rows(0).getString(0) === "hello world")
    val e = intercept[IllegalArgumentException] {
      ArrowDataset.load(spark, resourceDir("graft/hf_fixture"),
        columns = Seq("nope"))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("many small record batches stream through one shard") {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("t", StringType)))
    val data = (0L until 10L).map(i => Row(i, s"row$i"))
    val df = spark.createDataFrame(data.asJava, schema).coalesce(1)
    val out = "/tmp/graft_arrow_spec_batches"
    ArrowDataset.save(df, out, batchRows = 1) // 10 one-row batches
    val re = ArrowDataset.load(spark, out)
    assert(re.orderBy("id").collect().map(_.getString(1)).toSeq
      === (0 until 10).map(i => s"row$i"))
    assert(re.limit(3).count() === 3) // early termination path
  }

  test("dataset_info features: list<struct> uses the [feature] form") {
    import scala.jdk.CollectionConverters._
    // HF's Sequence(dict) TRANSPOSES to dict-of-lists; the faithful
    // Features form for conversation-shaped columns is a json LIST
    val schema = StructType(Seq(
      StructField("conversation", ArrayType(MsgSchema)),
      StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      Seq(Row(Seq(Row("hi", true, "User")), Seq(1.0f))).asJava, schema)
    val out = "/tmp/graft_arrow_spec_features"
    ArrowDataset.save(df, out)
    val info = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/dataset_info.json")), "UTF-8")
    assert(info.contains(
      """"conversation": [{"content": {"dtype": "string", "_type": "Value"}"""))
    assert(info.contains(
      """"embedding": {"feature": {"dtype": "float32", "_type": "Value"}, """ +
        """"length": -1, "_type": "Sequence"}"""))
    // and no stray .tmp files survive the commit protocol
    assert(!new java.io.File(out).listFiles().exists(_.getName
      .endsWith(".tmp")))
  }

  test("zero-partition frames still save a loadable schema-only dataset") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("t", StringType)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    assert(empty.rdd.getNumPartitions === 0) // the degenerate case
    val out = "/tmp/graft_arrow_spec_empty"
    ArrowDataset.save(empty, out)
    val re = ArrowDataset.load(spark, out)
    assert(re.count() === 0)
    assert(re.schema.fieldNames.toSeq === Seq("id", "t"))
  }

  test("reads zstd- and lz4-compressed record batches (pyarrow-written)") {
    // two single-batch shards, same schema, one per codec (see
    // tools/make_arrow_fixture.py postscript) — loaded as one dataset
    val df = ArrowDataset.load(spark,
      resourceDir("graft/hf_fixture_zstd"))
    val rows = df.orderBy("doc_id", "text").collect()
    assert(rows.length === 6) // 3 rows × 2 codecs
    assert(rows.count(r => !r.isNullAt(1) && r.getString(1).length == 1000)
      === 2)
    assert(rows.filter(_.getLong(0) == 1L)
      .forall(_.getSeq[Float](2) === Seq(1.0f, 2.0f)))
  }

  test("reads large_string/large_list/large_binary (64-bit offset) columns") {
    // HF datasets promotes big columns to the large_* arrow types
    val df = ArrowDataset.load(spark, resourceDir("graft/hf_fixture_large"))
    assert(df.schema === StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("emb", ArrayType(FloatType)),
      StructField("payload", BinaryType))))
    val rows = df.orderBy("doc_id").collect()
    assert(rows(0).getString(1) === "big one")
    assert(rows(0).getSeq[Float](2) === Seq(0.5f, 1.5f))
    assert(rows(0).getAs[Array[Byte]](3).toSeq === Seq(1.toByte, 2.toByte))
    assert((1 to 3).forall(rows(1).isNullAt))
  }

  test("appendBatch: batches accrete; a replayed batch overwrites itself") {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("t", StringType)))
    def df(rows: Seq[Row]) =
      spark.createDataFrame(rows.asJava, schema).repartition(2)
    val out = "/tmp/graft_arrow_spec_append"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))

    ArrowDataset.appendBatch(df(Seq(Row(1L, "a"), Row(2L, "b"))), out, 0L)
    ArrowDataset.appendBatch(df(Seq(Row(3L, "c"))), out, 1L)
    // at-least-once replay of batch 0 with identical content: the
    // deterministic names + manifest dedup make it exactly-once
    ArrowDataset.appendBatch(df(Seq(Row(1L, "a"), Row(2L, "b"))), out, 0L)

    val re = ArrowDataset.load(spark, out)
    assert(re.orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the replay must NOT reorder the manifest: batch 0's shards stay
    // BEFORE batch 1's even though batch 0 was re-delivered last
    val state = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/state.json")), "UTF-8")
    assert(state.indexOf("data-b000000000-") <
      state.indexOf("data-b000000001-"))

    // schema drift across batches fails loudly — STRUCTURALLY, against
    // the shard bytes, so a richer dataset_info.json (what real HF
    // save_to_disk writes) does not trip it
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/dataset_info.json"),
      """{"description": "hf-written, richer fields", "features": {}}""")
    ArrowDataset.appendBatch(df(Seq(Row(9L, "late"))), out, 3L)
    assert(ArrowDataset.load(spark, out).count() === 4)
    val drifted = spark.createDataFrame(
      Seq(Row(4L)).asJava, StructType(Seq(StructField("id", LongType))))
    val e = intercept[IllegalArgumentException] {
      ArrowDataset.appendBatch(drifted, out, 4L)
    }
    assert(e.getMessage.contains("schema drift"))

    // orphan sweep: a crashed earlier attempt's same-prefix shard that
    // the replay no longer produces must be deleted (a manifest-less
    // glob would double-count it)
    val orphan = java.nio.file.Paths.get(s"$out/data-b000000001-p01999.arrow")
    val anyShard = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".arrow")).head.toPath
    java.nio.file.Files.copy(anyShard, orphan)
    ArrowDataset.appendBatch(df(Seq(Row(3L, "c"))), out, 1L) // replay b1
    assert(!java.nio.file.Files.exists(orphan))
    assert(ArrowDataset.load(spark, out).count() === 4)
  }

  test("foreachBatchArrowPublish: a stream publishes an HF-loadable dataset") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val out = s"/tmp/graft_arrow_stream_$stamp"
    val ckpt = s"/tmp/graft_arrow_stream_ckpt_$stamp"
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingPipeline.foreachBatchArrowPublish(
      mem.toDF.toDF("id", "t"), out, ckpt)
    try {
      mem.addData(Seq(1L -> "x", 2L -> "y"))
      q.processAllAvailable()
      mem.addData(Seq(3L -> "z"))
      q.processAllAvailable()
    } finally q.stop()
    val re = ArrowDataset.load(spark, out)
    assert(re.orderBy("id").collect().map(_.getString(1)).toSeq
      === Seq("x", "y", "z"))
    // the manifest lists batch shards in batch order
    val state = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/state.json")), "UTF-8")
    assert(state.indexOf("data-b000000000-") <
      state.indexOf("data-b000000001-"))
  }

  test("unsupported types fail loudly before any task runs") {
    val withTs = spark.range(1).withColumn("ts", current_timestamp())
    val e = intercept[IllegalArgumentException] {
      ArrowDataset.save(withTs, "/tmp/graft_arrow_spec_unsupported")
    }
    assert(e.getMessage.contains("unsupported"))
  }

  test("Sources.load dispatches an HF dataset directory to the arrow reader") {
    val dir = resourceDir("graft/hf_fixture")
    val df = Sources.load(spark, dir)
    assert(df.columns.contains("conversation"))
    assert(df.count() === 5)
  }
}
