package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.{table => t}

/** Multimodal-column plumbing (SURVEY.md §2.11): images/audio/video as
  * opaque `binary` columns with typed metadata, batch-shaped feature
  * extraction, and deterministic stand-ins for the actual codecs.
  *
  * The container has no image/audio libraries, so the DECODE STEP IS A
  * STUB — `fakeDecode` derives deterministic pseudo-features from the
  * bytes. Everything around it is real and tested: the binary schema, the
  * metadata struct, partition-preserving batched execution
  * (`mapPartitions` over fixed-size batches — the JVM analog of a Pandas
  * UDF over mapInPandas, same batch shape, same columnar hand-off point),
  * and scan-local expression-based feature columns.
  *
  * At 100 TB: blobs stay in their parquet row groups (no shuffle), feature
  * extraction is embarrassingly parallel per partition, and the batch size
  * bounds peak memory per task exactly like `maxRecordsPerBatch` does for
  * Arrow-based UDFs.
  */
object MultimodalOps {

  val BatchSize = 64

  /** The harness has no binary table, so manufacture one deterministically:
    * each document's text bytes stand in for an encoded image, with typed
    * metadata derived from stable columns.
    */
  def blobTable(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("blob"),
        struct(
          (col("n_chars") % 640).cast("int").as("width"),
          (col("n_chars") % 480).cast("int").as("height"),
          lit("fake/rgb8").as("format")).as("meta"))

  /** Expression-path features: row-local, codegen'd, oracle-checkable —
    * the fast path for anything derivable without a codec.
    */
  def features(s: SparkSession, dir: String): DataFrame =
    blobTable(s, dir)
      .select(
        col("doc_id"),
        length(col("blob")).cast("bigint").as("n_bytes"),
        md5(col("blob")).as("digest"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.format").as("format"))
      .orderBy("doc_id")

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("mean_byte", DoubleType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** STUB for the real decoder: a deterministic fake that consumes the
    * bytes the way a codec would (full scan of the blob) and emits
    * fixed-shape features. Replace the body with the real
    * image/audio decode when the codec library is available — the
    * surrounding batching/schema contract stays identical.
    */
  private def fakeDecode(blob: Array[Byte], width: Int, height: Int): (Long, Double) = {
    var sum = 0L
    var i = 0
    while (i < blob.length) { sum += (blob(i) & 0xff); i += 1 }
    (blob.length.toLong, if (blob.length == 0) 0.0 else sum.toDouble / blob.length)
  }

  /** Batched decode over partitions: groups rows into fixed-size batches
    * before invoking the (stubbed) codec — the exact execution shape of a
    * vectorized Python UDF, minus the interpreter. Partitioning of the
    * input is preserved; no shuffle.
    */
  def decodeFeatures(s: SparkSession, dir: String): DataFrame = {
    val input = blobTable(s, dir)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    input.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        // batch boundary = codec invocation boundary (a real decoder would
        // hand the whole batch to native code here)
        batch.iterator.map { r =>
          val blob = r.getAs[Array[Byte]]("blob")
          val meta = r.getAs[Row]("meta")
          val (n, mean) = fakeDecode(blob, meta.getInt(0), meta.getInt(1))
          Row(r.getLong(0), n, mean, meta.getInt(0), meta.getInt(1))
        }
      }
    }(enc).orderBy("doc_id")
  }

  /** Declared query: the mapPartitions decode path, projected to
    * oracle-expressible features (mean byte value of ASCII text is exact
    * integer arithmetic in any engine).
    */
  def mmDecode(s: SparkSession, dir: String): DataFrame =
    decodeFeatures(s, dir)
      .select(col("doc_id"), col("n_bytes"),
        round(col("mean_byte"), 6).as("mean_byte"))
      .orderBy("doc_id")

  private val resizedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("blob", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Resize STUB: byte-stride downsampling standing in for a real image
    * resize (nearest-neighbor over a byte plane). The batching/schema
    * contract is the real part — a codec-backed resize drops into
    * `resizeOne` unchanged. Partition-preserving, no shuffle.
    */
  def resize(s: SparkSession, dir: String, stride: Int): DataFrame = {
    def resizeOne(blob: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte]((blob.length + stride - 1) / stride)
      var i = 0
      while (i < out.length) { out(i) = blob(i * stride); i += 1 }
      out
    }
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(resizedSchema)
    blobTable(s, dir).mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val meta = r.getAs[Row]("meta")
          Row(r.getLong(0), resizeOne(r.getAs[Array[Byte]]("blob")),
            meta.getInt(0) / stride, meta.getInt(1) / stride)
        }
      }
    }(enc)
  }

  val FrameBytes = 64

  /** Frame sampling (the video-frame / audio-chunk analog): slice the blob
    * into fixed-size frames row-locally, emit every 4th frame's digest —
    * the access pattern a frame extractor uses, minus the codec. substring
    * on binary stays inside codegen; no shuffle.
    */
  def mmFrameSample(s: SparkSession, dir: String): DataFrame =
    blobTable(s, dir)
      .select(
        col("doc_id"),
        ceil(length(col("blob")).cast("double") / FrameBytes).cast("int").as("n_frames"),
        posexplode(
          // empty blob → no frames (sequence(0, -1) would count down and
          // emit a bogus frame; the oracle's integer floor agrees with this
          // guard, not with truncation toward zero)
          when(length(col("blob")) > 0,
            transform(
              sequence(lit(0), ((length(col("blob")) - 1) / FrameBytes).cast("int")),
              i => col("blob").substr((i * FrameBytes + 1).cast("int"), lit(FrameBytes))))
            .otherwise(array().cast("array<binary>"))))
      .filter(col("pos") % 4 === 0)
      .select(
        col("doc_id"), col("n_frames"),
        col("pos").cast("int").as("frame_idx"),
        md5(col("col")).as("frame_digest"))
      .orderBy("doc_id", "frame_idx")
}
