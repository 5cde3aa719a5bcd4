package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.{table => t}

/** Multimodal-column plumbing (SURVEY.md §2.11): images/audio/video as
  * opaque `binary` columns with typed metadata, batch-shaped feature
  * extraction, and REAL header decode.
  *
  * The decode path parses genuine container bytes — PNG IHDR and JPEG SOF
  * headers via [[MediaCodec]] (width/height/bit depth from the bytes, no
  * codec library needed); only full PIXEL decode would need an image
  * library the container lacks, and unknown formats fall back to
  * deterministic byte statistics. Everything around it is real and tested:
  * the binary schema, the metadata struct, partition-preserving batched
  * execution (`mapPartitions` over fixed-size batches — the JVM analog of
  * a Pandas UDF over mapInPandas, same batch shape, same columnar hand-off
  * point), and scan-local expression-based feature columns.
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

  private val mediaSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("blob", BinaryType)))

  /** Fixture media table: deterministic REAL container bytes per document —
    * doc_id % 3 picks PNG / JPEG / raw-text "unknown", dimensions derive
    * from n_chars with the same arithmetic [[blobTable]] uses, the
    * document's text bytes ride as the payload stream. Spec-exact headers
    * ([[MediaCodec]]: valid PNG CRC, real JFIF APP0 + SOF0) so the decode
    * path parses genuine container structure, not a private convention.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars").cast("int").as("n_chars"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val nc = r.getInt(2)
          val blob = (id % 3) match {
            case 0 => MediaCodec.pngBytes(nc % 640, nc % 480, 8, payload)
            case 1 => MediaCodec.jpegBytes(nc % 640, nc % 480, 8, payload)
            case _ => payload
          }
          Row(id, blob)
        }
      }(enc)
  }

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bit_depth", IntegerType),
    StructField("n_bytes", LongType),
    StructField("mean_byte", DoubleType)))

  /** Fallback for blobs no header parser recognizes: deterministic
    * byte-statistics features (full scan of the blob, the access pattern a
    * codec has). Only the UNKNOWN-format branch of [[decodeFeatures]] —
    * PNG/JPEG take the real parse.
    */
  private def fallbackStats(blob: Array[Byte]): (Long, Double) = {
    var sum = 0L
    var i = 0
    while (i < blob.length) { sum += (blob(i) & 0xff); i += 1 }
    (blob.length.toLong, if (blob.length == 0) 0.0 else sum.toDouble / blob.length)
  }

  /** Batched decode over partitions: groups rows into fixed-size batches
    * before invoking the codec — the exact execution shape of a vectorized
    * Python UDF, minus the interpreter. The codec is
    * [[MediaCodec.decodeHeader]]: real PNG IHDR / JPEG SOF byte parsing
    * (width, height, bit depth from the container bytes); unrecognized
    * formats fall back to byte statistics. Partitioning of the input is
    * preserved; no shuffle.
    */
  def decodeFeatures(s: SparkSession, dir: String): DataFrame = {
    val input = mediaTable(s, dir)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    input.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        // batch boundary = codec invocation boundary (a full pixel decoder
        // would hand the whole batch to native code here)
        batch.iterator.map { r =>
          // positional access: rows off a chained mapPartitions are
          // schemaless GenericRow ((doc_id, blob) per mediaSchema)
          val blob = r.getAs[Array[Byte]](1)
          MediaCodec.decodeHeader(blob) match {
            case Some(h) =>
              Row(r.getLong(0), h.format, h.width, h.height, h.bitDepth,
                blob.length.toLong, null)
            case None =>
              val (n, mean) = fallbackStats(blob)
              Row(r.getLong(0), "unknown", null, null, null, n, mean)
          }
        }
      }
    }(enc).orderBy("doc_id")
  }

  /** Declared query: the mapPartitions decode path. Every field is
    * independently recomputable by the oracle (the fixture's dimensions
    * derive from n_chars, headers add exactly
    * [[MediaCodec.HeaderBytes]] bytes, unknown-format mean byte is exact
    * integer arithmetic over ASCII text) — so a parser that misreads any
    * header offset value-mismatches.
    */
  def mmDecode(s: SparkSession, dir: String): DataFrame =
    decodeFeatures(s, dir)
      .select(col("doc_id"), col("format"), col("width"), col("height"),
        col("bit_depth"), col("n_bytes"),
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

  /** Pixel-fixture dimension moduli: width ∈ [4,16], height ∈ [4,14] —
    * small enough that the oracle's grid join is trivial, large enough
    * that the raster walk is real.
    */
  val PxWidthMod = 13
  val PxHeightMod = 11

  /** Deterministic grayscale sample at (x, y) of document `id` — the
    * generating arithmetic BOTH sides derive from: the fixture encoder
    * writes it into real PNG bytes, and the oracle recomputes it in SQL,
    * so a decoder that misreads any pixel value-mismatches.
    */
  def pxValue(id: Long, x: Int, y: Int): Int = ((id + x + y) % 256L).toInt

  private val pixelSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("blob", BinaryType)))

  /** Pixel fixture: one REAL PNG per document — an 8-bit grayscale image
    * encoded with JDK ImageIO (full IHDR/IDAT/zlib container, not a
    * synthesized header), dimensions from doc_id, every sample from
    * [[pxValue]]. TYPE_BYTE_GRAY PNG is lossless, so decode must return
    * the exact samples. Partition-local; ImageIO's disk cache is off so
    * executor tasks never touch scratch files.
    */
  def pixelMediaTable(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(pixelSchema)
    t(s, dir, "documents")
      .select(col("doc_id"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getLong(0)
          val w = 4 + (id % PxWidthMod).toInt
          val h = 4 + (id % PxHeightMod).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { raster.setSample(x, y, 0, pxValue(id, x, y)); x += 1 }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream(256)
          javax.imageio.ImageIO.write(img, "png", out)
          Row(id, out.toByteArray)
        }
      }(enc)
  }

  private val pixelStatsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_px", LongType),
    StructField("min_px", IntegerType),
    StructField("max_px", IntegerType),
    StructField("sum_px", LongType)))

  /** FULL pixel decode — the half [[decodeFeatures]]' header parse left
    * open: JDK ImageIO decodes the complete PNG container (zlib inflate,
    * scanline unfiltering) on executors, in the same batched
    * `mapPartitions` shape, and the per-image statistics (extrema, sum —
    * the curation gates a pixel pipeline filters on) come off the RAW
    * RASTER samples, no color conversion. Every output field is
    * independently recomputable by the oracle from the generating
    * arithmetic, so a decoder that misreads any scanline
    * value-mismatches. Blobs stay in their partitions; nothing shuffles
    * before the O(docs) stats rows.
    */
  def mmPixels(s: SparkSession, dir: String): DataFrame = {
    val input = pixelMediaTable(s, dir)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(pixelStatsSchema)
    input.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val blob = r.getAs[Array[Byte]](1)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(blob))
          val raster = img.getRaster
          val (w, h) = (img.getWidth, img.getHeight)
          var (mn, mx, sum) = (Int.MaxValue, Int.MinValue, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = raster.getSample(x, y, 0)
              if (v < mn) mn = v
              if (v > mx) mx = v
              sum += v
              x += 1
            }
            y += 1
          }
          Row(r.getLong(0), w, h, w.toLong * h, mn, mx, sum)
        }
      }
    }(enc).orderBy("doc_id")
  }

  /** Id offset for the deterministically re-ingested asset slice — far
    * above every real doc_id so the injected copies are distinguishable.
    */
  val ReingestOffset = 1000000L

  /** Exact media dedup — the binary tier's `q_dedup_exact`: assets group
    * by content digest (+ byte length as the cheap pre-key), keeping the
    * smallest id. The corpus has no repeated blobs, so a re-ingested
    * slice (every 7th asset re-appears under a shifted id — the standing
    * modulo-injection device) plants real duplicates the query must
    * collapse.
    *
    * Scale shape: the digest is a row-local projection (the blob never
    * shuffles — only the 16-byte digest and two longs travel), one count
    * aggregation, map-side combined. This is what asset-dedup at 100 TB
    * looks like: bytes stay in their row groups; hashes move.
    */
  def mmDedup(s: SparkSession, dir: String): DataFrame = {
    val base = blobTable(s, dir).select(col("doc_id"), col("blob"))
    val reingested = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + ReingestOffset).as("doc_id"), col("blob"))
    base.union(reingested)
      .select(col("doc_id"), md5(col("blob")).as("digest"),
        length(col("blob")).cast("bigint").as("n_bytes"))
      .groupBy(col("digest"), col("n_bytes"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col("n_bytes"), col("digest"))
      .orderBy("keep_id")
  }

  /** Byte-level NEAR-dup over the binary tier — [[mmDedup]]'s exact
    * digest grouping extended to assets that share most of their bytes
    * but no digest (re-encodes, metadata stamps, truncations): sliding
    * 8-byte shingles of each blob (byte-aligned 16-char windows of the
    * hex encoding) feed the SAME MinHash → LSH band → bucket join →
    * exact-Jaccard chain the text tier runs
    * ([[graft.llm.Dedup.lshVerifiedPairs]] — the machinery never looks
    * inside a gram, so one dedup stack serves text AND media; blobs are
    * read once at scan to shingle and never shuffle whole). The
    * fixture's planted near-dup documents supply genuinely similar byte
    * streams; verification keeps pairs at Jaccard ≥ 0.5.
    */
  def mmNearDup(s: SparkSession, dir: String): DataFrame = {
    val hx = blobTable(s, dir)
      .select(col("doc_id"), hex(col("blob")).as("hx"))
    val grams = when(length(col("hx")) >= 16,
      array_distinct(transform(
        sequence(lit(1), length(col("hx")) - 15, lit(2)),
        i => col("hx").substr(i, lit(16)))))
      .otherwise(array(col("hx")))
    graft.llm.Dedup.lshVerifiedPairs(
      hx.select(col("doc_id"), grams.as("grams")), 0.5)
  }
}
