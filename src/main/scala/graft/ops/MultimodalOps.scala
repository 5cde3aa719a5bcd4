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

  /** The codec fixtures' input: just the ids, FANNED OUT across the
    * session's parallelism before the expensive executor-side encode.
    * The scan behind the test corpus is a single small parquet file —
    * one partition — which would serialize the whole codec family's
    * encode+decode onto one core; the fan-out restores the parallelism a
    * production corpus gets for free from file count, and what moves is
    * 8 bytes per document, never a blob (measured: the video tier's
    * encode dropped from one-core 3.1 s to the parallel band at sf0.1).
    */
  private def docIds(s: SparkSession, dir: String): DataFrame =
    // explicit partition count: a keys-only repartition is ~8 bytes/row,
    // so AQE's advisory-size coalescing would immediately fold it back to
    // one partition — the cost model sees bytes, not the codec CPU behind
    // each row. A user-specified count is exempt from AQE coalescing.
    t(s, dir, "documents").select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))

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
    docIds(s, dir)
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

  /** RGB-tier dimension moduli: width ∈ [8,20], height ∈ [8,18] — several
    * full 8×8 JPEG DCT blocks per image, so the lossy half exercises real
    * block transforms rather than a single padded block.
    */
  val PxRgbWidthMod = 13
  val PxRgbHeightMod = 11

  /** Per-channel tolerance for the JPEG mean assertion: the channel MEANS
    * of a decoded baseline JPEG sit within a fraction of a code value of
    * the encoder input (DC coefficients survive default-quality
    * quantization almost exactly); 3 code values is an order of magnitude
    * of slack while still failing loudly for any real decode bug (wrong
    * channel order alone shifts a mean by ~85 here).
    */
  val JpegMeanTol = 3.0

  /** Deterministic sRGB sample: channel `c` (0=R,1=G,2=B) at (x, y) of
    * document `id` — a per-channel, id-dependent BASE plus a spatial
    * sawtooth that is IDENTICAL across channels. The construction is
    * deliberate for the lossy half: equal spatial variation means the
    * chroma planes are constant per image, so JPEG's 4:2:0 chroma
    * subsampling (which smeared a first-cut per-channel `%256` wraparound
    * into >3-code-value mean shifts on small images) has nothing to
    * destroy, while the 85-apart channel bases still make any swapped or
    * misread channel shift a mean by ~85 — the assertion stays sharp.
    * Range tops out at 199 + 31 = 230: no wraparound discontinuities
    * anywhere.
    */
  def pxValueRgb(id: Long, x: Int, y: Int, c: Int): Int =
    ((id + 85L * c) % 200L).toInt + ((x + y) % 32)

  private val pixelRgbSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("fmt", StringType),
    StructField("blob", BinaryType)))

  /** Color fixture: one REAL container per document — even doc_ids a
    * TYPE_INT_RGB PNG (lossless), odd doc_ids a baseline JPEG (lossy,
    * ImageIO default quality), both encoded on executors from the
    * [[pxValueRgb]] gradient. The format split makes one declared query
    * cover both decode disciplines: exact-sum oracling where the codec is
    * lossless, decode-then-assert where it is not.
    */
  def pixelRgbTable(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(pixelRgbSchema)
    docIds(s, dir)
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getLong(0)
          val w = 8 + (id % PxRgbWidthMod).toInt
          val h = 8 + (id % PxRgbHeightMod).toInt
          val fmt = if (id % 2 == 0) "png" else "jpg"
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y,
                (pxValueRgb(id, x, y, 0) << 16) |
                (pxValueRgb(id, x, y, 1) << 8) |
                pxValueRgb(id, x, y, 2))
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream(512)
          // ImageIO.write returns false (no exception) when no writer
          // accepts the format — an unchecked false would emit a 0-byte
          // blob that only fails much later. Emitting the empty blob is
          // still the right move, but deliberately: the decode stage's
          // null-image guard turns it into decode_ok=false, so a broken
          // encoder surfaces through the same decode-then-assert channel
          // as a broken decoder instead of NPE-ing the stage.
          if (!javax.imageio.ImageIO.write(img, fmt, out)) out.reset()
          Row(id, fmt, out.toByteArray)
        }
      }(enc)
  }

  private val pixelRgbStatsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("fmt", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_px", LongType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("decode_ok", BooleanType)))

  /** RGB + JPEG pixel decode — [[mmPixels]]' grayscale-PNG tier extended
    * to color and a LOSSY codec. Same executor-side batched
    * `mapPartitions` decode (ImageIO: zlib inflate for PNG, baseline DCT
    * for JPEG), channels read through `getRGB` (packed sRGB — channel
    * order is part of what is asserted).
    *
    * Oracle discipline differs by codec, inside one query:
    *  - PNG rows are lossless: exact per-channel sums, recomputed by the
    *    oracle from the generating arithmetic — any misread scanline or
    *    swapped channel value-mismatches;
    *  - JPEG rows are lossy: the decoded samples are NOT
    *    arithmetic-derivable, so the query DECODES-THEN-ASSERTS — each
    *    channel's decoded mean must sit within [[JpegMeanTol]] of the
    *    encoder-input mean, and only the assertion verdict
    *    (`decode_ok`) plus the header-exact dims are emitted; sums are
    *    NULL. The oracle pins `decode_ok = true` for every row, so a
    *    drifting decode (or a broken encoder) hash-mismatches instead of
    *    passing silently.
    *
    * Blobs stay in their partitions; only O(docs) stat rows move.
    */
  def mmPixelsRgb(s: SparkSession, dir: String): DataFrame = {
    val input = pixelRgbTable(s, dir)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(pixelRgbStatsSchema)
    input.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val fmt = r.getString(1)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](2)))
          // ImageIO.read signals "no decoder / unreadable bytes" with
          // null, not an exception — an unguarded read would NPE the
          // whole stage for one bad blob, when the contract here is that
          // a broken decode SURFACES as decode_ok=false and the oracle's
          // pinned decode_ok=true hash-mismatches
          if (img == null) Row(id, fmt, null, null, null, null, null, null, false)
          else {
          val (w, h) = (img.getWidth, img.getHeight)
          val actual = new Array[Long](3)
          val expected = new Array[Long](3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              actual(0) += (rgb >> 16) & 0xff
              actual(1) += (rgb >> 8) & 0xff
              actual(2) += rgb & 0xff
              var c = 0
              while (c < 3) { expected(c) += pxValueRgb(id, x, y, c); c += 1 }
              x += 1
            }
            y += 1
          }
          val nPx = w.toLong * h
          val ok =
            if (fmt == "png") actual.sameElements(expected)
            else (0 until 3).forall(c =>
              math.abs(actual(c).toDouble / nPx - expected(c).toDouble / nPx)
                <= JpegMeanTol)
          Row(id, fmt, w, h, nPx,
            if (fmt == "png") actual(0) else null,
            if (fmt == "png") actual(1) else null,
            if (fmt == "png") actual(2) else null,
            ok)
          }
        }
      }
    }(enc).orderBy("doc_id")
  }

  /** Audio-fixture length band: n_samples ∈ [240, 480] — a few hundred
    * PCM frames per clip keeps the oracle's sample-grid join trivial while
    * the chunk walk, sign handling and crossing count stay real.
    */
  val AuLenBase = 240
  val AuLenMod = 241

  /** Deterministic signed 16-bit PCM sample `i` of document `id` — the
    * generating arithmetic BOTH sides derive from, exactly like
    * [[pxValue]] for the image tiers: the fixture encoder writes it into
    * real WAVE bytes and the oracle recomputes it in SQL. Range
    * [-2048, 2048]: well inside int16; the 29-step through a 4097-wide
    * ring wraps every clip at least three times (29 × 240 > 2 × 4097), so
    * EVERY clip crosses zero — the crossing count is never vacuous — and
    * squares sum far below Long range.
    */
  def auSample(id: Long, i: Int): Int = ((id * 31 + i * 29L) % 4097L).toInt - 2048

  /** Sample rate of document `id`'s clip: 8 / 16 / 24 kHz by id — three
    * distinct rates so the duration arithmetic (integer floor millis)
    * can't pass by accident of a single constant.
    */
  def auRate(id: Long): Int = 8000 * (1 + (id % 3).toInt)

  private val audioSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("blob", BinaryType)))

  /** Audio fixture: one REAL WAVE file per document — mono 16-bit signed
    * little-endian PCM, written by the JDK's `javax.sound.sampled` WAVE
    * writer (canonical RIFF container: fmt chunk with rate/width/align,
    * data chunk with the frames), every sample from [[auSample]]. The
    * encoder is a real platform codec, the decoder
    * ([[parseWav]]) is an independent hand-rolled chunk walker — the two
    * meeting byte-exactly is the point. Partition-local, no scratch
    * files (pure stream writer).
    */
  def audioTable(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(audioSchema)
    docIds(s, dir)
      .mapPartitions { rows =>
        // resolve the platform WAVE writer ONCE per partition through the
        // public AudioFileWriter SPI: AudioSystem.write re-runs provider
        // discovery per call through a JVM-global SYNCHRONIZED registry
        // (sun JDK13Services.getProviders), so 32 concurrent encode tasks
        // serialize on that lock — measured slower than one core. The
        // writer instances themselves are stateless and thread-safe.
        val wavType = javax.sound.sampled.AudioFileFormat.Type.WAVE
        val wavWriter = {
          val it = java.util.ServiceLoader
            .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
          var found: javax.sound.sampled.spi.AudioFileWriter = null
          while (found == null && it.hasNext) {
            val w = it.next()
            if (w.isFileTypeSupported(wavType)) found = w
          }
          found // the JDK always ships one; null would NPE loudly below
        }
        rows.map { r =>
          val id = r.getLong(0)
          val n = AuLenBase + (id % AuLenMod).toInt
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = auSample(id, i)
            pcm(2 * i) = (v & 0xff).toByte            // little-endian int16
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            auRate(id).toFloat, 16, 1, true /*signed*/, false /*littleEndian*/)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val out = new java.io.ByteArrayOutputStream(pcm.length + 64)
          wavWriter.write(ais, wavType, out)
          Row(id, out.toByteArray)
        }
      }(enc)
  }

  /** Decoded WAVE: (sampleRate, channels, bitsPerSample, samples). */
  private[graft] final case class WavPcm(
      sampleRate: Int, channels: Int, bits: Int, samples: Array[Int])

  /** Hand-rolled RIFF/WAVE parser — real chunk walking, not a fixed-44
    * -byte offset convention: verifies the RIFF/WAVE magic, then walks
    * chunks (id, little-endian u32 size, word-aligned payload) until it
    * has seen `fmt ` (must be PCM format tag 1) and `data`, tolerating
    * any other chunks (`LIST`, `fact`, …) a real writer may interleave.
    * Samples decode as signed little-endian int16. Returns None for
    * anything malformed — callers surface that as decode_ok=false, never
    * as a stage failure (the image tiers' null-image rule).
    */
  private[graft] def parseWav(blob: Array[Byte]): Option[WavPcm] = {
    def u16(o: Int) = (blob(o) & 0xff) | ((blob(o + 1) & 0xff) << 8)
    def u32(o: Int) = (blob(o) & 0xffL) | ((blob(o + 1) & 0xffL) << 8) |
      ((blob(o + 2) & 0xffL) << 16) | ((blob(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(blob, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (blob.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var rate, ch, bits = -1
    var fmtTag = -1
    var data: Array[Int] = null
    while (off + 8 <= blob.length) {
      val id = tag(off)
      val size = u32(off + 4).toInt
      val body = off + 8
      // size is a u32 read into an Int: a hostile/corrupt field ≥ 2^31
      // goes NEGATIVE here, which would pass the forward bounds check and
      // either spin this loop forever (off recomputes to itself at -8) or
      // throw from the data-chunk array allocation — malformed means None,
      // never a hung or crashed task
      if (size < 0 || body + size > blob.length) return None
      id match {
        case "fmt " if size >= 16 =>
          fmtTag = u16(body)
          ch = u16(body + 2)
          rate = u32(body + 4).toInt
          bits = u16(body + 14)
        case "data" =>
          val n = size / 2
          val s = new Array[Int](n)
          var i = 0
          while (i < n) { s(i) = u16(body + 2 * i).toShort.toInt; i += 1 }
          data = s
        case _ => // skip unknown chunks — a real parser must
      }
      off = body + size + (size & 1) // chunks are word-aligned
    }
    if (fmtTag != 1 || ch < 1 || bits != 16 || rate <= 0 || data == null) None
    else Some(WavPcm(rate, ch, bits, data))
  }

  private val audioStatsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("duration_ms", IntegerType),
    StructField("peak_abs", IntegerType),
    StructField("sum_abs", LongType),
    StructField("sum_sq", LongType),
    StructField("zero_cross", IntegerType),
    StructField("decode_ok", BooleanType)))

  /** Full audio decode — the third REAL codec tier beside the grayscale
    * and RGB/JPEG image decodes: executor-side batched `mapPartitions`
    * over [[audioTable]]'s JDK-written WAVE blobs, decoded by the
    * independent [[parseWav]] chunk walker, and the acoustic statistics a
    * curation pipeline gates on (peak, L1 energy, L2 energy,
    * zero-crossing rate's numerator) computed off the RAW int16 samples
    * in exact integer arithmetic. PCM is lossless, so every field is
    * recomputable by the oracle from [[auSample]] — a parser that
    * misreads the fmt chunk, drops a sample, or flips byte order
    * value-mismatches. Blobs stay in their partitions; O(docs) stat rows
    * move.
    */
  def mmAudio(s: SparkSession, dir: String): DataFrame = {
    val input = audioTable(s, dir)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(audioStatsSchema)
    input.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          parseWav(r.getAs[Array[Byte]](1)) match {
            case None =>
              Row(id, null, null, null, null, null, null, null, false)
            case Some(w) =>
              val n = w.samples.length
              var peak = 0
              var sumAbs, sumSq = 0L
              var zc = 0
              var i = 0
              while (i < n) {
                val v = w.samples(i)
                val a = math.abs(v)
                if (a > peak) peak = a
                sumAbs += a
                sumSq += v.toLong * v
                // crossing = strict sign-bucket change ((v<0) vs (prev<0))
                if (i > 0 && (v < 0) != (w.samples(i - 1) < 0)) zc += 1
                i += 1
              }
              Row(id, w.sampleRate, n,
                (n.toLong * 1000L / w.sampleRate).toInt,
                peak, sumAbs, sumSq, zc, true)
          }
        }
      }
    }(enc).orderBy("doc_id")
  }

  private val resizeStatsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("in_w", IntegerType),
    StructField("in_h", IntegerType),
    StructField("out_w", IntegerType),
    StructField("out_h", IntegerType),
    StructField("sum_px", LongType),
    StructField("min_px", IntegerType),
    StructField("max_px", IntegerType),
    StructField("roundtrip_ok", BooleanType)))

  /** REAL image resize — the codec-backed operation [[resize]]'s
    * byte-stride stub stood in for: decode the grayscale PNG fixture
    * ([[pixelMediaTable]]), 2×2 box-filter downsample the raster in exact
    * integer arithmetic (each output sample = floor(mean) of its 1, 2 or
    * 4 covered input samples — edge blocks shrink, nothing is padded),
    * then re-ENCODE the resized raster to PNG and re-decode it, asserting
    * the round trip returns the resized samples bit-exactly (PNG is
    * lossless, so any drift in the encode half surfaces as
    * roundtrip_ok=false against the oracle's pinned TRUE). The emitted
    * statistics are over the RESIZED raster and recomputable by the
    * oracle from [[pxValue]] + the same floor-mean, so a misaligned
    * window or wrong divisor value-mismatches. Decode→transform→encode
    * all partition-local; O(docs) stat rows out.
    */
  def mmResize(s: SparkSession, dir: String): DataFrame = {
    val input = pixelMediaTable(s, dir)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(resizeStatsSchema)
    input.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          if (img == null) Row(id, null, null, null, null, null, null, null, false)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val (ow, oh) = ((w + 1) / 2, (h + 1) / 2)
            val raster = img.getRaster
            val out = new java.awt.image.BufferedImage(
              ow, oh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val outRaster = out.getRaster
            var (mn, mx, sum) = (Int.MaxValue, Int.MinValue, 0L)
            var by = 0
            while (by < oh) {
              var bx = 0
              while (bx < ow) {
                var acc, cnt = 0
                var dy = 0
                while (dy < 2 && 2 * by + dy < h) {
                  var dx = 0
                  while (dx < 2 && 2 * bx + dx < w) {
                    acc += raster.getSample(2 * bx + dx, 2 * by + dy, 0)
                    cnt += 1
                    dx += 1
                  }
                  dy += 1
                }
                val v = acc / cnt
                outRaster.setSample(bx, by, 0, v)
                if (v < mn) mn = v
                if (v > mx) mx = v
                sum += v
                bx += 1
              }
              by += 1
            }
            // encode-half check: resized raster → PNG → decode → bit-equal
            val bytes = new java.io.ByteArrayOutputStream(256)
            val wrote = javax.imageio.ImageIO.write(out, "png", bytes)
            val back = if (!wrote) null
              else javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes.toByteArray))
            val ok = back != null && back.getWidth == ow && back.getHeight == oh && {
              val br = back.getRaster
              var same = true
              var y = 0
              while (same && y < oh) {
                var x = 0
                while (same && x < ow) {
                  same = br.getSample(x, y, 0) == outRaster.getSample(x, y, 0)
                  x += 1
                }
                y += 1
              }
              same
            }
            Row(id, w, h, ow, oh, sum, mn, mx, ok)
          }
        }
      }
    }(enc).orderBy("doc_id")
  }

  /** Video-fixture shape: 2..6 frames per clip, frames 4..12 × 4..10 —
    * several frames so every-Nth sampling is non-trivial, dims small
    * enough that the oracle's (doc × frame × pixel) grid join stays
    * cheap, and heights BELOW 8 on purpose: the JDK GIF writer's default
    * interlaced output reorders scanlines wrongly for rasters shorter
    * than the interlace pass stride (the fixture pins interlace OFF, and
    * the exact-sum oracle is what would catch the corruption).
    */
  val VidFramesBase = 2
  val VidFramesMod = 5
  val VidWidthMod = 9
  val VidHeightMod = 7

  /** Sample every Nth frame — the frame-sample operation itself. */
  val VidSampleEvery = 2

  /** Deterministic grayscale sample of frame `f` at (x, y) of document
    * `id`'s clip — the generating arithmetic BOTH sides derive from, the
    * video analog of [[pxValue]]/[[auSample]]: the fixture encoder writes
    * it into real animated-GIF bytes, the oracle recomputes it in SQL.
    * The 7·f term makes consecutive frames differ everywhere, so a
    * decoder that samples the WRONG frame (off-by-one in the frame index,
    * or a reader that composites instead of reading the frame raster)
    * value-mismatches on every pixel.
    */
  def vidPx(id: Long, f: Int, x: Int, y: Int): Int =
    ((id + 7L * f + x + y) % 256L).toInt

  /** Frame `f`'s display delay in centiseconds (GIF's native unit):
    * 1..4 cs, frame-dependent so the metadata walk that recovers it is
    * never satisfied by a constant.
    */
  def vidDelayCs(id: Long, f: Int): Int = 1 + ((id + f) % 4L).toInt

  private val videoSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("blob", BinaryType)))

  /** Video fixture: one REAL multi-frame container per document — an
    * animated GIF written frame-by-frame with the JDK's ImageIO sequence
    * writer (`prepareWriteSequence`/`writeToSequence`: genuine logical
    * screen descriptor, per-frame image descriptors, LZW-compressed
    * rasters, and a GraphicControlExtension per frame carrying
    * [[vidDelayCs]]). Frames are TYPE_BYTE_INDEXED over an identity
    * grayscale palette, so 8-bit LZW is lossless and every sample is
    * [[vidPx]] exactly. Interlace is pinned OFF in the ImageDescriptor
    * metadata (see [[VidFramesBase]] doc — the default corrupts short
    * rasters). Partition-local; no scratch files.
    */
  def videoTable(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(videoSchema)
    docIds(s, dir)
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val ramp = Array.tabulate(256)(_.toByte)
        val palette = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
        // partition-scoped amortization: ONE writer reused across documents
        // (reset + setOutput per clip), and the per-frame IIOMetadata — a
        // DOM build whose only variance is the 1..4 cs delay (the type
        // specifier is the fixed palette) — memoized to four instances.
        // Without this the metadata tree work ran once per FRAME and
        // dominated the encode (measured 8.4 s → the stats-tier band at
        // sf0.1).
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        val metaByDelay = new java.util.HashMap[Int, javax.imageio.metadata.IIOMetadata]()
        def delayMeta(img: java.awt.image.BufferedImage, delayCs: Int) =
          metaByDelay.computeIfAbsent(delayCs, { d =>
            val meta = writer.getDefaultImageMetadata(
              new javax.imageio.ImageTypeSpecifier(img), null)
            val fmtName = meta.getNativeMetadataFormatName
            val root = meta.getAsTree(fmtName)
              .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            var gce: javax.imageio.metadata.IIOMetadataNode = null
            var i = 0
            while (i < root.getLength) {
              val node = root.item(i).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
              node.getNodeName match {
                case "GraphicControlExtension" => gce = node
                case "ImageDescriptor" => node.setAttribute("interlaceFlag", "FALSE")
                case _ =>
              }
              i += 1
            }
            if (gce == null) {
              gce = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
              root.appendChild(gce)
            }
            gce.setAttribute("disposalMethod", "none")
            gce.setAttribute("userInputFlag", "FALSE")
            gce.setAttribute("transparentColorFlag", "FALSE")
            gce.setAttribute("transparentColorIndex", "0")
            gce.setAttribute("delayTime", d.toString)
            meta.setFromTree(fmtName, root)
            meta
          })
        rows.map { r =>
          val id = r.getLong(0)
          val w = 4 + (id % VidWidthMod).toInt
          val h = 4 + (id % VidHeightMod).toInt
          val nf = VidFramesBase + (id % VidFramesMod).toInt
          val bos = new java.io.ByteArrayOutputStream(1024)
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          writer.reset()
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nf) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { raster.setSample(x, y, 0, vidPx(id, f, x, y)); x += 1 }
              y += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, delayMeta(img, vidDelayCs(id, f))), null)
            f += 1
          }
          writer.endWriteSequence()
          ios.close()
          Row(id, bos.toByteArray)
        }
      }(enc)
  }

  /** One frame of [[GifInfo]]: raster dims + the GCE delay (centiseconds)
    * that preceded its image descriptor (0 if none did — GIF's default).
    */
  private[graft] final case class GifFrame(width: Int, height: Int, delayCs: Int)
  private[graft] final case class GifInfo(
      width: Int, height: Int, frames: Vector[GifFrame])

  /** Hand-rolled GIF container walker — the [[parseWav]] of the video
    * tier: verifies the GIF87a/GIF89a signature, reads the logical screen
    * descriptor, skips the global color table, then walks the block
    * stream (extension blocks with length-prefixed sub-blocks, image
    * descriptors with optional local color tables and LZW data
    * sub-blocks) to the trailer, collecting per-frame dims and the
    * GraphicControlExtension delays. No LZW decode — container STRUCTURE
    * is this side's contribution; pixel content comes from the ImageIO
    * decode it is cross-checked against. Returns None for anything
    * malformed (bad signature, truncated sub-block chain, missing
    * trailer) — callers surface that as decode_ok=false, never a stage
    * failure.
    */
  private[graft] def parseGifStructure(blob: Array[Byte]): Option[GifInfo] = {
    def u16(o: Int) = (blob(o) & 0xff) | ((blob(o + 1) & 0xff) << 8)
    if (blob.length < 14) return None
    val sig = new String(blob, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val (sw, sh) = (u16(6), u16(8))
    val packed = blob(10) & 0xff
    // sub-block chain: (len, payload)* until a zero length byte
    def skipSubBlocks(start: Int): Int = {
      var o = start
      while (o < blob.length && (blob(o) & 0xff) != 0) o += 1 + (blob(o) & 0xff)
      if (o >= blob.length) -1 else o + 1
    }
    var off = 13
    if ((packed & 0x80) != 0) off += 3 * (1 << ((packed & 7) + 1))
    var frames = Vector.empty[GifFrame]
    var pendingDelay = 0
    while (off < blob.length) {
      (blob(off) & 0xff) match {
        case 0x3b => // trailer — the only well-formed exit
          return Some(GifInfo(sw, sh, frames))
        case 0x21 => // extension block
          if (off + 2 > blob.length) return None
          val label = blob(off + 1) & 0xff
          // GCE: fixed 4-byte body = packed, u16 LE delay, transparent idx
          if (label == 0xf9 && off + 8 <= blob.length && (blob(off + 2) & 0xff) == 4)
            pendingDelay = u16(off + 4)
          off = skipSubBlocks(off + 2)
          if (off < 0) return None
        case 0x2c => // image descriptor: left, top, w, h (u16 LE), packed
          if (off + 10 > blob.length) return None
          val (fw, fh) = (u16(off + 5), u16(off + 7))
          val ip = blob(off + 9) & 0xff
          var o = off + 10
          if ((ip & 0x80) != 0) o += 3 * (1 << ((ip & 7) + 1))
          o += 1 // LZW minimum code size byte
          o = skipSubBlocks(o)
          if (o < 0) return None
          frames :+= GifFrame(fw, fh, pendingDelay)
          pendingDelay = 0
          off = o
        case _ => return None
      }
    }
    None // ran off the end without a trailer
  }

  private val videoStatsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_frames", IntegerType),
    StructField("duration_cs", IntegerType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_px", LongType),
    StructField("min_px", IntegerType),
    StructField("max_px", IntegerType),
    StructField("decode_ok", BooleanType)))

  /** Frame sampling over a REAL multi-frame container — the codec-backed
    * operation [[mmFrameSample]]'s byte-slicing stood in for, and the
    * fourth real decode tier (grayscale PNG, RGB/JPEG, WAVE, now animated
    * GIF). Executor-side batched `mapPartitions` over [[videoTable]]'s
    * clips; per clip:
    *
    *  - the independent [[parseGifStructure]] walker recovers frame
    *    count, per-frame dims, and the GCE delays (clip duration = their
    *    sum) from the container bytes;
    *  - ImageIO's GIF reader decodes every [[VidSampleEvery]]-th frame
    *    (`getNumImages(true)` must agree with the walker's frame count —
    *    two independent parsers cross-check each other), and the raster
    *    statistics come off the decoded samples in exact integer
    *    arithmetic.
    *
    * LZW over an identity 8-bit palette is lossless, so every emitted
    * field is recomputable by the oracle from [[vidPx]]/[[vidDelayCs]] —
    * a reader that miscounts frames, misorders scanlines (the interlace
    * hazard), or samples the wrong frame value-mismatches. Any malformed
    * clip or parser disagreement emits ONE decode_ok=false row instead of
    * failing the stage. Blobs stay in their partitions; O(docs × frames)
    * stat rows move.
    */
  def mmVideo(s: SparkSession, dir: String): DataFrame = {
    val input = videoTable(s, dir)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(videoStatsSchema)
    input.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      // one reader per partition, reset + re-targeted per clip — reader
      // construction per document is measurable at corpus scale
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      rows.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val id = r.getLong(0)
          val blob = r.getAs[Array[Byte]](1)
          val badRow = Row(id, null, null, null, null, null, null, null, null, false)
          parseGifStructure(blob) match {
            case None => Iterator.single(badRow)
            case Some(info) =>
              try {
                reader.reset()
                reader.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
                  new java.io.ByteArrayInputStream(blob)))
                val n = try reader.getNumImages(true)
                        catch { case _: java.io.IOException => -1 }
                if (n <= 0 || n != info.frames.length) Iterator.single(badRow)
                else {
                  val durationCs = info.frames.iterator.map(_.delayCs).sum
                  (0 until n by VidSampleEvery).iterator.map { f =>
                    val img = reader.read(f)
                    val walked = info.frames(f)
                    if (img == null || img.getWidth != walked.width ||
                        img.getHeight != walked.height)
                      Row(id, n, durationCs, f, null, null, null, null, null, false)
                    else {
                      val (w, h) = (img.getWidth, img.getHeight)
                      var (mn, mx, sum) = (Int.MaxValue, Int.MinValue, 0L)
                      var y = 0
                      while (y < h) {
                        var x = 0
                        while (x < w) {
                          // through the palette (getRGB), not the raw index:
                          // channel mapping is part of what is asserted
                          val v = img.getRGB(x, y) & 0xff
                          if (v < mn) mn = v
                          if (v > mx) mx = v
                          sum += v
                          x += 1
                        }
                        y += 1
                      }
                      Row(id, n, durationCs, f, w, h, sum, mn, mx, true)
                    }
                  }.toVector.iterator
                }
              } catch {
                // a clip whose frames won't decode is a data fault, not a
                // stage fault — same contract as the other codec tiers
                case _: java.io.IOException => Iterator.single(badRow)
              }
          }
        }
      }
    }(enc).orderBy("doc_id", "frame_idx")
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
