package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [engine-added] Multimodal-column plumbing for training-data pipelines:
  * image/audio/video payloads travel as opaque `binary` columns next to a
  * typed metadata struct, and per-asset compute (decode, feature-extract,
  * resize, frame-sample) runs as `mapPartitions` over the binary batches —
  * the Scala analog of the Pandas-UDF-over-`mapInPandas` pattern, with the
  * same properties: batch-at-a-time processing, no driver involvement,
  * partition-parallel across executors.
  *
  * The actual media codecs are NOT in this environment, so the decode step
  * is a clearly-marked deterministic STUB (`decodeStub`): it "decodes" a
  * fake 16-byte header (magic, width, height, channels) and derives
  * features from raw bytes. Everything around it — schema, batching,
  * partitioning, the operator signatures — is real Spark and is what would
  * carry a real libjpeg/ffmpeg call at 100 TB: swap `decodeStub` for a JNI
  * decode and nothing else changes.
  */
object MultimodalOps {

  /** Typed metadata carried next to every binary payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("n_bytes", LongType, nullable = false)))

  /** Canonical multimodal asset schema: `(asset_id, content, meta)`. */
  val AssetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", MetaSchema, nullable = false)))

  /** Wrap any `(id long, payload binary)` frame into the asset schema,
    * parsing the stub header. Pure expressions — stays in codegen. */
  def toAssets(df: DataFrame, idCol: String, binCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      col(binCol).as("content"),
      struct(
        lit(mediaType).as("media_type"),
        // stub header layout: bytes 1-4 magic, 5-8 width, 9-12 height, 13-16 channels
        beInt(col(binCol), 5).as("width"),
        beInt(col(binCol), 9).as("height"),
        beInt(col(binCol), 13).as("channels"),
        length(col(binCol)).cast("long").as("n_bytes")).as("meta"))

  /** Big-endian int32 read at a 1-based byte offset of a binary column.
    * Accumulates in long so ANSI mode can't see an int overflow. */
  private def beInt(bin: org.apache.spark.sql.Column, off: Int) = {
    def b(i: Int) = conv(hex(substring(bin, off + i, 1)), 16, 10).cast("long")
    (b(0) * 16777216L + b(1) * 65536L + b(2) * 256L + b(3)).cast("int")
  }

  /** Deterministic stand-in for a real image decode: byte-value histogram
    * (16 buckets) normalized to [0,1] as the "feature vector", plus a
    * checksum. STUB — replace the body with a real codec call in
    * production; the signature and batching are the real contract. */
  def decodeStub(content: Array[Byte]): (Array[Float], Long) = {
    val hist = new Array[Float](16)
    var checksum = 0L
    var i = 16.min(content.length) // skip the fake header
    while (i < content.length) {
      hist((content(i) & 0xff) >>> 4) += 1f
      checksum = (checksum * 31 + (content(i) & 0xff)) % 1000000007L
      i += 1
    }
    val n = math.max(1, content.length - 16)
    var j = 0
    while (j < 16) { hist(j) /= n.toFloat; j += 1 }
    (hist, checksum)
  }

  /** Feature extraction over asset batches: one executor-side pass per
    * partition (the mapInPandas shape). Output:
    * `(asset_id, features array<float>, checksum long)`. */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("checksum", LongType, nullable = false)))
    val idIdx = assets.schema.fieldIndex("asset_id")
    val binIdx = assets.schema.fieldIndex("content")
    val rdd = assets.rdd.mapPartitions { rows =>
      rows.map { r =>
        val (hist, checksum) = decodeStub(r.getAs[Array[Byte]](binIdx))
        Row(r.getLong(idIdx), hist.toSeq, checksum)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** "Resize" for image assets: nearest-neighbor subsample of the
    * post-header payload down to `targetBytes` pseudo-pixels, header
    * preserved with the width field rewritten. STUB decode semantics
    * (bytes as pixels); real Spark batching — same `mapPartitions` shape
    * as [[extractFeatures]], swap the body for a real scaler in
    * production. */
  def resizeStub(assets: DataFrame, targetBytes: Int): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val idIdx = assets.schema.fieldIndex("asset_id")
    val binIdx = assets.schema.fieldIndex("content")
    val rdd = assets.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bin = r.getAs[Array[Byte]](binIdx)
        val payload = bin.drop(16)
        val out =
          if (payload.length <= targetBytes) payload
          else Array.tabulate(targetBytes)(i => payload((i.toLong * payload.length / targetBytes).toInt))
        // pad: a truncated (<16-byte) input must not AIOOBE the header writes
        val header = bin.take(16).padTo(16, 0.toByte)
        // rewrite width (bytes 5-8 big-endian) to the resized size
        header(4) = (out.length >>> 24).toByte
        header(5) = (out.length >>> 16).toByte
        header(6) = (out.length >>> 8).toByte
        header(7) = out.length.toByte
        Row(r.getLong(idIdx), header ++ out)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** "Audio" feature extraction: treat the post-header payload as signed
    * 16-bit PCM samples and compute RMS energy + zero-crossing count per
    * asset — STUB decode semantics, real batched execution (same
    * `mapPartitions` contract as [[extractFeatures]]). */
  def audioStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("rms", DoubleType, nullable = false),
      StructField("zero_crossings", IntegerType, nullable = false)))
    val idIdx = assets.schema.fieldIndex("asset_id")
    val binIdx = assets.schema.fieldIndex("content")
    val rdd = assets.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bin = r.getAs[Array[Byte]](binIdx)
        val n = (bin.length - 16) / 2
        var sumSq = 0.0
        var zc = 0
        var prev = 0
        var i = 0
        while (i < n) {
          val s = ((bin(16 + 2 * i) << 8) | (bin(17 + 2 * i) & 0xff)).toShort.toInt
          sumSq += s.toDouble * s
          if (i > 0 && ((s >= 0) != (prev >= 0))) zc += 1
          prev = s
          i += 1
        }
        Row(r.getLong(idIdx), n, if (n == 0) 0.0 else math.sqrt(sumSq / n), zc)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling for "video" assets: cut the (post-header) payload into
    * `frameSize`-byte frames and keep every `stride`-th, as
    * `(asset_id, frame_idx, frame binary)` where `frame_idx` is the
    * ORIGINAL frame number (`pos · stride`) — downstream temporal
    * alignment needs source positions, not the sampled sequence's dense
    * indices. Pure expressions. */
  def sampleFrames(assets: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    val nFrames = ((length(col("content")) - 16) / frameSize).cast("int")
    val frames = when(nFrames <= 0, array().cast("array<binary>"))
      .otherwise(
        transform(
          sequence(lit(0), nFrames - 1, lit(stride)),
          i => substring(col("content"), lit(17) + i * frameSize, lit(frameSize))))
    assets
      .select(col("asset_id"), posexplode(frames))
      .select(col("asset_id"), (col("pos") * stride).as("frame_idx"), col("col").as("frame"))
      .filter(length(col("frame")) > 0)
  }
}
