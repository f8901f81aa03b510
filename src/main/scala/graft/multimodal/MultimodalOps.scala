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
  * Image decode is REAL: [[decodeImageIO]] runs the JDK's built-in
  * `javax.imageio` codecs (PNG/BMP/GIF/JPEG, headless, no external native
  * libraries) through the same mapPartitions plumbing and extracts
  * pixel-derived features. Audio decode is REAL for RIFF/WAVE PCM:
  * [[decodeWavAudio]] parses through the JDK's `javax.sound.sampled`
  * (headless, pure file parsing) and extracts sample-domain features;
  * [[encodePcmWav]] writes genuine 44-byte-header PCM16 WAV bytes, so the
  * m03 round-trip is hash-checked end-to-end. Compressed audio (MP3/AAC)
  * and video codecs genuinely are not in this environment, so those decode
  * steps are clearly-marked deterministic STUBs (`decodeStub`,
  * `audioStats`, `sampleFrames` treat the payload bytes as fake
  * samples/frames behind a 16-byte header); everything around them —
  * schema, batching, partitioning, operator signatures — is real Spark and
  * is what would carry a libavcodec/ffmpeg call at 100 TB: swap the stub
  * body for a JNI decode and nothing else changes. (The driver-visible m01
  * query keeps the stub schema because the fixtures carry no media table.)
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

  /** REAL image decode via the JDK's built-in `javax.imageio` codecs —
    * PNG/BMP/GIF/JPEG readers ship with the JDK and run headless, so no
    * external native libraries are needed. Same executor-side
    * `mapPartitions` batch shape as [[extractFeatures]], but the features
    * are derived from actual decoded PIXELS: dimensions, color-component
    * count, a 16-bucket luminance histogram normalized to [0,1], and the
    * mean RGB channel values. A payload ImageIO cannot decode yields
    * `decoded = false` with null features rather than failing the
    * partition — at corpus scale one poison asset must not kill the job.
    *
    * Output: `(asset_id, decoded, width, height, channels,
    * lum_hist array<float>, mean_rgb array<float>)`.
    */
  def decodeImageIO(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("lum_hist", ArrayType(FloatType, containsNull = false), nullable = true),
      StructField("mean_rgb", ArrayType(FloatType, containsNull = false), nullable = true)))
    val src = df.select(col(idCol).cast("long"), col(binCol))
    val rdd = src.rdd.mapPartitions { rows =>
      // in-memory decode streams only: ImageIO's default disk-backed cache
      // would write a temp file per asset on every executor
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val bin = r.getAs[Array[Byte]](1)
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bin))
          catch { case _: Exception => null }
        if (img == null) Row(id, false, null, null, null, null, null)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val hist = new Array[Float](16)
          var sr = 0.0; var sg = 0.0; var sb = 0.0
          // bulk row fetch: one ColorModel conversion pass per row instead
          // of a virtual per-pixel getRGB call (~10× on megapixel photos)
          val rowBuf = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, rowBuf, 0, w)
            var x = 0
            while (x < w) {
              val rgb = rowBuf(x)
              val rr = (rgb >> 16) & 0xff
              val gg = (rgb >> 8) & 0xff
              val bb = rgb & 0xff
              // ITU-R BT.601 luma in integer fixed-point (299/587/114 per
              // mille): bit-exact on every platform — the float form lands
              // on .0 boundaries (e.g. gray 128) where FMA/vectorization
              // differences flip the bucket
              val lum = (299 * rr + 587 * gg + 114 * bb) / 1000
              hist(math.min(15, lum >> 4)) += 1f
              sr += rr; sg += gg; sb += bb
              x += 1
            }
            y += 1
          }
          val n = math.max(1, w * h)
          var j = 0
          while (j < 16) { hist(j) /= n.toFloat; j += 1 }
          Row(
            id, true, w, h, img.getColorModel.getNumComponents,
            hist.toSeq,
            Seq((sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Synthetic-asset generator — the encode twin of [[decodeImageIO]]:
    * one uniform-fill image per input row, compressed with the JDK ImageIO
    * codec on executors (`mapPartitions`). Materializes REAL encoded image
    * payloads inside a pipeline (codec round-trip tests, fixtures with no
    * media table) whose decoded features are predictable by construction.
    *
    * Input columns: `(asset_id long, width int, height int, r int, g int,
    * b int)`; output `(asset_id, content binary)`. */
  def encodeUniformImages(df: DataFrame, format: String = "png"): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val src = df.select(
      col("asset_id").cast("long"), col("width").cast("int"), col("height").cast("int"),
      col("r").cast("int"), col("g").cast("int"), col("b").cast("int"))
    val rdd = src.rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { row =>
        val w = row.getInt(1)
        val h = row.getInt(2)
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val packed = (row.getInt(3) << 16) | (row.getInt(4) << 8) | row.getInt(5)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, packed); x += 1 }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        // write() returns false (without throwing) when no writer is
        // registered for the format — fail fast instead of emitting empty
        // payloads indistinguishable from corrupt input downstream
        if (!javax.imageio.ImageIO.write(img, format, baos))
          throw new IllegalArgumentException(s"no ImageIO writer for format '$format'")
        Row(row.getLong(0), baos.toByteArray)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Block value of the deterministic pattern image: base gray in
    * [0, 240] from a QUADRATIC residue mod a prime (a linear map would
    * stride constantly per row and produce near-identical gradient signs
    * for every seed — measured: degenerate 3-bit hashes); `jitter == 1`
    * adds a per-block perturbation in [0, 15] — a near-duplicate whose
    * dHash flips only the few bits where adjacent base blocks sit within
    * the jitter amplitude (planted twins land at Hamming 0–2 vs ≥11
    * across seeds), the perceptual-dedup analog of a re-encoded or
    * slightly-edited image. All arithmetic is small exact integers, so an
    * ANSI SQL oracle (with CHECKED 64-bit math) can predict every pixel. */
  private[graft] def patternBlockValue(seed: Long, bx: Int, by: Int, jitter: Int): Int = {
    val a = seed * 31 + bx * 7 + by * 13
    (Math.floorMod(a * a * 7 + a * 13, 241L) +
      jitter * (Math.floorMod(a * a * 3 + a * 5, 241L) % 16)).toInt
  }

  /** Blocky pattern-image generator — the structured sibling of
    * [[encodeUniformImages]] for PERCEPTUAL pipelines: a `cols × rows`
    * grid of uniform `blockPx`-pixel gray squares whose values come from
    * [[patternBlockValue]]. Because each [[dHash64]] cell covers exactly
    * one block, the decoded hash is analytically predictable — the trick
    * that lets the m05 driver query hash-check a REAL PNG encode → decode
    * → downscale → dHash → banded-join pipeline against a pure-arithmetic
    * DuckDB oracle.
    *
    * Input `(asset_id long, seed long, jitter int)`; output
    * `(asset_id, content binary)` — real PNG bytes. */
  def encodePatternImages(
      df: DataFrame,
      blockPx: Int = 8,
      cols: Int = 9,
      rows: Int = 8,
      format: String = "png"): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val src = df.select(col("asset_id").cast("long"), col("seed").cast("long"), col("jitter").cast("int"))
    val rdd = src.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val (id, seed, jitter) = (r.getLong(0), r.getLong(1), r.getInt(2))
        val img = new java.awt.image.BufferedImage(
          cols * blockPx, rows * blockPx, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var by = 0
        while (by < rows) {
          var bx = 0
          while (bx < cols) {
            val v = patternBlockValue(seed, bx, by, jitter)
            val packed = (v << 16) | (v << 8) | v
            var y = by * blockPx
            while (y < (by + 1) * blockPx) {
              var x = bx * blockPx
              while (x < (bx + 1) * blockPx) { img.setRGB(x, y, packed); x += 1 }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        if (!javax.imageio.ImageIO.write(img, format, baos))
          throw new IllegalArgumentException(s"no ImageIO writer for format '$format'")
        Row(id, baos.toByteArray)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** 64-bit difference hash (dHash — the standard public perceptual image
    * fingerprint): decode, integer-mean-downscale to a `cols × rows` luma
    * grid, then bit `y*(cols−1)+x` = 1 iff `cell(x+1, y) > cell(x, y)`.
    * Robust to re-encoding and small edits because only gradient SIGNS
    * survive. Decode is the REAL JDK ImageIO path ([[decodeImageIO]]'s
    * codecs) through the same mapPartitions plumbing; the luma and means
    * are exact integer arithmetic so the hash is platform-stable.
    * Undecodable payloads yield a null hash instead of failing the
    * partition. Output `(asset_id long, dhash long)` — with the default
    * 9×8 grid, exactly 64 comparisons. */
  def dHash64(df: DataFrame, idCol: String, binCol: String, cols: Int = 9, rows: Int = 8): DataFrame = {
    require((cols - 1) * rows <= 64, s"dHash grid ${cols}x$rows exceeds 64 bits")
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = true)))
    val src = df.select(col(idCol).cast("long"), col(binCol))
    val rdd = src.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          catch { case _: Exception => null }
        if (img == null || img.getWidth < cols || img.getHeight < rows) Row(id, null)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val cellW = w / cols
          val cellH = h / rows
          val cells = Array.ofDim[Long](rows, cols)
          val rowBuf = new Array[Int](w)
          var y = 0
          while (y < rows * cellH) {
            img.getRGB(0, y, w, 1, rowBuf, 0, w)
            var x = 0
            while (x < cols * cellW) {
              val rgb = rowBuf(x)
              // same fixed-point BT.601 luma as decodeImageIO — bit-exact
              val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
              cells(y / cellH)(x / cellW) += lum
              x += 1
            }
            y += 1
          }
          val perCell = cellW.toLong * cellH
          var hash = 0L
          var cy = 0
          while (cy < rows) {
            var cx = 0
            while (cx < cols - 1) {
              if (cells(cy)(cx + 1) / perCell > cells(cy)(cx) / perCell)
                hash |= 1L << (cy * (cols - 1) + cx)
              cx += 1
            }
            cy += 1
          }
          Row(id, hash)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** One 44-byte RIFF/PCM16-mono header + room for `n` samples — the
    * single header writer both WAV encoders share (a header fix must not
    * be able to drift between them). Caller appends the little-endian
    * samples. */
  private def wavPcm16Buffer(sr: Int, n: Int): java.nio.ByteBuffer = {
    val data = 2 * n
    val buf = java.nio.ByteBuffer.allocate(44 + data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + data).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sr)
      .putInt(sr * 2) // byte rate
      .putShort(2)    // block align
      .putShort(16)   // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(data)
    buf
  }

  /** RIFF/WAVE PCM16 mono encoder over a spec frame
    * `(asset_id long, n_samples int, sample_rate int, seed long)`:
    * sample `i` is the deterministic full-range int16
    * `floorMod(seed·31 + i·7919, 65536) − 32768`, wrapped in a genuine
    * 44-byte RIFF header + little-endian PCM payload. Real bytes any WAV
    * reader accepts — the encode half of the m03 codec round-trip (the
    * audio analog of [[encodeUniformImages]]). */
  def encodePcmWav(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val src = df.select(
      col("asset_id").cast("long"), col("n_samples").cast("int"),
      col("sample_rate").cast("int"), col("seed").cast("long"))
    val rdd = src.rdd.mapPartitions { rows =>
      rows.map { row =>
        val n = row.getInt(1)
        val sr = row.getInt(2)
        val seed = row.getLong(3)
        val buf = wavPcm16Buffer(sr, n)
        var i = 0
        while (i < n) {
          // floorMod, not %: JVM % preserves the dividend's sign, so a
          // negative seed would push the value below -32768 and .toShort
          // would silently wrap it away from the documented formula
          buf.putShort((java.lang.Math.floorMod(seed * 31L + i * 7919L, 65536L) - 32768L).toShort)
          i += 1
        }
        Row(row.getLong(0), buf.array())
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** [[encodePcmWav]]'s caller-supplied-waveform twin: writes the GIVEN
    * int16 samples (input `(asset_id long, sample_rate int,
    * samples array<int>)`, values must fit a short — out-of-range values
    * fail loudly rather than wrap) as a genuine RIFF/PCM16 mono WAV.
    * Lets a query plant structured waveforms (silence runs, energy
    * bursts) that the seeded-noise encoder cannot express, while the
    * decode side stays byte-identical PCM16. Same mapPartitions batch
    * shape as [[encodePcmWav]]. */
  def encodePcmWavSamples(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val src = df.select(
      col("asset_id").cast("long"), col("sample_rate").cast("int"), col("samples").cast("array<int>"))
    val rdd = src.rdd.mapPartitions { rows =>
      rows.map { row =>
        val sr = row.getInt(1)
        val samples = row.getSeq[Int](2)
        val buf = wavPcm16Buffer(sr, samples.length)
        samples.foreach { s =>
          require(s >= Short.MinValue && s <= Short.MaxValue,
            s"sample $s out of int16 range (asset ${row.getLong(0)})")
          buf.putShort(s.toShort)
        }
        Row(row.getLong(0), buf.array())
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL audio downsampling — the m07 resize story for sound: decode
    * PCM16 mono WAV through `javax.sound.sampled`, decimate by integer
    * block mean (`floorDiv` of each `factor`-sample block — exact integer
    * arithmetic, no resampling filter, platform-stable), re-encode as a
    * genuine RIFF/PCM16 WAV at `rate / factor`. Trailing samples that
    * don't fill a block are dropped (crop-to-multiple). Non-PCM16 or
    * undecodable payloads are dropped from the output. Same mapPartitions
    * contract as [[audioFrameFeatures]]. */
  def decimatePcmWav(df: DataFrame, idCol: String, binCol: String, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val src = df.select(col(idCol).cast("long"), col(binCol))
    val rdd = src.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val ais =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          catch { case _: Exception => null }
        val fmt = if (ais == null) null else ais.getFormat
        if (fmt == null || fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          || fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) {
          if (ais != null) ais.close()
          None
        } else {
          val pcm = ais.readAllBytes()
          ais.close()
          val in = java.nio.ByteBuffer.wrap(pcm).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN)
          val n = pcm.length / 2
          val outN = n / factor
          val outRate = math.max(1, fmt.getSampleRate.toInt / factor)
          val buf = wavPcm16Buffer(outRate, outN)
          var j = 0
          while (j < outN) {
            var sum = 0L
            var i = j * factor
            while (i < (j + 1) * factor) { sum += in.getShort(2 * i); i += 1 }
            // floorDiv, not /: JVM / truncates toward zero, so negative
            // block sums would round the other way than the floor the
            // SQL replay computes
            buf.putShort(java.lang.Math.floorDiv(sum, factor.toLong).toShort)
            j += 1
          }
          Some(Row(id, buf.array()))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL WAV decode through the JDK's `javax.sound.sampled` (headless —
    * audio file parsing needs no sound device): format metadata comes from
    * the parsed header, samples from the decoded PCM stream, features are
    * pure integer math (`min`/`max`/`sum` over int16 samples) so any
    * engine reproducing the sample formula lands on identical values.
    * Multi-channel semantics: `n_samples` is frames PER CHANNEL while
    * `s_min`/`s_max`/`s_sum` span ALL interleaved channel samples (a
    * per-frame mean is `s_sum / (n_samples · channels)`, not
    * `s_sum / n_samples`). Undecodable payloads yield `decoded = false`
    * nulls, like [[decodeImageIO]]. */
  def decodeWavAudio(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("n_samples", IntegerType, nullable = true),
      StructField("s_min", IntegerType, nullable = true),
      StructField("s_max", IntegerType, nullable = true),
      StructField("s_sum", LongType, nullable = true)))
    val src = df.select(col(idCol).cast("long"), col(binCol))
    val rdd = src.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bin = r.getAs[Array[Byte]](1)
        val ais =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bin))
          catch { case _: Exception => null }
        val fmt = if (ais == null) null else ais.getFormat
        if (fmt == null || fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          || fmt.getSampleSizeInBits != 16)
          Row(id, false, null, null, null, null, null, null)
        else {
          val pcm = ais.readAllBytes()
          ais.close()
          val bb = java.nio.ByteBuffer.wrap(pcm).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN)
          val n = pcm.length / 2
          var mn = Int.MaxValue; var mx = Int.MinValue; var sum = 0L
          var i = 0
          while (i < n) {
            val s: Int = bb.getShort(2 * i).toInt
            if (s < mn) mn = s
            if (s > mx) mx = s
            sum += s
            i += 1
          }
          val nPer = n / fmt.getChannels
          Row(id, true, fmt.getSampleRate.toInt, fmt.getChannels, nPer,
            if (n == 0) null else mn, if (n == 0) null else mx, sum)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-frame audio analysis over decoded PCM16 WAV content — the
    * audio-curation primitive (silence trimming, energy gating, crude
    * voice-activity detection all read these): samples split into
    * non-overlapping `frameLen`-sample frames, each frame reduced to its
    * energy (Σs², exact integer — 16-bit samples keep the per-frame sum
    * below 2⁶³ for any realistic frame) and its zero-crossing count
    * (#{i : (sᵢ<0) ≠ (sᵢ₋₁<0)} within the frame). All-integer output, so
    * an oracle can replay every value from the sample formula alone.
    * One row per frame; undecodable/non-PCM16 assets emit nothing.
    * Same mapPartitions shape as [[decodeWavAudio]] — a genuine
    * imperative byte walk, row-parallel, no shuffle. */
  def audioFrameFeatures(df: DataFrame, idCol: String, binCol: String, frameLen: Int): DataFrame = {
    require(frameLen > 0, s"frameLen must be positive, got $frameLen")
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n", IntegerType, nullable = false),
      StructField("sum_sq", LongType, nullable = false),
      StructField("zero_cross", IntegerType, nullable = false)))
    val src = df.select(col(idCol).cast("long"), col(binCol))
    val rdd = src.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bin = r.getAs[Array[Byte]](1)
        val ais =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bin))
          catch { case _: Exception => null }
        val fmt = if (ais == null) null else ais.getFormat
        if (fmt == null || fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          || fmt.getSampleSizeInBits != 16) {
          if (ais != null) ais.close() // reject path must not leak the decoder stream
          Iterator.empty
        } else {
          val pcm = ais.readAllBytes()
          ais.close()
          val bb = java.nio.ByteBuffer.wrap(pcm).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN)
          val n = pcm.length / 2
          val nFrames = (n + frameLen - 1) / frameLen
          (0 until nFrames).iterator.map { f =>
            val lo = f * frameLen
            val hi = math.min(n, lo + frameLen)
            var sumSq = 0L
            var zc = 0
            var i = lo
            while (i < hi) {
              val s: Int = bb.getShort(2 * i).toInt
              sumSq += s.toLong * s.toLong
              if (i > lo && ((s < 0) != (bb.getShort(2 * (i - 1)).toInt < 0))) zc += 1
              i += 1
            }
            Row(id, f, hi - lo, sumSq, zc)
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
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
  /** REAL image thumbnailing — the resize step of an ingest pipeline run
    * through the genuine JDK codec path: ImageIO decode → per-channel
    * integer block mean over `factor × factor` tiles (floor division —
    * platform-stable, no float resampling kernel) → PNG re-encode. Output
    * `(asset_id, content)` with real PNG bytes 1/factor² the pixel count;
    * trailing pixels that don't fill a tile are dropped (the standard
    * crop-to-multiple). Undecodable or smaller-than-one-tile payloads are
    * dropped from the output rather than failing the partition. Same
    * mapPartitions contract as [[decodeImageIO]] — batch-parallel, no
    * driver involvement, the shape that carries a libvips/ffmpeg thumb
    * farm at 100 TB. */
  def resizeBlockMean(df: DataFrame, idCol: String, binCol: String, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val src = df.select(col(idCol).cast("long"), col(binCol))
    val rdd = src.rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(0)
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          catch { case _: Exception => null }
        if (img == null || img.getWidth < factor || img.getHeight < factor) None
        else {
          val ow = img.getWidth / factor
          val oh = img.getHeight / factor
          val area = factor.toLong * factor
          val sumsR = Array.ofDim[Long](oh, ow)
          val sumsG = Array.ofDim[Long](oh, ow)
          val sumsB = Array.ofDim[Long](oh, ow)
          val rowBuf = new Array[Int](img.getWidth)
          var y = 0
          while (y < oh * factor) {
            img.getRGB(0, y, img.getWidth, 1, rowBuf, 0, img.getWidth)
            var x = 0
            while (x < ow * factor) {
              val rgb = rowBuf(x)
              sumsR(y / factor)(x / factor) += (rgb >> 16) & 0xff
              sumsG(y / factor)(x / factor) += (rgb >> 8) & 0xff
              sumsB(y / factor)(x / factor) += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val out = new java.awt.image.BufferedImage(ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var oy = 0
          while (oy < oh) {
            var ox = 0
            while (ox < ow) {
              val rr = (sumsR(oy)(ox) / area).toInt
              val gg = (sumsG(oy)(ox) / area).toInt
              val bb = (sumsB(oy)(ox) / area).toInt
              out.setRGB(ox, oy, (rr << 16) | (gg << 8) | bb)
              ox += 1
            }
            oy += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", baos)
          Some(Row(id, baos.toByteArray))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

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

  /** REAL multi-frame (animated) GIF encode via the JDK's ImageIO sequence
    * writer — the video stand-in the stock JVM can actually compress: each
    * asset becomes one GIF whose frames are LZW-encoded indexed rasters.
    * Frames are uniform fills drawn through an explicit 2-entry
    * `IndexColorModel` (fill color at index 0), so palette quantization
    * cannot perturb a pixel and the decoded frame means are
    * integer-exact — the construction that lets a driver oracle pin a
    * genuine compressed-video codec path (encode → LZW → decode)
    * end-to-end. Input `(asset_id long, width int, height int,
    * fr_r array<int>, fr_g array<int>, fr_b array<int>)` (per-frame fill
    * channels, equal lengths); output `(asset_id, content binary)` — real
    * GIF89a bytes, one image block per frame. Same executor-side
    * mapPartitions batch shape as [[encodeUniformImages]]. */
  def encodeAnimatedGif(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val src = df.select(
      col("asset_id").cast("long"), col("width").cast("int"), col("height").cast("int"),
      col("fr_r").cast("array<int>"), col("fr_g").cast("array<int>"), col("fr_b").cast("array<int>"))
    val rdd = src.rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { row =>
        val w = row.getInt(1)
        val h = row.getInt(2)
        val rs = row.getSeq[Int](3)
        val gs = row.getSeq[Int](4)
        val bs = row.getSeq[Int](5)
        require(rs.length == gs.length && gs.length == bs.length && rs.nonEmpty,
          s"frame channel arrays must be equal-length and non-empty (asset ${row.getLong(0)})")
        val it = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
        if (!it.hasNext) throw new IllegalStateException("no ImageIO writer for format 'gif'")
        val writer = it.next()
        val baos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
        try {
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var k = 0
          while (k < rs.length) {
            val icm = new java.awt.image.IndexColorModel(8, 2,
              Array(rs(k).toByte, 0.toByte), Array(gs(k).toByte, 0.toByte), Array(bs(k).toByte, 0.toByte))
            // raster default-initializes to palette index 0 = the fill
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
            k += 1
          }
          writer.endWriteSequence()
        } finally { ios.close(); writer.dispose() }
        Row(row.getLong(0), baos.toByteArray)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL multi-frame GIF decode — the frame-extraction half of the video
    * stand-in: every stored image block of each GIF payload is decoded
    * through the JDK reader and reduced to exact integer per-frame
    * features (dimensions plus per-channel pixel sums; a frame mean is
    * `sum_x / n_px`). One output row per decoded frame, so downstream
    * frame-sampling/dedup operators can treat frames as first-class rows.
    * Undecodable payloads yield a single `decoded = false` row (poison
    * assets must not kill a 100 TB scan); a genuinely imperative per-byte
    * walk, row-parallel, no shuffle — the mapPartitions slot a JNI
    * libavcodec call would occupy unchanged. */
  def decodeGifFrames(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("frame", IntegerType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sum_r", LongType, nullable = true),
      StructField("sum_g", LongType, nullable = true),
      StructField("sum_b", LongType, nullable = true),
      StructField("n_px", IntegerType, nullable = true)))
    val src = df.select(col(idCol).cast("long"), col(binCol))
    val rdd = src.rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(0)
        val out =
          try {
            val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
            if (!it.hasNext) Nil
            else {
              val reader = it.next()
              try {
                reader.setInput(javax.imageio.ImageIO.createImageInputStream(
                  new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1))))
                val n = reader.getNumImages(true)
                (0 until n).map { k =>
                  val img = reader.read(k)
                  val w = img.getWidth
                  val h = img.getHeight
                  var sr = 0L; var sg = 0L; var sb = 0L
                  var y = 0
                  while (y < h) {
                    var x = 0
                    while (x < w) {
                      val p = img.getRGB(x, y)
                      sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                      x += 1
                    }
                    y += 1
                  }
                  Row(id, true, k, w, h, sr, sg, sb, w * h)
                }
              } finally reader.dispose()
            }
          } catch { case _: Exception => Nil }
        if (out.isEmpty) Seq(Row(id, false, null, null, null, null, null, null, null)) else out
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL compressed-audio codec round-trip through the JDK's G.711 µ-law
    * converter (`javax.sound.sampled` ships a ULAW
    * `FormatConversionProvider`; headless, pure byte transcoding):
    * deterministic int16 samples → µ-law (8 bits/sample — genuine 2:1
    * lossy compression) → back to PCM16, validated against the ORIGINAL
    * samples. µ-law decode values are a codec lookup table, so they cross
    * an external oracle as bound flags, not raw values (the v06
    * technique): over |s| ≤ 30000 the JDK codec's round-trip error is
    * ≤ 512 (half the top-segment quantization step; measured exhaustively
    * over all 16-bit values) and never flips a sign — samples are
    * generated in that range because full-scale |s| > 32124 values
    * saturate-wrap in the codec's clip region. `ulaw_bytes` pins the
    * compression ratio exactly (1 byte/sample vs 2). Input `(asset_id
    * long, n_samples int, sample_rate int, seed long)`; samples are
    * `floorMod(seed·31 + i·7919, 60001) − 30000`. Output `(asset_id,
    * n_samples, sample_rate, ulaw_bytes, max_abs_err, sign_viol)` — all
    * exact integers. */
  def ulawRoundtrip(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("ulaw_bytes", IntegerType, nullable = false),
      StructField("max_abs_err", IntegerType, nullable = false),
      StructField("sign_viol", IntegerType, nullable = false)))
    val src = df.select(
      col("asset_id").cast("long"), col("n_samples").cast("int"),
      col("sample_rate").cast("int"), col("seed").cast("long"))
    val rdd = src.rdd.mapPartitions { rows =>
      import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
      rows.map { row =>
        val n = row.getInt(1)
        val sr = row.getInt(2)
        val seed = row.getLong(3)
        val orig = new Array[Int](n)
        val pcm = new Array[Byte](2 * n)
        var i = 0
        while (i < n) {
          val v = (java.lang.Math.floorMod(seed * 31L + i * 7919L, 60001L) - 30000L).toInt
          orig(i) = v
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, sr.toFloat, 16, 1, 2, sr.toFloat, false)
        val ulawFmt = new AudioFormat(AudioFormat.Encoding.ULAW, sr.toFloat, 8, 1, 1, sr.toFloat, false)
        val ulaw = AudioSystem.getAudioInputStream(ulawFmt,
          new AudioInputStream(new java.io.ByteArrayInputStream(pcm), pcmFmt, n)).readAllBytes()
        val backAis = AudioSystem.getAudioInputStream(pcmFmt,
          new AudioInputStream(new java.io.ByteArrayInputStream(ulaw), ulawFmt, ulaw.length))
        val back = backAis.readAllBytes()
        val big = backAis.getFormat.isBigEndian
        var maxErr = 0
        var signViol = 0
        i = 0
        while (i < n) {
          val lo = back(2 * i) & 0xff
          val hi = back(2 * i + 1) & 0xff
          val d = (if (big) (lo << 8) | hi else (hi << 8) | lo).toShort.toInt
          val e = math.abs(d - orig(i))
          if (e > maxErr) maxErr = e
          if ((orig(i) > 0 && d < 0) || (orig(i) < 0 && d > 0)) signViol += 1
          i += 1
        }
        Row(row.getLong(0), n, sr, ulaw.length, maxErr, signViol)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
