package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video carried as opaque BINARY
 * columns with typed metadata, plus the decode / feature-extract /
 * resize / frame-sample operator surface a training-data pipeline needs.
 *
 * The media codec libraries are NOT available in this environment, so the
 * byte-decoding step is a clearly-marked STUB (`StubCodec`) — a
 * deterministic fake. Everything around it is real and tested: the
 * schema, the partition-batched iteration shape (decode cost amortized
 * over a batch, the Scala analogue of an Arrow-batched UDF), the feature
 * output shape, and the metadata-only transforms.
 *
 * Scale notes: decode runs inside `mapPartitions` — per-executor batches,
 * no driver involvement, no shuffle; media bytes never leave the
 * partition they were read in. Feature vectors (small) are what flows
 * downstream into the similarity/dedup ops.
 */
object Multimodal {

  /** Typed metadata carried alongside the opaque bytes. */
  case class MediaMeta(width: Int, height: Int, sampleRate: Int,
      nFrames: Int, mime: String)

  case class MediaRow(media_id: Long, modality: String, bytes: Array[Byte],
      meta: MediaMeta)

  case class MediaFeatures(media_id: Long, modality: String, byte_len: Long,
      features: Array[Double])

  /** Canonical media table schema (DataFrame form of MediaRow). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sampleRate", IntegerType),
      StructField("nFrames", IntegerType),
      StructField("mime", StringType))))))

  /**
   * ======================= STUB =======================
   * Stand-in for the real codec (JPEG/PNG decode, audio PCM decode,
   * video frame extraction). Deterministic fake: a 64-bit FNV-1a over
   * the bytes seeds a tiny LCG that emits `dim` pseudo-features in
   * [0, 1). Replace `decode` with the real library call; nothing else
   * in the pipeline changes.
   */
  object StubCodec {
    def fnv1a(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL)
        h *= 0x100000001b3L
        i += 1
      }
      h
    }

    /** STUB decode: real implementation would parse the media container
      * and run feature extraction; this emits deterministic pseudo-
      * features so the surrounding plumbing is testable. */
    def decode(bytes: Array[Byte], dim: Int): Array[Double] = {
      var state = fnv1a(bytes)
      Array.fill(dim) {
        state = state * 6364136223846793005L + 1442695040888963407L
        ((state >>> 11).toDouble / (1L << 53).toDouble)
      }
    }
  }

  /**
   * REAL codec for netpbm PGM (P5) grayscale images — pure byte
   * parsing per the public netpbm spec (magic, whitespace/#-comment
   * tolerant ASCII header: width height maxval, then one raw byte per
   * pixel for maxval ≤ 255). No image library involved, so unlike
   * `StubCodec` this decode path is fully real in this environment:
   * a header misread or pixel offset bug changes the extracted stats
   * and fails the oracle gate (`image_pgm_stats`).
   */
  object PgmCodec {
    def encode(width: Int, height: Int, maxVal: Int,
        px: Array[Int]): Array[Byte] = {
      require(width * height == px.length, "pixel count mismatch")
      require(maxVal >= 1 && maxVal <= 255, "1-byte PGM only")
      val header = s"P5\n$width $height\n$maxVal\n".getBytes("US-ASCII")
      header ++ px.map(_.toByte)
    }

    /** REAL nearest-neighbor resample on decoded pixels (row-major):
      * out(i,j) = in(⌊i·h/oh⌋, ⌊j·w/ow⌋) — pure integer index math, so
      * the resize is replayable by any engine as a positional pick.
      * Upgrades `resizePlan` from metadata-only to an actual pixel
      * transform for PGM inputs. */
    def nearestResize(width: Int, height: Int, px: Array[Int],
        outW: Int, outH: Int): Array[Int] = {
      require(outW > 0 && outH > 0 && width * height == px.length)
      val out = new Array[Int](outW * outH)
      var i = 0
      while (i < outH) {
        val si = i * height / outH
        var j = 0
        while (j < outW) {
          out(i * outW + j) = px(si * width + (j * width / outW))
          j += 1
        }
        i += 1
      }
      out
    }

    /** (width, height, maxVal, pixels 0..maxVal). */
    def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Int]) = {
      var i = 0
      def skipWs(): Unit = {
        var go = true
        while (go && i < bytes.length) {
          if (bytes(i) == '#') { // comment runs to end of line
            while (i < bytes.length && bytes(i) != '\n') i += 1
          } else if (Character.isWhitespace(bytes(i).toChar)) i += 1
          else go = false
        }
      }
      def token(): String = {
        skipWs()
        val s = i
        while (i < bytes.length &&
          !Character.isWhitespace(bytes(i).toChar)) i += 1
        new String(bytes, s, i - s, "US-ASCII")
      }
      require(token() == "P5", "not a raw (P5) PGM")
      val w = token().toInt
      val h = token().toInt
      val mv = token().toInt
      require(w > 0 && h > 0 && mv >= 1 && mv <= 255,
        s"unsupported PGM geometry ${w}x$h maxval $mv")
      i += 1 // exactly ONE whitespace byte separates maxval from raster
      require(bytes.length - i >= w * h, "truncated raster")
      val px = new Array[Int](w * h)
      var k = 0
      while (k < px.length) { px(k) = bytes(i + k) & 0xff; k += 1 }
      (w, h, mv, px)
    }
  }

  /**
   * REAL codec for canonical PCM16 mono WAV — pure byte parsing of the
   * public RIFF/WAVE layout (RIFF header, `fmt ` chunk: PCM format 1,
   * 1 channel, 16-bit little-endian samples in the `data` chunk). Like
   * `PgmCodec`, no audio library is involved: the audio decode path of
   * the multimodal surface is real, and the `audio_wav_stats` oracle
   * fails on any header-offset, chunk-walk or endianness bug.
   */
  object WavCodec {
    private def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

    def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val out = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
        .putShort(2).putShort(16) // block align, bits/sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(out.putShort)
      out.array()
    }

    /** (sampleRate, samples). Walks chunks, so extra chunks between
      * `fmt ` and `data` (LIST/INFO etc.) are tolerated per the spec. */
    def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
      val b = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def ascii(n: Int): String = {
        val a = new Array[Byte](n); b.get(a); new String(a, "US-ASCII")
      }
      require(ascii(4) == "RIFF", "not a RIFF file")
      b.getInt() // riff size
      require(ascii(4) == "WAVE", "not a WAVE file")
      var rate = -1
      while (b.remaining() >= 8) {
        val id = ascii(4)
        val len = b.getInt()
        id match {
          case "fmt " =>
            val fmt = b.getShort(); val ch = b.getShort()
            rate = b.getInt(); b.getInt(); b.getShort()
            val bits = b.getShort()
            require(fmt == 1 && ch == 1 && bits == 16,
              s"only PCM16 mono supported (fmt=$fmt ch=$ch bits=$bits)")
            b.position(b.position() + (len - 16)) // fmt extensions
          case "data" =>
            require(rate > 0, "data chunk before fmt chunk")
            require(b.remaining() >= len, "truncated data chunk")
            val samples = new Array[Short](len / 2)
            var i = 0
            while (i < samples.length) { samples(i) = b.getShort(); i += 1 }
            return (rate, samples)
          case _ => // skip unknown chunk (word-aligned)
            b.position(b.position() + len + (len & 1))
        }
      }
      throw new IllegalArgumentException("no data chunk")
    }
  }

  /**
   * REAL codec for uncompressed 24-bit BMP (BITMAPFILEHEADER +
   * BITMAPINFOHEADER, BI_RGB) — pure byte parsing of the public
   * Windows bitmap layout. BMP's parser-hostile quirks are all here
   * and all exercised: rows are stored BOTTOM-UP (negative height =
   * top-down, also handled), each row pads to a 4-byte boundary, and
   * channels are BGR order. Pixels are row-major top-down 0xRRGGBB
   * ints on the API side; the `image_bmp_stats` oracle's
   * position-weighted checksum fails on any flip, padding or
   * channel-order bug (plain sums would not — they are
   * position-blind).
   */
  object BmpCodec {
    def encode(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
      require(width > 0 && height > 0 && rgb.length == width * height,
        s"need width*height pixels, got ${rgb.length} for ${width}x$height")
      val pad = (4 - (width * 3) % 4) % 4
      val imgSize = (width * 3 + pad) * height
      val out = java.nio.ByteBuffer.allocate(54 + imgSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(54 + imgSize)
        .putInt(0).putInt(54)                       // reserved, pixel offset
        .putInt(40).putInt(width).putInt(height)    // info header, bottom-up
        .putShort(1).putShort(24)                   // planes, bpp
        .putInt(0).putInt(imgSize)                  // BI_RGB, image size
        .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette
      var y = height - 1
      while (y >= 0) {                              // bottom-up rows
        var x = 0
        while (x < width) {
          val p = rgb(y * width + x)
          out.put((p & 0xff).toByte)                // B
            .put(((p >> 8) & 0xff).toByte)          // G
            .put(((p >> 16) & 0xff).toByte)         // R
          x += 1
        }
        var k = 0
        while (k < pad) { out.put(0.toByte); k += 1 }
        y -= 1
      }
      out.array()
    }

    /** (width, height, row-major top-down 0xRRGGBB pixels). */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      val b = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(b.get() == 'B'.toByte && b.get() == 'M'.toByte,
        "not a BMP file")
      b.getInt(); b.getInt()                        // file size, reserved
      val pixelOff = b.getInt()
      val hdrSize = b.getInt()
      require(hdrSize >= 40, s"unsupported header size $hdrSize")
      val width = b.getInt()
      val rawHeight = b.getInt()
      val topDown = rawHeight < 0
      val height = math.abs(rawHeight)
      b.getShort()                                  // planes
      val bpp = b.getShort()
      val compression = b.getInt()
      require(bpp == 24 && compression == 0,
        s"only uncompressed 24-bit supported (bpp=$bpp comp=$compression)")
      val pad = (4 - (width * 3) % 4) % 4
      val px = new Array[Int](width * height)
      var row = 0
      while (row < height) {
        val y = if (topDown) row else height - 1 - row // storage → image row
        b.position(pixelOff + row * (width * 3 + pad))
        var x = 0
        while (x < width) {
          val blue = b.get() & 0xff
          val green = b.get() & 0xff
          val red = b.get() & 0xff
          px(y * width + x) = (red << 16) | (green << 8) | blue
          x += 1
        }
        row += 1
      }
      (width, height, px)
    }
  }

  /**
   * Partition-batched decode + feature extraction. The decoder runs once
   * per row inside a partition iterator — the batch shape a real codec
   * wants (shared decoder state per partition, zero per-row setup).
   */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int = 16,
      decoder: (Array[Byte], Int) => Array[Double] = StubCodec.decode)
      : Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would initialize the real codec here, once
      rows.map { r =>
        val bytes = if (r.bytes == null) Array.empty[Byte] else r.bytes
        MediaFeatures(r.media_id, r.modality, bytes.length.toLong,
          decoder(bytes, dim))
      }
    }
  }

  /** Metadata-only resize plan: target box with aspect preserved —
    * pure Column arithmetic, no decode needed. */
  def resizePlan(df: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width").cast("double")
    val h = col("meta.height").cast("double")
    val scale = least(lit(maxSide) / greatest(w, h), lit(1.0))
    df.withColumn("target_width", ceil(w * scale).cast("int"))
      .withColumn("target_height", ceil(h * scale).cast("int"))
  }

  /** Frame-sample plan for video rows: every `stride`-th frame index —
    * the work list a real frame extractor would consume. */
  def frameSamplePlan(df: DataFrame, stride: Int): DataFrame =
    df.withColumn("sample_frames",
      when(col("meta.nFrames") > 0,
        sequence(lit(0), col("meta.nFrames") - 1, lit(stride)))
        .otherwise(array().cast("array<int>")))

  /**
   * Binary ingestion from a text column — lets the binary-column path be
   * exercised (and oracle-verified) against the `documents` testdata:
   * bytes = UTF-8 encoding, content hash + byte length as the features.
   */
  def binarize(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      lit("text").as("modality"),
      encode(col(textCol), "UTF-8").as("bytes"))

  /** Oracle-verifiable binary features: byte length + md5 content hash
    * (md5 over UTF-8 bytes — identical in any engine). */
  def binaryFeatures(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol), col("modality"),
      length(col("bytes")).as("byte_len"),
      md5(col("bytes")).as("content_hash"))
}
