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
   * REAL codec for baseline TIFF (little-endian "II*\0", the seventh
   * pure-JVM container and the first TAG-DIRECTORY one): unlike the
   * fixed-layout rasters, a TIFF reader must WALK metadata — an IFD of
   * (tag, type, count, value-or-offset) entries whose values live
   * inline when ≤4 bytes and behind file offsets otherwise — and then
   * reassemble the image from STRIPS scattered anywhere in the file.
   * The encoder deliberately writes one strip per TWO rows (so every
   * ≥3-row image has several strips) and puts the out-of-line arrays
   * (BitsPerSample, StripOffsets, StripByteCounts) between the pixel
   * data and the IFD: a reader that assumes contiguous pixels or
   * inline-only values fails the position-weighted oracle checksum.
   * 8-bit RGB, Compression=1 (none), PhotometricInterpretation=2.
   */
  object TiffCodec {
    private val RowsPerStrip = 2

    private final class W(val out: java.io.ByteArrayOutputStream) {
      def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
      def size: Int = out.size()
    }

    def encode(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
      require(width > 0 && height > 0 && rgb.length == width * height,
        s"need width*height pixels, got ${rgb.length} for ${width}x$height")
      val w = new W(new java.io.ByteArrayOutputStream())
      w.out.write('I'); w.out.write('I'); w.u16(42)
      val nStrips = (height + RowsPerStrip - 1) / RowsPerStrip
      // layout: header(8) | strips | bitsPerSample | [stripOffsets,
      // stripByteCounts when >1 strip] | IFD
      val stripOffsets = new Array[Int](nStrips)
      val stripBytes = new Array[Int](nStrips)
      var off = 8
      var s = 0
      while (s < nStrips) {
        val rows = math.min(RowsPerStrip, height - s * RowsPerStrip)
        stripOffsets(s) = off
        stripBytes(s) = rows * width * 3
        off += stripBytes(s)
        s += 1
      }
      val bpsOff = off; off += 6                    // 3 SHORTs
      val soOff = off
      val sbOff = if (nStrips > 1) { off += 4 * nStrips; off } else off
      if (nStrips > 1) off += 4 * nStrips
      val ifdOff = off
      w.u32(ifdOff)
      var p = 0                                     // strips, top-down rows
      while (p < rgb.length) {
        val v = rgb(p)
        w.out.write((v >> 16) & 0xff); w.out.write((v >> 8) & 0xff)
        w.out.write(v & 0xff)
        p += 1
      }
      w.u16(8); w.u16(8); w.u16(8)                  // BitsPerSample array
      if (nStrips > 1) {
        stripOffsets.foreach(w.u32)
        stripBytes.foreach(w.u32)
      }
      // IFD: entry count, 12-byte entries ascending by tag, next-IFD 0
      def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
        w.u16(tag); w.u16(typ); w.u32(count); w.u32(value)
      }
      w.u16(9)
      entry(256, 4, 1, width)                       // ImageWidth LONG
      entry(257, 4, 1, height)                      // ImageLength LONG
      entry(258, 3, 3, bpsOff)                      // BitsPerSample → offset
      entry(259, 3, 1, 1)                           // Compression: none
      entry(262, 3, 1, 2)                           // Photometric: RGB
      entry(273, 4, nStrips,                        // StripOffsets
        if (nStrips > 1) soOff else stripOffsets(0))
      entry(277, 3, 1, 3)                           // SamplesPerPixel
      entry(278, 4, 1, RowsPerStrip)                // RowsPerStrip
      entry(279, 4, nStrips,                        // StripByteCounts
        if (nStrips > 1) sbOff else stripBytes(0))
      w.u32(0)
      w.out.toByteArray
    }

    /** (width, height, row-major top-down 0xRRGGBB pixels). */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      def u32(o: Int): Int = u16(o) | (u16(o + 2) << 16)
      require(bytes.length >= 8 && bytes(0) == 'I'.toByte &&
        bytes(1) == 'I'.toByte && u16(2) == 42, "not a little-endian TIFF")
      val ifd = u32(4)
      val n = u16(ifd)
      // tag → (type, count, raw value/offset field position)
      var width = -1; var height = -1; var rowsPerStrip = Int.MaxValue
      var compression = 1; var photometric = 2; var samples = 3
      var soPos = -1; var soType = 0; var soCount = 0
      var sbPos = -1; var sbType = 0; var sbCount = 0
      var bpsOk = true
      // a SHORT/LONG array value: inline when it fits 4 bytes, else
      // the field holds an offset — the TIFF rule this decoder exists
      // to exercise
      def arrayAt(pos: Int, typ: Int, count: Int): Array[Int] = {
        val sz = (if (typ == 3) 2 else 4) * count
        val base = if (sz <= 4) pos else u32(pos)
        Array.tabulate(count)(i =>
          if (typ == 3) u16(base + 2 * i) else u32(base + 4 * i))
      }
      var e = 0
      while (e < n) {
        val off = ifd + 2 + 12 * e
        val tag = u16(off); val typ = u16(off + 2)
        val count = u32(off + 4); val vpos = off + 8
        def scalar: Int = if (typ == 3) u16(vpos) else u32(vpos)
        tag match {
          case 256 => width = scalar
          case 257 => height = scalar
          case 258 => bpsOk = arrayAt(vpos, typ, count).forall(_ == 8)
          case 259 => compression = scalar
          case 262 => photometric = scalar
          case 273 => soPos = vpos; soType = typ; soCount = count
          case 277 => samples = scalar
          case 278 => rowsPerStrip = scalar
          case 279 => sbPos = vpos; sbType = typ; sbCount = count
          case _ => ()                              // unknown tags skip
        }
        e += 1
      }
      require(width > 0 && height > 0 && soPos >= 0 && sbPos >= 0,
        "TIFF missing required tags")
      require(compression == 1 && photometric == 2 && samples == 3 && bpsOk,
        s"only uncompressed 8-bit RGB supported (comp=$compression " +
          s"photo=$photometric spp=$samples)")
      val offsets = arrayAt(soPos, soType, soCount)
      val counts = arrayAt(sbPos, sbType, sbCount)
      require(offsets.length == counts.length, "strip tables disagree")
      val px = new Array[Int](width * height)
      var strip = 0
      var row = 0
      while (strip < offsets.length) {
        var o = offsets(strip)
        val end = o + counts(strip)
        while (o < end && row < height) {
          var x = 0
          while (x < width) {
            px(row * width + x) = ((bytes(o) & 0xff) << 16) |
              ((bytes(o + 1) & 0xff) << 8) | (bytes(o + 2) & 0xff)
            o += 3; x += 1
          }
          row += 1
        }
        strip += 1
      }
      require(row == height, s"strips carried $row of $height rows")
      (width, height, px)
    }
  }

  /**
   * REAL codec for QOI ("Quite OK Image", qoiformat.org) — the fourth
   * pure-JVM container, and the first genuinely COMPRESSED one: unlike
   * PGM/WAV/BMP (fixed-layout rasters), QOI round-trips through a
   * stateful chunk stream (running 64-slot color index, 2-bit DIFF,
   * LUMA, run-length ops), so the decoder must carry mutable state
   * byte-to-byte — an off-by-one in ANY chunk shifts every later pixel
   * and fails the position-weighted oracle checksum. RGB (3-channel)
   * subset; alpha fixed at 255 per the spec's RGB mode.
   *
   * Layout (public spec): 14-byte header (magic "qoif", width u32 BE,
   * height u32 BE, channels, colorspace), chunk stream, 8-byte end
   * marker (seven 0x00 then 0x01). Chunks: QOI_OP_RGB 0xFE+r,g,b;
   * QOI_OP_INDEX 0b00xxxxxx (slot = (3r+5g+7b+11a) % 64);
   * QOI_OP_DIFF 0b01drdgdb (2-bit channel deltas, bias 2);
   * QOI_OP_LUMA 0b10 + 6-bit dg (bias 32) + byte (dr-dg|db-dg, bias 8);
   * QOI_OP_RUN 0b11run (1..62, bias -1). Previous pixel seeds to
   * (0,0,0,255); the index array to zeros.
   */
  object QoiCodec {
    private def hash(r: Int, g: Int, b: Int): Int =
      (r * 3 + g * 5 + b * 7 + 255 * 11) % 64

    /** Encode row-major top-down 0xRRGGBB pixels as RGB-mode QOI,
      * using every op the spec offers (RUN > INDEX > DIFF > LUMA > RGB,
      * the reference encoder's preference order). */
    def encode(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
      require(width > 0 && height > 0 && rgb.length == width * height,
        s"need width*height pixels, got ${rgb.length} for ${width}x$height")
      val out = new java.io.ByteArrayOutputStream(14 + rgb.length + 8)
      out.write('q'); out.write('o'); out.write('i'); out.write('f')
      def be32(v: Int): Unit = { out.write(v >>> 24); out.write((v >>> 16) & 0xff)
        out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
      be32(width); be32(height)
      out.write(3); out.write(0)                    // RGB, sRGB+linear alpha
      val index = new Array[Int](64)                // packed rgb, 0 = empty≡black
      var pr = 0; var pg = 0; var pb = 0            // previous pixel (0,0,0)
      var run = 0
      var i = 0
      while (i < rgb.length) {
        val p = rgb(i)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        if (r == pr && g == pg && b == pb) {
          run += 1
          if (run == 62) { out.write(0xc0 | (run - 1)); run = 0 }
        } else {
          if (run > 0) { out.write(0xc0 | (run - 1)); run = 0 }
          val slot = hash(r, g, b)
          val packed = (r << 16) | (g << 8) | b
          if (index(slot) == packed) out.write(slot) // QOI_OP_INDEX
          else {
            index(slot) = packed
            val dr = r - pr; val dg = g - pg; val db = b - pb
            if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 &&
                db >= -2 && db <= 1)
              out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            else {
              val drg = dr - dg; val dbg = db - dg
              if (dg >= -32 && dg <= 31 && drg >= -8 && drg <= 7 &&
                  dbg >= -8 && dbg <= 7) {
                out.write(0x80 | (dg + 32))
                out.write(((drg + 8) << 4) | (dbg + 8))
              } else { out.write(0xfe); out.write(r); out.write(g); out.write(b) }
            }
          }
          pr = r; pg = g; pb = b
        }
        i += 1
      }
      if (run > 0) out.write(0xc0 | (run - 1))
      (0 until 7).foreach(_ => out.write(0)); out.write(1) // end marker
      out.toByteArray
    }

    /** (width, height, row-major top-down 0xRRGGBB pixels). */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      require(bytes.length >= 22, "truncated QOI file")
      require(bytes(0) == 'q' && bytes(1) == 'o' && bytes(2) == 'i' &&
        bytes(3) == 'f', "not a QOI file")
      def be32(o: Int): Int = ((bytes(o) & 0xff) << 24) |
        ((bytes(o + 1) & 0xff) << 16) | ((bytes(o + 2) & 0xff) << 8) |
        (bytes(o + 3) & 0xff)
      val width = be32(4); val height = be32(8)
      val channels = bytes(12) & 0xff
      require(width > 0 && height > 0 && (channels == 3 || channels == 4),
        s"bad geometry ${width}x$height channels=$channels")
      require(channels == 3, "RGB-mode subset (alpha unsupported)")
      val n = width * height
      val px = new Array[Int](n)
      val index = new Array[Int](64)
      var pr = 0; var pg = 0; var pb = 0
      var i = 14
      var k = 0
      while (k < n) {
        require(i < bytes.length - 8, "chunk stream ran past end marker")
        val b0 = bytes(i) & 0xff; i += 1
        if (b0 == 0xfe) {                            // QOI_OP_RGB
          pr = bytes(i) & 0xff; pg = bytes(i + 1) & 0xff
          pb = bytes(i + 2) & 0xff; i += 3
        } else if (b0 == 0xff) {
          throw new IllegalArgumentException("RGBA chunk in RGB stream")
        } else (b0 >> 6) match {
          case 0 =>                                  // QOI_OP_INDEX
            val v = index(b0)
            pr = (v >> 16) & 0xff; pg = (v >> 8) & 0xff; pb = v & 0xff
          case 1 =>                                  // QOI_OP_DIFF
            pr = (pr + ((b0 >> 4) & 3) - 2) & 0xff
            pg = (pg + ((b0 >> 2) & 3) - 2) & 0xff
            pb = (pb + (b0 & 3) - 2) & 0xff
          case 2 =>                                  // QOI_OP_LUMA
            val dg = (b0 & 0x3f) - 32
            val b1 = bytes(i) & 0xff; i += 1
            pg = (pg + dg) & 0xff
            pr = (pr + dg + ((b1 >> 4) & 0xf) - 8) & 0xff
            pb = (pb + dg + (b1 & 0xf) - 8) & 0xff
          case _ =>                                  // QOI_OP_RUN
            var run = (b0 & 0x3f)                    // bias -1: emits run+1
            while (run > 0 && k < n - 1) {
              px(k) = (pr << 16) | (pg << 8) | pb; k += 1; run -= 1
            }
            require(run == 0, "run overflows pixel count")
        }
        index(hash(pr, pg, pb)) = (pr << 16) | (pg << 8) | pb
        px(k) = (pr << 16) | (pg << 8) | pb
        k += 1
      }
      require(bytes.length - i >= 8 && bytes(bytes.length - 1) == 1,
        "missing end marker")
      (width, height, px)
    }
  }

  /**
   * PNG (RFC 2083) — the dominant raster format of the open web, fully
   * decodable pure-JVM because DEFLATE ships in `java.util.zip`.
   * Supported profile: 8-bit greyscale (color type 0) and truecolor RGB
   * (color type 2), non-interlaced, all five adaptive scanline filters
   * (None/Sub/Up/Average/Paeth — the stateful part: every filter
   * reconstructs against the PREVIOUS scanline and the byte `bpp` to
   * the left, so one mis-stepped row corrupts everything below it).
   * The encoder cycles the filter type per row (`row % 5`), so every
   * round-tripped image ≥5 rows exercises the full decoder filter
   * surface deterministically. Chunk CRCs are verified on decode;
   * ancillary chunks are skipped; palette/alpha/16-bit/interlace raise.
   */
  object PngCodec {
    private val Sig: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

    /** Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left to
      * the linear estimate a + b − c, ties breaking a, then b. */
    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b)
      val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    private def writeChunk(out: java.io.ByteArrayOutputStream,
        typ: String, data: Array[Byte]): Unit = {
      def be32(v: Int): Unit = { out.write(v >>> 24)
        out.write((v >>> 16) & 0xff); out.write((v >>> 8) & 0xff)
        out.write(v & 0xff) }
      be32(data.length)
      val t = typ.getBytes("US-ASCII")
      out.write(t); out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      be32(crc.getValue.toInt)
    }

    /** Encode row-major top-down pixels — packed 0xRRGGBB when
      * `gray = false`, 0..255 values when `gray = true` — as a
      * non-interlaced 8-bit PNG, filters cycling `row % 5`. */
    def encode(width: Int, height: Int, px: Array[Int],
        gray: Boolean = false): Array[Byte] = {
      require(width > 0 && height > 0 && px.length == width * height,
        s"need width*height pixels, got ${px.length} for ${width}x$height")
      val bpp = if (gray) 1 else 3
      val stride = width * bpp
      val raw = new Array[Byte](height * (1 + stride))
      val cur = new Array[Int](stride)
      val prev = new Array[Int](stride)
      var o = 0
      var r = 0
      while (r < height) {
        var x = 0
        while (x < width) {
          val p = px(r * width + x)
          if (gray) cur(x) = p & 0xff
          else { cur(3 * x) = (p >> 16) & 0xff
            cur(3 * x + 1) = (p >> 8) & 0xff; cur(3 * x + 2) = p & 0xff }
          x += 1
        }
        val ft = r % 5
        raw(o) = ft.toByte; o += 1
        var i = 0
        while (i < stride) {
          val a = if (i >= bpp) cur(i - bpp) else 0
          val b = prev(i)
          val c = if (i >= bpp) prev(i - bpp) else 0
          val f = ft match {
            case 0 => cur(i)
            case 1 => cur(i) - a
            case 2 => cur(i) - b
            case 3 => cur(i) - (a + b) / 2
            case _ => cur(i) - paeth(a, b, c)
          }
          raw(o) = (f & 0xff).toByte; o += 1
          i += 1
        }
        Array.copy(cur, 0, prev, 0, stride)
        r += 1
      }
      val defl = new java.util.zip.Deflater()
      defl.setInput(raw); defl.finish()
      val comp = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](4096)
      while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
      defl.end()
      val ihdr = new java.io.ByteArrayOutputStream(13)
      def be32h(v: Int): Unit = { ihdr.write(v >>> 24)
        ihdr.write((v >>> 16) & 0xff); ihdr.write((v >>> 8) & 0xff)
        ihdr.write(v & 0xff) }
      be32h(width); be32h(height)
      ihdr.write(8)                        // bit depth
      ihdr.write(if (gray) 0 else 2)       // color type
      ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate/adaptive/none
      val out = new java.io.ByteArrayOutputStream()
      out.write(Sig, 0, Sig.length)
      writeChunk(out, "IHDR", ihdr.toByteArray)
      writeChunk(out, "IDAT", comp.toByteArray)
      writeChunk(out, "IEND", Array.emptyByteArray)
      out.toByteArray
    }

    /** (width, height, row-major top-down 0xRRGGBB pixels — greyscale
      * replicated across the three channels). Chunk CRCs verified. */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      require(bytes.length >= 8 + 12 && Sig.indices.forall(i =>
        bytes(i) == Sig(i)), "not a PNG file")
      def be32(o: Int): Int = ((bytes(o) & 0xff) << 24) |
        ((bytes(o + 1) & 0xff) << 16) | ((bytes(o + 2) & 0xff) << 8) |
        (bytes(o + 3) & 0xff)
      var i = 8
      var w = 0; var h = 0; var colorType = -1
      val idat = new java.io.ByteArrayOutputStream()
      var end = false
      while (!end) {
        require(i + 12 <= bytes.length, "truncated chunk header")
        val len = be32(i)
        require(len >= 0 && i + 12 + len <= bytes.length,
          "truncated chunk body")
        val typ = new String(bytes, i + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(bytes, i + 4, 4 + len)
        require(crc.getValue.toInt == be32(i + 8 + len),
          s"bad CRC in $typ chunk")
        typ match {
          case "IHDR" =>
            w = be32(i + 8); h = be32(i + 12)
            require(bytes(i + 16) == 8, "8-bit depth only")
            colorType = bytes(i + 17) & 0xff
            require(colorType == 0 || colorType == 2,
              s"color type $colorType unsupported (greyscale/RGB only)")
            require(bytes(i + 18) == 0 && bytes(i + 19) == 0 &&
              bytes(i + 20) == 0,
              "deflate/adaptive-filter/non-interlaced only")
          case "IDAT" => idat.write(bytes, i + 8, len)
          case "IEND" => end = true
          case _ => ()                     // ancillary chunk: skip
        }
        i += 12 + len
      }
      require(w > 0 && h > 0 && colorType >= 0, "missing IHDR geometry")
      val bpp = if (colorType == 0) 1 else 3
      val stride = w * bpp
      val raw = new Array[Byte](h * (1 + stride))
      val infl = new java.util.zip.Inflater()
      infl.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !infl.finished()) {
        val n = infl.inflate(raw, off, raw.length - off)
        require(n > 0 || !infl.needsInput, "truncated IDAT stream")
        off += n
      }
      require(off == raw.length,
        s"IDAT inflated to $off bytes, expected ${raw.length}")
      infl.end()
      val px = new Array[Int](w * h)
      val cur = new Array[Int](stride)
      val prev = new Array[Int](stride)
      var o = 0
      var r = 0
      while (r < h) {
        val ft = raw(o) & 0xff; o += 1
        require(ft <= 4, s"unknown filter type $ft")
        var k = 0
        while (k < stride) {
          val x = raw(o) & 0xff; o += 1
          val a = if (k >= bpp) cur(k - bpp) else 0
          val b = prev(k)
          val c = if (k >= bpp) prev(k - bpp) else 0
          cur(k) = (ft match {
            case 0 => x
            case 1 => x + a
            case 2 => x + b
            case 3 => x + (a + b) / 2
            case _ => x + paeth(a, b, c)
          }) & 0xff
          k += 1
        }
        var xx = 0
        while (xx < w) {
          px(r * w + xx) =
            if (bpp == 1) { val g = cur(xx); (g << 16) | (g << 8) | g }
            else (cur(3 * xx) << 16) | (cur(3 * xx + 1) << 8) |
              cur(3 * xx + 2)
          xx += 1
        }
        Array.copy(cur, 0, prev, 0, stride)
        r += 1
      }
      (w, h, px)
    }
  }

  /** One frame of an animated GIF: a sub-rectangle of the logical
    * screen. `px` is row-major 0xRRGGBB; the sentinel `Hole` (-1) marks
    * a transparent pixel (the previous canvas shows through — encoded
    * via the GCE transparent-color index). `disposal` is the GIF89a
    * disposal method applied AFTER this frame: 1 = leave the canvas,
    * 2 = restore this frame's rectangle to the background color. */
  case class GifFrame(left: Int, top: Int, w: Int, h: Int,
      px: Array[Int], disposal: Int = 1, delayCs: Int = 4)

  /**
   * REAL codec for animated GIF (GIF89a) — the container that makes
   * "video" a real modality here: multiple frames, sub-rectangle delta
   * frames, transparency holes, disposal methods, and interlacing, all
   * over genuine variable-width LZW (the spec's compression — clear/EOI
   * codes, code width growth 3→12 bits, table reset at 4096 entries,
   * LSB-first bit packing, 255-byte sub-block framing). Pure JVM; no
   * imaging library. Layout per the public GIF89a specification:
   * header, logical screen descriptor, global color table, per frame a
   * Graphic Control Extension + image descriptor + LZW-compressed
   * indices, trailer. Scale shape: like the other codecs the
   * encode/decode runs inside `mapPartitions` — bytes never shuffle.
   */
  object GifCodec {
    /** Transparent-pixel sentinel in `GifFrame.px`. */
    val Hole: Int = -1

    private def le16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    }

    /** Interlace pass row order for a frame of height h (GIF's four
      * passes: every 8th from 0, every 8th from 4, every 4th from 2,
      * every 2nd from 1). */
    private def interlaceRows(h: Int): Array[Int] =
      ((0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++
        (1 until h by 2)).toArray

    /** GIF-variant LZW compress of palette indices at `minCodeSize`
      * (≥2) bits per root code. Emits CLEAR first, CLEAR again whenever
      * the table fills (4096 codes), EOI last. */
    private[graft] def lzwCompress(idx: Array[Int],
        minCodeSize: Int): Array[Byte] = {
      val clear = 1 << minCodeSize
      val eoi = clear + 1
      val out = new java.io.ByteArrayOutputStream()
      var bitBuf = 0L; var nBits = 0
      var codeSize = minCodeSize + 1
      def emit(code: Int): Unit = {
        bitBuf |= code.toLong << nBits
        nBits += codeSize
        while (nBits >= 8) {
          out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; nBits -= 8
        }
      }
      // dictionary: string = (prefix code, appended index) → code
      var dict = new java.util.HashMap[Long, Integer]()
      var next = eoi + 1
      def key(prefix: Int, k: Int) = (prefix.toLong << 12) | k.toLong
      emit(clear)
      var w = -1
      var i = 0
      while (i < idx.length) {
        val k = idx(i)
        require(k >= 0 && k < clear, s"index $k out of palette range")
        if (w < 0) w = k
        else {
          val cached = dict.get(key(w, k))
          if (cached != null) w = cached.intValue()
          else {
            emit(w)
            if (next == 4096) {               // table full: reset
              emit(clear)
              dict = new java.util.HashMap[Long, Integer]()
              next = eoi + 1
              codeSize = minCodeSize + 1
            } else {
              dict.put(key(w, k), Integer.valueOf(next))
              next += 1
              // decoder widens when ITS next counter (one behind ours)
              // reaches 1<<codeSize — mirror that exactly
              if (next == (1 << codeSize) + 1 && codeSize < 12)
                codeSize += 1
            }
            w = k
          }
        }
        i += 1
      }
      if (w >= 0) emit(w)
      emit(eoi)
      if (nBits > 0) out.write((bitBuf & 0xff).toInt)
      out.toByteArray
    }

    /** GIF-variant LZW decompress (mirror of `lzwCompress`, including
      * the `code == next` self-reference case and deferred clears). */
    private[graft] def lzwDecompress(data: Array[Byte], minCodeSize: Int,
        expected: Int): Array[Int] = {
      val clear = 1 << minCodeSize
      val eoi = clear + 1
      val out = new Array[Int](expected)
      var n = 0
      // dict as (prefix, last index); roots are implicit
      val prefix = new Array[Int](4096)
      val last = new Array[Int](4096)
      var next = eoi + 1
      var codeSize = minCodeSize + 1
      var bitBuf = 0L; var nBits = 0; var pos = 0
      var prev = -1
      val scratch = new Array[Int](4096)
      def expand(code: Int): Int = {            // → length, writes out
        var c = code; var len = 0
        while (c >= clear) { scratch(len) = last(c); len += 1; c = prefix(c) }
        scratch(len) = c; len += 1
        var j = len - 1
        while (j >= 0) {
          require(n < expected, "LZW output overruns frame")
          out(n) = scratch(j); n += 1; j -= 1
        }
        len
      }
      def firstIndex(code: Int): Int = {
        var c = code
        while (c >= clear) c = prefix(c)
        c
      }
      var done = false
      while (!done) {
        while (nBits < codeSize) {
          require(pos < data.length, "truncated LZW stream")
          bitBuf |= (data(pos) & 0xffL) << nBits; nBits += 8; pos += 1
        }
        val code = (bitBuf & ((1L << codeSize) - 1)).toInt
        bitBuf >>>= codeSize; nBits -= codeSize
        if (code == clear) {
          next = eoi + 1; codeSize = minCodeSize + 1; prev = -1
        } else if (code == eoi) done = true
        else {
          if (prev < 0) { require(code < clear, "first code not a root")
            expand(code) }
          else {
            require(code <= next && next <= 4096, s"bad LZW code $code")
            if (next < 4096) {
              prefix(next) = prev
              last(next) = firstIndex(if (code == next) prev else code)
              next += 1
            }
            expand(code)
            if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prev = code
        }
      }
      require(n == expected, s"LZW yielded $n of $expected pixels")
      out
    }

    /**
     * Encode frames onto a width×height logical screen. The global
     * palette is the ascending-sorted distinct colors across all
     * frames; if any frame has `Hole` pixels, the smallest 24-bit value
     * NOT used by any frame becomes the dedicated transparent slot (so
     * when holes exist, palette entry 0 — also the background color —
     * is always 0x000000: either black is a used color, or black is
     * unused and becomes the hole slot).
     */
    def encode(width: Int, height: Int, frames: Seq[GifFrame],
        interlaced: Boolean = false): Array[Byte] = {
      require(width > 0 && height > 0 && frames.nonEmpty, "empty GIF")
      frames.foreach { f =>
        require(f.w > 0 && f.h > 0 && f.px.length == f.w * f.h,
          "frame pixel count mismatch")
        require(f.left >= 0 && f.top >= 0 && f.left + f.w <= width &&
          f.top + f.h <= height, "frame rect outside screen")
        require(f.disposal == 1 || f.disposal == 2, "disposal 1 or 2")
      }
      val used = frames.flatMap(_.px.iterator.filter(_ != Hole))
        .distinct.sorted.toArray
      val anyHole = frames.exists(_.px.contains(Hole))
      val holeColor = if (!anyHole) -1 else {
        val set = used.toSet
        Iterator.from(0).find(!set.contains(_)).get
      }
      val palette = (if (anyHole) (used :+ holeColor).sorted else used)
      require(palette.length <= 256, s"${palette.length} colors > 256")
      val slot = palette.zipWithIndex.toMap
      val transIdx = if (anyHole) slot(holeColor) else -1
      // palette size field is a power of two ≥ 2
      var sizeBits = 1
      while ((1 << sizeBits) < palette.length) sizeBits += 1
      val minCode = math.max(2, sizeBits)
      val out = new java.io.ByteArrayOutputStream()
      "GIF89a".foreach(c => out.write(c))
      le16(out, width); le16(out, height)
      out.write(0x80 | ((sizeBits - 1) & 7)) // global table, 2^sizeBits
      out.write(0)                           // background = palette 0
      out.write(0)                           // no aspect ratio
      (0 until (1 << sizeBits)).foreach { i =>
        val c = if (i < palette.length) palette(i) else 0
        out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff)
        out.write(c & 0xff)
      }
      // NETSCAPE2.0 looping application extension (decoders skip it)
      out.write(0x21); out.write(0xff); out.write(11)
      "NETSCAPE2.0".foreach(c => out.write(c))
      out.write(3); out.write(1); le16(out, 0); out.write(0)
      frames.foreach { f =>
        out.write(0x21); out.write(0xf9); out.write(4) // GCE
        out.write((f.disposal << 2) | (if (transIdx >= 0) 1 else 0))
        le16(out, f.delayCs)
        out.write(if (transIdx >= 0) transIdx else 0)
        out.write(0)
        out.write(0x2c)                                // image descriptor
        le16(out, f.left); le16(out, f.top); le16(out, f.w); le16(out, f.h)
        out.write(if (interlaced) 0x40 else 0)
        val rowOrder =
          if (interlaced) interlaceRows(f.h) else (0 until f.h).toArray
        val idx = new Array[Int](f.w * f.h)
        var o = 0
        rowOrder.foreach { r =>
          var c = 0
          while (c < f.w) {
            val p = f.px(r * f.w + c)
            idx(o) = if (p == Hole) transIdx else slot(p)
            o += 1; c += 1
          }
        }
        out.write(minCode)
        val lzw = lzwCompress(idx, minCode)
        var off = 0
        while (off < lzw.length) {
          val len = math.min(255, lzw.length - off)
          out.write(len); out.write(lzw, off, len); off += len
        }
        out.write(0)                                   // block terminator
      }
      out.write(0x3b)                                  // trailer
      out.toByteArray
    }

    /**
     * Decode to COMPOSITED canvases: element f is the full logical
     * screen as visible after frame f renders (disposal applied between
     * frames, transparent pixels preserving the prior canvas). The
     * canvas starts as the background color.
     */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Array[Int]]) = {
      require(bytes.length > 13 &&
        new String(bytes, 0, 6, "US-ASCII").startsWith("GIF8"),
        "not a GIF file")
      var pos = 6
      def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
      def u16(): Int = { val v = (bytes(pos) & 0xff) |
        ((bytes(pos + 1) & 0xff) << 8); pos += 2; v }
      val width = u16(); val height = u16()
      val lsdPacked = u8()
      val bg = u8(); u8()                           // background, aspect
      val globalPal: Array[Int] =
        if ((lsdPacked & 0x80) != 0) {
          val n = 1 << ((lsdPacked & 7) + 1)
          Array.fill(n) { val r = u8(); val g = u8(); val b = u8()
            (r << 16) | (g << 8) | b }
        } else Array.empty
      val bgColor =
        if (globalPal.nonEmpty && bg < globalPal.length) globalPal(bg)
        else 0
      val canvas = Array.fill(width * height)(bgColor)
      val frames = scala.collection.mutable.ArrayBuffer[Array[Int]]()
      var disposal = 0; var transIdx = -1
      var done = false
      while (!done) {
        u8() match {
          case 0x3b => done = true
          case 0x21 =>                               // extension
            val label = u8()
            if (label == 0xf9) {
              val n = u8(); require(n == 4, "bad GCE size")
              val packed = u8()
              disposal = (packed >> 2) & 7
              u16()                                  // delay
              val t = u8()
              transIdx = if ((packed & 1) != 0) t else -1
              require(u8() == 0, "GCE missing terminator")
            } else {                                 // skip sub-blocks
              var n = u8()
              while (n != 0) { pos += n; n = u8() }
            }
          case 0x2c =>                               // image descriptor
            val left = u16(); val top = u16()
            val fw = u16(); val fh = u16()
            val packed = u8()
            val localPal: Array[Int] =
              if ((packed & 0x80) != 0) {
                val n = 1 << ((packed & 7) + 1)
                Array.fill(n) { val r = u8(); val g = u8(); val b = u8()
                  (r << 16) | (g << 8) | b }
              } else globalPal
            require(localPal.nonEmpty, "no color table")
            require(left + fw <= width && top + fh <= height,
              "frame rect outside screen")
            val interlacedF = (packed & 0x40) != 0
            val minCode = u8()
            val data = new java.io.ByteArrayOutputStream()
            var n = u8()
            while (n != 0) {
              data.write(bytes, pos, n); pos += n; n = u8()
            }
            val idx = lzwDecompress(data.toByteArray, minCode, fw * fh)
            val rowOrder =
              if (interlacedF) interlaceRows(fh) else (0 until fh).toArray
            var o = 0
            rowOrder.foreach { r =>
              var c = 0
              while (c < fw) {
                val k = idx(o); o += 1
                if (k != transIdx) {
                  require(k < localPal.length, s"palette index $k")
                  canvas((top + r) * width + (left + c)) = localPal(k)
                }
                c += 1
              }
            }
            frames += canvas.clone()
            if (disposal == 2) {                     // restore rect to bg
              var r = 0
              while (r < fh) {
                var c = 0
                while (c < fw) {
                  canvas((top + r) * width + (left + c)) = bgColor
                  c += 1
                }
                r += 1
              }
            }
            disposal = 0; transIdx = -1
          case b => throw new IllegalArgumentException(
            f"unknown GIF block 0x$b%02x")
        }
      }
      require(frames.nonEmpty, "GIF contains no frames")
      (width, height, frames.toArray)
    }
  }

  /**
   * Baseline JFIF JPEG (ISO/IEC 10918-1 sequential DCT, Huffman,
   * 8-bit) — the format that dominates a real crawl's image payloads,
   * so the `Warc.records` → multimodal chain is incomplete without it
   * (round-18 verdict's top ask). Same pure-JVM, per-row,
   * fail-loudly pattern as the seven codecs above.
   *
   * Supported subset: SOF0 baseline, grayscale or 3-component YCbCr,
   * per-component sampling factors up to 2×2 (4:4:4, 4:2:0, 4:2:2,
   * 4:4:0), arbitrary quantization/Huffman tables read from the
   * stream, 0xFF00 byte stuffing, edge-padded partial MCUs, and
   * restart intervals (DRI + RST0-7 — ubiquitous in real crawl
   * JPEGs). Loud, reasoned failure on everything else: progressive
   * (SOF2), arithmetic coding, 12-bit precision, unknown SOF
   * families.
   *
   * Determinism contract (what lets a DuckDB oracle gate a LOSSY
   * format): DCT and IDCT run in IEEE doubles — bit-reproducible on
   * any JVM — with ONE final half-up round per value. A fixture whose
   * MCUs are CONSTANT color round-trips EXACTLY at quality 100
   * (DC-only blocks: the transform pair is exact to ~1e-13, far
   * inside the rounding step; all-ones quantization preserves the
   * DC), so the only pixel math between source and decode is the
   * RGB↔YCbCr rounding — integer-in, integer-out expressions the
   * oracle spells identically in SQL. Lossy behavior on non-constant
   * content (quality < 100, gradients) is spec-pinned with a bounded
   * per-pixel error, deliberately not oracle-gated.
   */
  object JpegCodec {
    private val Zigzag: Array[Int] = Array(
      0, 1, 8, 16, 9, 2, 3, 10,
      17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34,
      27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36,
      29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46,
      53, 60, 61, 54, 47, 55, 62, 63)

    // ISO 10918-1 Annex K example quantization tables (natural order) —
    // the de-facto default of every baseline encoder
    private val QLumaBase: Array[Int] = Array(
      16, 11, 10, 16, 24, 40, 51, 61,
      12, 12, 14, 19, 26, 58, 60, 55,
      14, 13, 16, 24, 40, 57, 69, 56,
      14, 17, 22, 29, 51, 87, 80, 62,
      18, 22, 37, 56, 68, 109, 103, 77,
      24, 35, 55, 64, 81, 104, 113, 92,
      49, 64, 78, 87, 103, 121, 120, 101,
      72, 92, 95, 98, 112, 100, 103, 99)
    private val QChromaBase: Array[Int] = Array(
      17, 18, 24, 47, 99, 99, 99, 99,
      18, 21, 26, 66, 99, 99, 99, 99,
      24, 26, 56, 99, 99, 99, 99, 99,
      47, 66, 99, 99, 99, 99, 99, 99,
      99, 99, 99, 99, 99, 99, 99, 99,
      99, 99, 99, 99, 99, 99, 99, 99,
      99, 99, 99, 99, 99, 99, 99, 99,
      99, 99, 99, 99, 99, 99, 99, 99)

    // Annex K Huffman table specs: (codes per length 1..16, symbols)
    private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    private val DcLumaVals = (0 to 11).toArray
    private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
    private val DcChromaVals = (0 to 11).toArray
    private val AcLumaBits =
      Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
    private val AcLumaVals: Array[Int] = Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
      0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
      0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
      0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
      0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
      0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
      0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
      0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
      0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
      0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
      0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
      0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
      0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
      0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
      0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
      0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
      0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
      0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
      0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
      0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
      0xf9, 0xfa)
    private val AcChromaBits =
      Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
    private val AcChromaVals: Array[Int] = Array(
      0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
      0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
      0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
      0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
      0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
      0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
      0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
      0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
      0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
      0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
      0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
      0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
      0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
      0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
      0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
      0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
      0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
      0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
      0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
      0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
      0xf9, 0xfa)

    /** libjpeg's quality→table scaling; q=100 yields all-ones tables
      * (the fixtures' exact-round-trip setting). */
    private def scaled(base: Array[Int], q: Int): Array[Int] = {
      require(q >= 1 && q <= 100, s"quality $q outside [1,100]")
      val s = if (q < 50) 5000 / q else 200 - 2 * q
      base.map(t => math.max(1, math.min(255, (t * s + 50) / 100)))
    }

    private val cosT: Array[Array[Double]] =
      Array.tabulate(8, 8)((k, x) => math.cos((2 * x + 1) * k * math.Pi / 16))
    private val InvSqrt2 = 1.0 / math.sqrt(2.0)
    private def cc(u: Int): Double = if (u == 0) InvSqrt2 else 1.0

    /** Direct 2-D FDCT over a level-shifted 8×8 block (doubles, fixed
      * summation order — deterministic). O(64²) per block: exactly the
      * textbook definition, chosen for auditability over speed; the
      * per-image block counts of this engine's media rows are small. */
    private def fdct(f: Array[Double]): Array[Double] = {
      val out = new Array[Double](64)
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var s = 0.0
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              s += f(y * 8 + x) * cosT(u)(x) * cosT(v)(y)
              x += 1
            }
            y += 1
          }
          out(v * 8 + u) = 0.25 * cc(u) * cc(v) * s
          v += 1
        }
        u += 1
      }
      out
    }

    /** Direct 2-D IDCT (doubles) — the inverse of [[fdct]], same
      * determinism argument. Output is NOT yet level-shifted. */
    private def idct(coef: Array[Double]): Array[Double] = {
      val out = new Array[Double](64)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          var v = 0
          while (v < 8) {
            var u = 0
            while (u < 8) {
              s += cc(u) * cc(v) * coef(v * 8 + u) * cosT(u)(x) * cosT(v)(y)
              u += 1
            }
            v += 1
          }
          out(y * 8 + x) = 0.25 * s
          x += 1
        }
        y += 1
      }
      out
    }

    private def clamp255(v: Long): Int =
      if (v < 0L) 0 else if (v > 255L) 255 else v.toInt

    // JFIF RGB↔YCbCr in EXACT scaled-integer arithmetic (libjpeg's own
    // move): the JFIF constants sum to exact halves (0.168735892 +
    // 0.331264108 = 0.5), so r==g / g==b pixels land on EXACT .5 ties
    // where float rounding is engine-dependent — integer numerators
    // with truncating division are bit-identical in the JVM and in the
    // oracle's SQL (`(num + half) / scale`, both truncate toward zero)
    private def rgbToY(r: Int, g: Int, b: Int): Int =
      clamp255((299L * r + 587L * g + 114L * b + 500L) / 1000L)
    private def rgbToCb(r: Int, g: Int, b: Int): Int =
      clamp255(128L + (-168735892L * r - 331264108L * g +
        500000000L * b + 500000000L) / 1000000000L)
    private def rgbToCr(r: Int, g: Int, b: Int): Int =
      clamp255(128L + (500000000L * r - 418687589L * g -
        81312411L * b + 500000000L) / 1000000000L)
    private def yccToRgb(yv: Int, cb: Int, cr: Int): Int = {
      val r = clamp255(yv + (1402L * (cr - 128) + 500L) / 1000L)
      val g = clamp255(yv + (-344136L * (cb - 128) -
        714136L * (cr - 128) + 500000L) / 1000000L)
      val b = clamp255(yv + (1772L * (cb - 128) + 500L) / 1000L)
      (r << 16) | (g << 8) | b
    }

    // ------------------------------------------------------- encoder —

    /** Canonical Huffman encoder table: symbol → (code, length). */
    private def encTable(bits: Array[Int], vals: Array[Int])
        : Array[(Int, Int)] = {
      val codes = new Array[(Int, Int)](256)
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        var i = 0
        while (i < bits(len - 1)) {
          codes(vals(k)) = (code, len)
          code += 1; k += 1; i += 1
        }
        code <<= 1
        len += 1
      }
      codes
    }

    private final class BitWriter(out: java.io.ByteArrayOutputStream) {
      private var acc = 0
      private var n = 0
      def put(value: Int, bits: Int): Unit = {
        var i = bits - 1
        while (i >= 0) {
          acc = (acc << 1) | ((value >>> i) & 1)
          n += 1
          if (n == 8) {
            out.write(acc)
            if (acc == 0xff) out.write(0) // byte stuffing
            acc = 0; n = 0
          }
          i -= 1
        }
      }
      /** Pad the final partial byte with 1-bits (the standard fill). */
      def flush(): Unit = while (n != 0) put(1, 1)
    }

    private def bitLen(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v)

    /** Encode one quantized block (natural order): DC diff + AC RLE. */
    private def writeBlock(bw: BitWriter, q: Array[Int], pred: Int,
        dc: Array[(Int, Int)], ac: Array[(Int, Int)]): Int = {
      val zz = Array.tabulate(64)(k => q(Zigzag(k)))
      val diff = zz(0) - pred
      val cat = bitLen(math.abs(diff))
      val (dcode, dlen) = dc(cat)
      bw.put(dcode, dlen)
      if (cat > 0)
        bw.put(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
      var k = 1
      var run = 0
      while (k < 64) {
        val v = zz(k)
        if (v == 0) run += 1
        else {
          while (run > 15) { val (c, l) = ac(0xf0); bw.put(c, l); run -= 16 }
          val vcat = bitLen(math.abs(v))
          val (c, l) = ac((run << 4) | vcat)
          bw.put(c, l)
          bw.put(if (v >= 0) v else v + (1 << vcat) - 1, vcat)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (c, l) = ac(0x00); bw.put(c, l) } // EOB
      zz(0)
    }

    /** One component plane padded to its block grid by edge
      * replication, returned with its padded width. */
    private def padPlane(src: Array[Int], w: Int, h: Int,
        pw: Int, ph: Int): Array[Int] = {
      val out = new Array[Int](pw * ph)
      var y = 0
      while (y < ph) {
        val sy = math.min(y, h - 1)
        var x = 0
        while (x < pw) {
          out(y * pw + x) = src(sy * w + math.min(x, w - 1))
          x += 1
        }
        y += 1
      }
      out
    }

    /** FDCT + quantize one 8×8 block of `plane` at (bx·8, by·8). */
    private def encodeBlock(plane: Array[Int], pw: Int, bx: Int, by: Int,
        qt: Array[Int]): Array[Int] = {
      val f = new Array[Double](64)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          f(y * 8 + x) = (plane((by * 8 + y) * pw + bx * 8 + x) - 128).toDouble
          x += 1
        }
        y += 1
      }
      val coef = fdct(f)
      Array.tabulate(64)(i => Math.round(coef(i) / qt(i)).toInt)
    }

    /**
     * Encode `rgb` (packed 0xRRGGBB, row-major) as baseline JFIF.
     * `chroma420 = true` writes 2×2-sampled luma MCUs (the web's
     * dominant layout); false writes 4:4:4. `gray = true` writes a
     * single-component (luma-only) stream. `restartInterval > 0`
     * writes a DRI segment and RST0-7 markers every that many MCUs
     * (predictor resets — same decoded pixels, resynchronizable
     * stream). Deterministic: same inputs, same bytes.
     */
    def encode(width: Int, height: Int, rgb: Array[Int],
        quality: Int = 100, chroma420: Boolean = true,
        gray: Boolean = false, restartInterval: Int = 0): Array[Byte] = {
      require(width > 0 && height > 0 && rgb.length == width * height,
        s"encode: ${rgb.length} pixels for ${width}x$height")
      val qL = scaled(QLumaBase, quality)
      val qC = scaled(QChromaBase, quality)
      val yP = new Array[Int](width * height)
      val cbP = new Array[Int](width * height)
      val crP = new Array[Int](width * height)
      var i = 0
      while (i < rgb.length) {
        val p = rgb(i)
        val (r, g, b) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
        yP(i) = rgbToY(r, g, b)
        cbP(i) = rgbToCb(r, g, b)
        crP(i) = rgbToCr(r, g, b)
        i += 1
      }
      val (hs, vs) = if (gray) (1, 1) else if (chroma420) (2, 2) else (1, 1)
      val mcuW = 8 * hs
      val mcuH = 8 * vs
      val nx = (width + mcuW - 1) / mcuW
      val ny = (height + mcuH - 1) / mcuH
      val lw = nx * mcuW
      val lh = ny * mcuH
      val yPad = padPlane(yP, width, height, lw, lh)
      // chroma planes at their own grid; 4:2:0 box-averages 2×2 with
      // half-up rounding ((a+b+c+d+2)/4 — exact on constant cells)
      val cw = nx * 8
      val chh = ny * 8
      val (cbPad, crPad) =
        if (gray) (null, null)
        else if (!chroma420)
          (padPlane(cbP, width, height, cw, chh),
            padPlane(crP, width, height, cw, chh))
        else {
          val cbFull = padPlane(cbP, width, height, lw, lh)
          val crFull = padPlane(crP, width, height, lw, lh)
          def down(p: Array[Int]): Array[Int] = Array.tabulate(cw * chh) {
            j =>
              val (x, y) = (j % cw, j / cw)
              (p(2 * y * lw + 2 * x) + p(2 * y * lw + 2 * x + 1) +
                p((2 * y + 1) * lw + 2 * x) +
                p((2 * y + 1) * lw + 2 * x + 1) + 2) / 4
          }
          (down(cbFull), down(crFull))
        }
      val out = new java.io.ByteArrayOutputStream()
      def u8(v: Int): Unit = out.write(v & 0xff)
      def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
      def marker(m: Int): Unit = { u8(0xff); u8(m) }
      marker(0xd8) // SOI
      marker(0xe0) // APP0 JFIF
      u16(16); out.write("JFIF".getBytes("US-ASCII")); u8(0)
      u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
      def dqt(id: Int, t: Array[Int]): Unit = {
        marker(0xdb); u16(67); u8(id)
        var k = 0
        while (k < 64) { u8(t(Zigzag(k))); k += 1 }
      }
      dqt(0, qL)
      if (!gray) dqt(1, qC)
      marker(0xc0) // SOF0
      val nComp = if (gray) 1 else 3
      u16(8 + 3 * nComp); u8(8); u16(height); u16(width); u8(nComp)
      u8(1); u8((hs << 4) | vs); u8(0) // Y
      if (!gray) { u8(2); u8(0x11); u8(1); u8(3); u8(0x11); u8(1) }
      def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int])
          : Unit = {
        marker(0xc4); u16(19 + vals.length); u8((cls << 4) | id)
        bits.foreach(u8); vals.foreach(u8)
      }
      dht(0, 0, DcLumaBits, DcLumaVals)
      dht(1, 0, AcLumaBits, AcLumaVals)
      if (!gray) {
        dht(0, 1, DcChromaBits, DcChromaVals)
        dht(1, 1, AcChromaBits, AcChromaVals)
      }
      if (restartInterval > 0) { // DRI
        marker(0xdd); u16(4); u16(restartInterval)
      }
      marker(0xda) // SOS
      u16(6 + 2 * nComp); u8(nComp)
      u8(1); u8(0x00)
      if (!gray) { u8(2); u8(0x11); u8(3); u8(0x11) }
      u8(0); u8(63); u8(0)
      val dcL = encTable(DcLumaBits, DcLumaVals)
      val acL = encTable(AcLumaBits, AcLumaVals)
      val dcC = encTable(DcChromaBits, DcChromaVals)
      val acC = encTable(AcChromaBits, AcChromaVals)
      val bw = new BitWriter(out)
      var predY = 0
      var predCb = 0
      var predCr = 0
      var mcuDone = 0
      var my = 0
      while (my < ny) {
        var mx = 0
        while (mx < nx) {
          if (restartInterval > 0 && mcuDone > 0 &&
            mcuDone % restartInterval == 0) {
            bw.flush()
            marker(0xd0 + (mcuDone / restartInterval - 1) % 8)
            predY = 0; predCb = 0; predCr = 0
          }
          var by = 0
          while (by < vs) {
            var bx = 0
            while (bx < hs) {
              predY = writeBlock(bw,
                encodeBlock(yPad, lw, mx * hs + bx, my * vs + by, qL),
                predY, dcL, acL)
              bx += 1
            }
            by += 1
          }
          if (!gray) {
            predCb = writeBlock(bw, encodeBlock(cbPad, cw, mx, my, qC),
              predCb, dcC, acC)
            predCr = writeBlock(bw, encodeBlock(crPad, cw, mx, my, qC),
              predCr, dcC, acC)
          }
          mcuDone += 1
          mx += 1
        }
        my += 1
      }
      bw.flush()
      marker(0xd9) // EOI
      out.toByteArray
    }

    /**
     * Encode as PROGRESSIVE JFIF (SOF2) with successive approximation
     * — the script most web encoders ship: an interleaved DC-first
     * scan at Al=1, per-component AC-first scans of the full band at
     * Al=1 (EOB-run coding), a raw-bit DC refinement, and
     * per-component AC refinements (the correction-bit algorithm,
     * ISO 10918-1 G.1.2.3). Same quantized coefficients as [[encode]]
     * — a progressive stream decodes to BIT-IDENTICAL pixels as the
     * baseline encoding of the same image (spec-pinned), which is what
     * makes the entropy layers testable end to end. EOB runs are
     * flushed per block (EOB0 only), so the stream stays within the
     * standard Annex K tables; the decoder accepts general EOBn.
     */
    def encodeProgressive(width: Int, height: Int, rgb: Array[Int],
        quality: Int = 100, chroma420: Boolean = true,
        gray: Boolean = false): Array[Byte] = {
      require(width > 0 && height > 0 && rgb.length == width * height,
        s"encodeProgressive: ${rgb.length} pixels for ${width}x$height")
      val qL = scaled(QLumaBase, quality)
      val qC = scaled(QChromaBase, quality)
      val yP = new Array[Int](width * height)
      val cbP = new Array[Int](width * height)
      val crP = new Array[Int](width * height)
      var i = 0
      while (i < rgb.length) {
        val p = rgb(i)
        val (r, g, b) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
        yP(i) = rgbToY(r, g, b)
        cbP(i) = rgbToCb(r, g, b)
        crP(i) = rgbToCr(r, g, b)
        i += 1
      }
      val (hs, vs) = if (gray) (1, 1) else if (chroma420) (2, 2) else (1, 1)
      val mcuW = 8 * hs
      val mcuH = 8 * vs
      val nx = (width + mcuW - 1) / mcuW
      val ny = (height + mcuH - 1) / mcuH
      val lw = nx * mcuW
      val lh = ny * mcuH
      val yPad = padPlane(yP, width, height, lw, lh)
      val cw = nx * 8
      val chh = ny * 8
      val (cbPad, crPad) =
        if (gray) (null, null)
        else if (!chroma420)
          (padPlane(cbP, width, height, cw, chh),
            padPlane(crP, width, height, cw, chh))
        else {
          val cbFull = padPlane(cbP, width, height, lw, lh)
          val crFull = padPlane(crP, width, height, lw, lh)
          def down(p: Array[Int]): Array[Int] = Array.tabulate(cw * chh) {
            j =>
              val (x, y) = (j % cw, j / cw)
              (p(2 * y * lw + 2 * x) + p(2 * y * lw + 2 * x + 1) +
                p((2 * y + 1) * lw + 2 * x) +
                p((2 * y + 1) * lw + 2 * x + 1) + 2) / 4
          }
          (down(cbFull), down(crFull))
        }
      // quantize every block up front (natural-order coefficients);
      // per component: (coefs, storage blocksW, blocksH, sampled dims)
      case class PC(coefs: Array[Int], bw: Int, bh: Int,
          sw: Int, sh: Int, dc: Array[(Int, Int)], ac: Array[(Int, Int)])
      val dcL = encTable(DcLumaBits, DcLumaVals)
      val acL = encTable(AcLumaBits, AcLumaVals)
      val dcC = encTable(DcChromaBits, DcChromaVals)
      val acC = encTable(AcChromaBits, AcChromaVals)
      def quantAll(plane: Array[Int], pw: Int, bw: Int, bh: Int,
          qt: Array[Int]): Array[Int] = {
        val out = new Array[Int](bw * bh * 64)
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            val c = encodeBlock(plane, pw, bx, by, qt)
            System.arraycopy(c, 0, out, (by * bw + bx) * 64, 64)
            bx += 1
          }
          by += 1
        }
        out
      }
      val pcs: Seq[PC] =
        PC(quantAll(yPad, lw, nx * hs, ny * vs, qL), nx * hs, ny * vs,
          width, height, dcL, acL) +:
          (if (gray) Nil
           else Seq(
             PC(quantAll(cbPad, cw, nx, ny, qC), nx, ny,
               (width + hs - 1) / hs, (height + vs - 1) / vs, dcC, acC),
             PC(quantAll(crPad, cw, nx, ny, qC), nx, ny,
               (width + hs - 1) / hs, (height + vs - 1) / vs, dcC, acC)))
      val out = new java.io.ByteArrayOutputStream()
      def u8(v: Int): Unit = out.write(v & 0xff)
      def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
      def marker(m: Int): Unit = { u8(0xff); u8(m) }
      marker(0xd8)
      marker(0xe0)
      u16(16); out.write("JFIF".getBytes("US-ASCII")); u8(0)
      u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
      def dqt(id: Int, t: Array[Int]): Unit = {
        marker(0xdb); u16(67); u8(id)
        var k = 0
        while (k < 64) { u8(t(Zigzag(k))); k += 1 }
      }
      dqt(0, qL)
      if (!gray) dqt(1, qC)
      marker(0xc2) // SOF2: progressive
      val nComp = if (gray) 1 else 3
      u16(8 + 3 * nComp); u8(8); u16(height); u16(width); u8(nComp)
      u8(1); u8((hs << 4) | vs); u8(0)
      if (!gray) { u8(2); u8(0x11); u8(1); u8(3); u8(0x11); u8(1) }
      def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int])
          : Unit = {
        marker(0xc4); u16(19 + vals.length); u8((cls << 4) | id)
        bits.foreach(u8); vals.foreach(u8)
      }
      dht(0, 0, DcLumaBits, DcLumaVals)
      dht(1, 0, AcLumaBits, AcLumaVals)
      if (!gray) {
        dht(0, 1, DcChromaBits, DcChromaVals)
        dht(1, 1, AcChromaBits, AcChromaVals)
      }
      def sos(compIds: Seq[Int], ss: Int, se: Int, ah: Int, al: Int)
          : Unit = {
        marker(0xda)
        u16(6 + 2 * compIds.length); u8(compIds.length)
        compIds.foreach { cid =>
          u8(cid)
          u8(if (cid == 1) 0x00 else 0x11)
        }
        u8(ss); u8(se); u8((ah << 4) | al)
      }
      def nonIntGrid(pc: PC): (Int, Int) =
        ((pc.sw + 7) / 8, (pc.sh + 7) / 8)

      // scan 1: DC first, interleaved, Al=1
      sos((1 to nComp), 0, 0, 0, 1)
      locally {
        val bw2 = new BitWriter(out)
        val preds = new Array[Int](nComp)
        var my = 0
        while (my < ny) {
          var mx = 0
          while (mx < nx) {
            var ci = 0
            while (ci < nComp) {
              val pc = pcs(ci)
              val (h, v) = if (ci == 0) (hs, vs) else (1, 1)
              var by = 0
              while (by < v) {
                var bx = 0
                while (bx < h) {
                  val off = ((my * v + by) * pc.bw + (mx * h + bx)) * 64
                  val dv = pc.coefs(off) >> 1
                  val diff = dv - preds(ci)
                  preds(ci) = dv
                  val cat = bitLen(math.abs(diff))
                  val (c, l) = pc.dc(cat)
                  bw2.put(c, l)
                  if (cat > 0)
                    bw2.put(if (diff >= 0) diff
                      else diff + (1 << cat) - 1, cat)
                  bx += 1
                }
                by += 1
              }
              ci += 1
            }
            mx += 1
          }
          my += 1
        }
        bw2.flush()
      }
      // scans 2..: AC first per component, band 1..63, Al=1
      (0 until nComp).foreach { ci =>
        val pc = pcs(ci)
        sos(Seq(ci + 1), 1, 63, 0, 1)
        val bw2 = new BitWriter(out)
        val (gw, gh) = nonIntGrid(pc)
        var by = 0
        while (by < gh) {
          var bx = 0
          while (bx < gw) {
            val off = (by * pc.bw + bx) * 64
            var r = 0
            var k = 1
            while (k <= 63) {
              val cv = pc.coefs(off + Zigzag(k))
              val av = math.abs(cv) >> 1
              if (av == 0) r += 1
              else {
                while (r > 15) {
                  val (zc, zl) = pc.ac(0xf0); bw2.put(zc, zl); r -= 16
                }
                val cat = bitLen(av)
                val (c, l) = pc.ac((r << 4) | cat)
                bw2.put(c, l)
                val v = if (cv >= 0) av else -av
                bw2.put(if (v >= 0) v else v + (1 << cat) - 1, cat)
                r = 0
              }
              k += 1
            }
            // trailing zeros: EOB0 per block (stays within Annex K
            // tables; the decoder accepts general EOBn from the wild)
            if (r > 0) { val (c, l) = pc.ac(0x00); bw2.put(c, l) }
            bx += 1
          }
          by += 1
        }
        bw2.flush()
      }
      // scan: DC refinement — one raw bit per block, interleaved
      sos((1 to nComp), 0, 0, 1, 0)
      locally {
        val bw2 = new BitWriter(out)
        var my = 0
        while (my < ny) {
          var mx = 0
          while (mx < nx) {
            var ci = 0
            while (ci < nComp) {
              val pc = pcs(ci)
              val (h, v) = if (ci == 0) (hs, vs) else (1, 1)
              var by = 0
              while (by < v) {
                var bx = 0
                while (bx < h) {
                  val off = ((my * v + by) * pc.bw + (mx * h + bx)) * 64
                  bw2.put(pc.coefs(off) & 1, 1)
                  bx += 1
                }
                by += 1
              }
              ci += 1
            }
            mx += 1
          }
          my += 1
        }
        bw2.flush()
      }
      // scans: AC refinement per component (G.1.2.3 correction bits)
      (0 until nComp).foreach { ci =>
        val pc = pcs(ci)
        sos(Seq(ci + 1), 1, 63, 1, 0)
        val bw2 = new BitWriter(out)
        val (gw, gh) = nonIntGrid(pc)
        var by = 0
        while (by < gh) {
          var bx = 0
          while (bx < gw) {
            val off = (by * pc.bw + bx) * 64
            var r = 0
            val br2 = scala.collection.mutable.ArrayBuffer.empty[Int]
            def flushBr2(): Unit = {
              br2.foreach(b => bw2.put(b, 1)); br2.clear()
            }
            var k = 1
            while (k <= 63) {
              val cv = pc.coefs(off + Zigzag(k))
              val av = math.abs(cv)
              if (av == 0) r += 1
              else {
                while (r > 15) {
                  val (zc, zl) = pc.ac(0xf0)
                  bw2.put(zc, zl); flushBr2(); r -= 16
                }
                if (av > 1) br2 += (av & 1)
                else {
                  val (c, l) = pc.ac((r << 4) | 1)
                  bw2.put(c, l)
                  bw2.put(if (cv >= 0) 1 else 0, 1)
                  flushBr2()
                  r = 0
                }
              }
              k += 1
            }
            if (r > 0 || br2.nonEmpty) {
              val (c, l) = pc.ac(0x00) // EOB0 + its correction bits
              bw2.put(c, l)
              flushBr2()
            }
            bx += 1
          }
          by += 1
        }
        bw2.flush()
      }
      marker(0xd9)
      out.toByteArray
    }

    // ------------------------------------------------------- decoder —

    private final class BitReader(data: Array[Byte], var pos: Int,
        fail: String => Nothing) {
      private var acc = 0
      private var n = 0
      def bit(): Int = {
        if (n == 0) {
          if (pos >= data.length) fail("truncated entropy-coded segment")
          val b = data(pos) & 0xff; pos += 1
          if (b == 0xff) {
            if (pos >= data.length) fail("truncated after 0xFF")
            val m = data(pos) & 0xff; pos += 1
            if (m != 0x00)
              fail(f"marker 0xFF$m%02X inside entropy data " +
                "(a restart marker here means the MCU cadence " +
                "disagrees with DRI)")
          }
          acc = b; n = 8
        }
        n -= 1
        (acc >>> n) & 1
      }
      def bits(k: Int): Int = {
        var v = 0
        var i = 0
        while (i < k) { v = (v << 1) | bit(); i += 1 }
        v
      }
      /** Byte-align (dropping pad bits) and consume the expected
        * RSTk marker — the restart-interval resync point. */
      def expectRestart(k: Int): Unit = {
        n = 0
        if (pos + 1 >= data.length) fail("truncated at restart marker")
        val b0 = data(pos) & 0xff
        val b1 = data(pos + 1) & 0xff
        if (b0 != 0xff || b1 != 0xd0 + k)
          fail(f"expected RST$k%d, got 0x$b0%02X$b1%02X")
        pos += 2
      }
    }

    /** Canonical Huffman decoder (the standard mincode/maxcode walk). */
    private final class HuffDec(bits: Array[Int], vals: Array[Int],
        fail: String => Nothing) {
      private val minCode = new Array[Int](17)
      private val maxCode = Array.fill(17)(-1)
      private val valPtr = new Array[Int](17)
      locally {
        var code = 0
        var k = 0
        var l = 1
        while (l <= 16) {
          if (bits(l - 1) > 0) {
            valPtr(l) = k
            minCode(l) = code
            code += bits(l - 1); k += bits(l - 1)
            maxCode(l) = code - 1
          }
          code <<= 1
          l += 1
        }
      }
      def decode(br: BitReader): Int = {
        var code = br.bit()
        var l = 1
        while (maxCode(l) < code || bits(l - 1) == 0) {
          code = (code << 1) | br.bit()
          l += 1
          if (l > 16) fail("corrupt Huffman code (no 16-bit match)")
        }
        vals(valPtr(l) + code - minCode(l))
      }
    }

    /** JPEG's signed-magnitude EXTEND. */
    private def extend(v: Int, cat: Int): Int =
      if (cat == 0) 0
      else if (v < (1 << (cat - 1))) v - (1 << cat) + 1
      else v

    /**
     * Decode baseline JFIF to (width, height, packed 0xRRGGBB pixels).
     * Grayscale streams replicate luma into all three channels.
     */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"malformed JPEG: $msg")
      if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
        (bytes(1) & 0xff) != 0xd8) fail("missing SOI")
      var pos = 2
      def u8(): Int = {
        if (pos >= bytes.length) fail("truncated header")
        val v = bytes(pos) & 0xff; pos += 1; v
      }
      def u16(): Int = { val hi = u8(); (hi << 8) | u8() }
      val qtabs = scala.collection.mutable.Map.empty[Int, Array[Int]]
      val hufs = scala.collection.mutable.Map.empty[(Int, Int), HuffDec]
      // per component: (id, h, v, qId)
      var comps: Seq[(Int, Int, Int, Int)] = Nil
      var width = 0
      var height = 0
      var sawSof = false
      var restartInterval = 0
      var scan: Seq[(Int, Int, Int)] = Nil // (compIdx, dcId, acId)
      var atScan = false
      // progressive (SOF2) state: coefficients accumulate per block
      // across scans (natural order), reconstructed at EOI
      var progressive = false
      var pCoefs: Array[Array[Int]] = null
      var anyScan = false
      var eoi = false
      var hmax = 1
      var vmax = 1
      var nx = 0
      var ny = 0
      def blocksW(i: Int): Int = nx * comps(i)._2
      def blocksH(i: Int): Int = ny * comps(i)._3
      /** A single-component (non-interleaved) scan iterates the
        * component's OWN block grid — ceil(sampled dim / 8), NOT the
        * MCU-padded grid; the classic progressive-geometry trap. */
      def nonInterleavedGrid(i: Int): (Int, Int) = {
        val (_, h, v, _) = comps(i)
        (((width * h + hmax - 1) / hmax + 7) / 8,
          ((height * v + vmax - 1) / vmax + 7) / 8)
      }

      /** One progressive scan (ISO 10918-1 G.2, the jdphuff shapes):
        * DC first/refine over (possibly interleaved) MCUs, AC
        * first/refine over one component's own grid with EOB-run
        * coding; coefficients accumulate into `pCoefs` in natural
        * order, point-transformed by `al`. Returns the byte position
        * after the scan's entropy segment. */
      def decodeProgScan(scanComps: Seq[(Int, Int, Int)], ss: Int,
          se: Int, ah: Int, al: Int, startPos: Int): Int = {
        if (pCoefs == null)
          pCoefs = comps.indices.toArray.map(i =>
            new Array[Int](blocksW(i) * blocksH(i) * 64))
        if (ss > se || se > 63) fail(s"bad spectral band $ss..$se")
        if (ss == 0 && se != 0)
          fail("a progressive scan mixes DC and AC coefficients")
        if (ss > 0 && scanComps.length != 1)
          fail("progressive AC scans carry exactly one component")
        val br = new BitReader(bytes, startPos, fail)
        val preds = new Array[Int](comps.length)
        var eobrun = 0
        var unitDone = 0
        def restartCheck(): Unit =
          if (restartInterval > 0 && unitDone > 0 &&
            unitDone % restartInterval == 0) {
            br.expectRestart((unitDone / restartInterval - 1) % 8)
            java.util.Arrays.fill(preds, 0)
            eobrun = 0
          }
        if (ss == 0) {
          def dcOne(idx: Int, dcId: Int, bx: Int, by: Int): Unit = {
            val off = (by * blocksW(idx) + bx) * 64
            if (ah == 0) {
              val dc = hufs.getOrElse((0, dcId),
                fail(s"no DC Huffman table $dcId"))
              val cat = dc.decode(br)
              if (cat > 15) fail(s"DC category $cat out of range")
              preds(idx) += extend(br.bits(cat), cat)
              pCoefs(idx)(off) = preds(idx) << al
            } else if (br.bit() != 0) pCoefs(idx)(off) |= (1 << al)
          }
          if (scanComps.length > 1) {
            var my2 = 0
            while (my2 < ny) {
              var mx2 = 0
              while (mx2 < nx) {
                restartCheck()
                scanComps.foreach { case (idx, dcId, _) =>
                  val (_, h, v, _) = comps(idx)
                  var by2 = 0
                  while (by2 < v) {
                    var bx2 = 0
                    while (bx2 < h) {
                      dcOne(idx, dcId, mx2 * h + bx2, my2 * v + by2)
                      bx2 += 1
                    }
                    by2 += 1
                  }
                }
                unitDone += 1
                mx2 += 1
              }
              my2 += 1
            }
          } else {
            val (idx, dcId, _) = scanComps.head
            val (bw2, bh2) = nonInterleavedGrid(idx)
            var by2 = 0
            while (by2 < bh2) {
              var bx2 = 0
              while (bx2 < bw2) {
                restartCheck()
                dcOne(idx, dcId, bx2, by2)
                unitDone += 1
                bx2 += 1
              }
              by2 += 1
            }
          }
        } else {
          val (idx, _, acId) = scanComps.head
          val ac = hufs.getOrElse((1, acId),
            fail(s"no AC Huffman table $acId"))
          val (bw2, bh2) = nonInterleavedGrid(idx)
          val p1 = 1 << al
          val m1 = -1 << al
          var by2 = 0
          while (by2 < bh2) {
            var bx2 = 0
            while (bx2 < bw2) {
              restartCheck()
              val off = (by2 * blocksW(idx) + bx2) * 64
              if (ah == 0) {
                // AC first scan: run/size with EOB-run coding
                if (eobrun > 0) eobrun -= 1
                else {
                  var k = ss
                  while (k <= se) {
                    val rs = ac.decode(br)
                    val r = rs >> 4
                    val s2 = rs & 15
                    if (s2 != 0) {
                      k += r
                      if (k > se) fail("AC run past band end")
                      pCoefs(idx)(off + Zigzag(k)) =
                        extend(br.bits(s2), s2) << al
                      k += 1
                    } else if (r == 15) k += 16 // ZRL
                    else {
                      eobrun = (1 << r) - 1
                      if (r > 0) eobrun += br.bits(r)
                      k = 64
                    }
                  }
                }
              } else {
                // AC refinement: runs count only zero-HISTORY
                // positions; nonzero-history ones are transparent and
                // receive correction bits (one each)
                def correct(off2: Int): Unit = {
                  val cur = pCoefs(idx)(off2)
                  if (br.bit() != 0 && (cur & p1) == 0)
                    pCoefs(idx)(off2) =
                      if (cur >= 0) cur + p1 else cur + m1
                }
                var k = ss
                if (eobrun == 0) {
                  var broke = false
                  while (k <= se && !broke) {
                    val rs = ac.decode(br)
                    var r = rs >> 4
                    val s2 = rs & 15
                    var newVal = 0
                    if (s2 == 0) {
                      if (r != 15) {
                        eobrun = 1 << r
                        if (r > 0) eobrun += br.bits(r)
                        broke = true
                      }
                    } else {
                      if (s2 != 1)
                        fail("AC refinement symbol with magnitude > 1")
                      newVal = if (br.bit() != 0) p1 else m1
                    }
                    if (!broke) {
                      var stopped = false
                      while (k <= se && !stopped) {
                        val off2 = off + Zigzag(k)
                        if (pCoefs(idx)(off2) != 0) {
                          correct(off2); k += 1
                        } else if (r == 0) stopped = true
                        else { r -= 1; k += 1 }
                      }
                      if (newVal != 0) {
                        if (k > se)
                          fail("AC refinement run past band end")
                        pCoefs(idx)(off + Zigzag(k)) = newVal
                      }
                      k += 1
                    }
                  }
                }
                if (eobrun > 0) {
                  while (k <= se) {
                    val off2 = off + Zigzag(k)
                    if (pCoefs(idx)(off2) != 0) correct(off2)
                    k += 1
                  }
                  eobrun -= 1
                }
              }
              unitDone += 1
              bx2 += 1
            }
            by2 += 1
          }
        }
        br.pos
      }
      while (!atScan && !eoi) {
        var m = u8()
        if (m != 0xff) fail(f"expected a marker, got 0x$m%02X at ${pos - 1}")
        while (m == 0xff) m = u8() // fill bytes
        m match {
          case 0xd9 =>
            if (progressive && anyScan) eoi = true
            else fail("EOI before SOS (no image data)")
          case 0xdb =>
            val end = { val len = u16(); pos + len - 2 }
            while (pos < end) {
              val pqTq = u8()
              if ((pqTq >> 4) != 0)
                fail("16-bit quantization tables (12-bit precision) " +
                  "are outside the 8-bit baseline subset")
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(Zigzag(k)) = u8(); k += 1 }
              qtabs(pqTq & 0x0f) = t
            }
          case 0xc4 =>
            val end = { val len = u16(); pos + len - 2 }
            while (pos < end) {
              val tcTh = u8()
              val bits = Array.fill(16)(u8())
              val vals = Array.fill(bits.sum)(u8())
              hufs((tcTh >> 4, tcTh & 0x0f)) = new HuffDec(bits, vals, fail)
            }
          case sof if sof == 0xc0 || sof == 0xc2 =>
            progressive = sof == 0xc2
            val end = { val len = u16(); pos + len - 2 }
            if (u8() != 8) fail("only 8-bit precision routes")
            height = u16(); width = u16()
            val n = u8()
            if (n != 1 && n != 3)
              fail(s"$n components — only grayscale and YCbCr route")
            comps = (0 until n).map { _ =>
              val id = u8(); val hv = u8(); val q = u8()
              (id, hv >> 4, hv & 0x0f, q)
            }
            comps.foreach { case (id, h, v, _) =>
              if (h < 1 || h > 2 || v < 1 || v > 2)
                fail(s"component $id sampling ${h}x$v — factors above " +
                  "2 are outside this decoder's subset")
            }
            hmax = comps.map(_._2).max
            vmax = comps.map(_._3).max
            nx = (width + 8 * hmax - 1) / (8 * hmax)
            ny = (height + 8 * vmax - 1) / (8 * vmax)
            sawSof = true
            if (pos != end) fail("SOF length mismatch")
          case 0xc9 | 0xca | 0xcb =>
            fail("arithmetic-coded JPEG is not baseline Huffman")
          case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xcd | 0xce | 0xcf =>
            fail(f"SOF marker 0x$m%02X — only SOF0 sequential and " +
              "SOF2 progressive route")
          case 0xdd =>
            if (u16() != 4) fail("DRI segment length must be 4")
            restartInterval = u16()
          case 0xda =>
            if (!sawSof) fail("SOS before SOF")
            val end = { val len = u16(); pos + len - 2 }
            val ns = u8()
            scan = (0 until ns).map { _ =>
              val cid = u8(); val tt = u8()
              val idx = comps.indexWhere(_._1 == cid)
              if (idx < 0) fail(s"SOS names unknown component $cid")
              (idx, tt >> 4, tt & 0x0f)
            }
            val (ss, se, ahal) = (u8(), u8(), u8())
            if (pos != end) fail("SOS length mismatch")
            if (!progressive) {
              if (ns != comps.length) fail("SOS component count mismatch")
              if (ss != 0 || se != 63 || ahal != 0)
                fail("non-full-spectrum scan — not sequential baseline")
              atScan = true
            } else {
              pos = decodeProgScan(scan, ss, se, ahal >> 4, ahal & 15, pos)
              anyScan = true
            }
          case x if x >= 0xe0 && x <= 0xef => // APPn: skip content
            val len = u16(); pos += len - 2
          case 0xfe => // COM: skip content
            val len = u16(); pos += len - 2
          case other => fail(f"unsupported marker 0x$other%02X")
        }
      }
      // decoded planes at each component's own padded grid
      val planes = comps.map { case (_, h, v, _) =>
        new Array[Int](nx * h * 8 * ny * v * 8)
      }
      if (progressive) {
        // every scan has landed: dequantize + inverse-transform the
        // accumulated coefficients, then fall into the shared
        // upsample/color tail
        var idx = 0
        while (idx < comps.length) {
          val (_, h, _, qId) = comps(idx)
          val qt = qtabs.getOrElse(qId, fail(s"no quantization table $qId"))
          val pw = nx * h * 8
          val bw2 = blocksW(idx)
          val bh2 = blocksH(idx)
          val blockD = new Array[Double](64)
          var byi = 0
          while (byi < bh2) {
            var bxi = 0
            while (bxi < bw2) {
              val off = (byi * bw2 + bxi) * 64
              var n2 = 0
              while (n2 < 64) {
                blockD(n2) = pCoefs(idx)(off + n2).toDouble * qt(n2)
                n2 += 1
              }
              val px = idct(blockD)
              var yy2 = 0
              while (yy2 < 8) {
                var xx2 = 0
                while (xx2 < 8) {
                  planes(idx)((byi * 8 + yy2) * pw + bxi * 8 + xx2) =
                    clamp255(Math.round(px(yy2 * 8 + xx2)) + 128L)
                  xx2 += 1
                }
                yy2 += 1
              }
              bxi += 1
            }
            byi += 1
          }
          idx += 1
        }
      } else {
      val br = new BitReader(bytes, pos, fail)
      val preds = new Array[Int](comps.length)
      val block = new Array[Double](64)
      var mcuDone = 0
      var my = 0
      while (my < ny) {
        var mx = 0
        while (mx < nx) {
          if (restartInterval > 0 && mcuDone > 0 &&
            mcuDone % restartInterval == 0) {
            br.expectRestart((mcuDone / restartInterval - 1) % 8)
            java.util.Arrays.fill(preds, 0)
          }
          var ci = 0
          while (ci < scan.length) {
            val (idx, dcId, acId) = scan(ci)
            val (_, h, v, qId) = comps(idx)
            val qt = qtabs.getOrElse(qId,
              fail(s"no quantization table $qId"))
            val dc = hufs.getOrElse((0, dcId),
              fail(s"no DC Huffman table $dcId"))
            val ac = hufs.getOrElse((1, acId),
              fail(s"no AC Huffman table $acId"))
            val pw = nx * h * 8
            var by = 0
            while (by < v) {
              var bx = 0
              while (bx < h) {
                java.util.Arrays.fill(block, 0.0)
                val cat = dc.decode(br)
                if (cat > 15) fail(s"DC category $cat out of range")
                preds(idx) += extend(br.bits(cat), cat)
                block(0) = preds(idx).toDouble * qt(0)
                var k = 1
                while (k < 64) {
                  val rs = ac.decode(br)
                  if (rs == 0x00) k = 64 // EOB
                  else if (rs == 0xf0) k += 16 // ZRL
                  else {
                    k += rs >> 4
                    if (k > 63) fail("AC run past block end")
                    val vcat = rs & 0x0f
                    block(Zigzag(k)) =
                      extend(br.bits(vcat), vcat).toDouble * qt(Zigzag(k))
                    k += 1
                  }
                }
                val px = idct(block)
                val x0 = (mx * h + bx) * 8
                val y0 = (my * v + by) * 8
                var yy = 0
                while (yy < 8) {
                  var xx = 0
                  while (xx < 8) {
                    planes(idx)((y0 + yy) * pw + x0 + xx) =
                      clamp255(Math.round(px(yy * 8 + xx)) + 128L)
                    xx += 1
                  }
                  yy += 1
                }
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
          mcuDone += 1
          mx += 1
        }
        my += 1
      }
      }
      val outPx = new Array[Int](width * height)
      val pws = comps.map { case (_, h, _, _) => nx * h * 8 }
      var yy = 0
      while (yy < height) {
        var xx = 0
        while (xx < width) {
          def sample(idx: Int): Int = {
            val (_, h, v, _) = comps(idx)
            planes(idx)((yy * v / vmax) * pws(idx) + xx * h / hmax)
          }
          outPx(yy * width + xx) =
            if (comps.length == 1) {
              val l = sample(0)
              (l << 16) | (l << 8) | l
            } else yccToRgb(sample(0), sample(1), sample(2))
          xx += 1
        }
        yy += 1
      }
      (width, height, outPx)
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
