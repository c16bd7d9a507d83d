package graft.ext

import java.io.{BufferedInputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * WARC / WET container ingestion — Common Crawl's on-disk shape (ISO
 * 28500: one record = a `WARC/1.x` version line, CRLF headers, a
 * `Content-Length`-sized payload, a blank-line separator; `.warc.gz`
 * files concatenate one INDEPENDENT gzip member per record so readers
 * can stream and split). The crawl corpora the text pipeline's C4/
 * Gopher recipes target (`TextOps.stripHtml` → `curateCorpus`,
 * TextOps.scala:235) arrive in exactly this container; this reader
 * closes the gap from crawl file to the `documents` shape.
 *
 * Scale shape: FILES are the parallel unit — Common Crawl ships ~90k
 * ~1 GB files per crawl, so the driver lists paths (metadata) and each
 * task STREAMS its files record by record (`GZIPInputStream` walks
 * concatenated members natively): memory is O(one record), never
 * O(file), and no whole-file `binaryFile` materialization happens.
 * Malformed input (bad version line, missing Content-Length, truncated
 * payload, broken separator) fails LOUDLY with file + record index —
 * a silent skip would under-count a corpus build.
 *
 * The HTTP split for `response` records (body after the first CRLFCRLF
 * of the HTTP message) happens inside the same single decode pass —
 * the `ext/Multimodal` codec precedent: per-record imperative parsing
 * where no builtin exists, everything downstream stays declarative.
 *
 * `writeFixture` is the deterministic writer the gates/specs build
 * synthetic crawls with (fixed WARC-Date, ids derived from the URI,
 * gzip member per record; Java's GZIPOutputStream emits MTIME=0, so
 * bytes are reproducible).
 */
object Warc {

  /** One WARC record. `body` = the payload for non-HTTP records; for
    * `response` records whose payload is an HTTP message, the message
    * BODY (after the first CRLFCRLF) — the part a text pipeline wants. */
  final case class Record(file: String, rec_index: Int, warc_type: String,
      record_id: String, target_uri: String, content_type: String,
      content_length: Long, payload: Array[Byte], body: Array[Byte])

  /** All records of every `.warc[.gz]` / `.wet[.gz]` file under
    * `dir` (non-recursive), one task per file. */
  def records(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = new HPath(dir)
    val fs = FileSystem.get(p.toUri, spark.sessionState.newHadoopConf())
    val files = fs.listStatus(p).toSeq.filter(_.isFile)
      .map(_.getPath.toString).filter(f =>
        f.endsWith(".warc") || f.endsWith(".warc.gz") ||
          f.endsWith(".wet") || f.endsWith(".wet.gz")).sorted
    // executor tasks must open files with the SESSION's Hadoop config
    // (fs credentials, s3a/abfs settings) — a bare `new Configuration()`
    // works for local paths but drops object-store auth, which is
    // exactly the Common Crawl scale this reader targets
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    spark.createDataset(files)
      .repartition(math.max(files.size, 1))
      .flatMap { f =>
        val path = new HPath(f)
        val raw = FileSystem.get(path.toUri, confB.value.value).open(path)
        val in: InputStream =
          if (f.endsWith(".gz")) new GZIPInputStream(raw)
          else new BufferedInputStream(raw)
        parseStream(f, in) // iterator closes the stream at exhaustion
      }
      .toDF()
  }

  /** `response` records as (uri, html) — the crawl-to-`stripHtml`
    * bridge; assumes UTF-8 payloads (Common Crawl's convention). */
  def htmlResponses(records: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    records.where(col("warc_type") === "response")
      .select(col("target_uri"), col("body").cast("string").as("html"))
  }

  /** `conversion` records (the WET shape) as (uri, text). */
  def wetTexts(records: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    records.where(col("warc_type") === "conversion")
      .select(col("target_uri"), col("body").cast("string").as("text"))
  }

  /**
   * Canonical form of a crawl URL — the key of URL-level dedup, the
   * cheapest and most universal crawl dedup pass (upstream of any body
   * hashing or MinHash: the same page recrawled under http/https, with
   * a fragment, or with permuted tracker parameters is one document):
   * scheme stripped (http ≡ https), fragment dropped, HOST lowercased
   * (paths stay case-sensitive per RFC 3986), query split at the FIRST
   * `?` and its `&`-separated parameters SORTED in binary order. A
   * pure codegen column expression — no UDF, no driver round trip.
   */
  def canonicalUrl(uri: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val noFrag = regexp_replace(regexp_replace(uri,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://", ""), "#.*$", "")
    val base = substring_index(noFrag, "?", 1)
    val host = lower(substring_index(base, "/", 1))
    val path = base.substr(length(host) + lit(1), length(base))
    val q = noFrag.substr(length(base) + lit(2), length(noFrag))
    concat(host, path,
      when(length(noFrag) > length(base),
        concat(lit("?"), array_join(sort_array(split(q, "&")), "&")))
        .otherwise(lit("")))
  }

  /**
   * URL-level dedup of a crawl: keep the FIRST capture — lowest
   * (file, rec_index) — per canonical URL, with `canonical_url` and
   * the per-URL capture count `url_copies` attached to each survivor.
   *
   * Scale shape: the winner per URL resolves by a key-only aggregate
   * (canonical_url, file, rec_index — bodies never enter that
   * shuffle), then one equi-join whose key includes the UNIQUE record
   * position, so a hot URL recrawled millions of times cannot skew a
   * reducer with its bodies — they spread across (file, rec_index).
   */
  def dedupByUrl(records: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val withCanon = records.withColumn("canonical_url",
      canonicalUrl(col("target_uri")))
    val winners = withCanon
      .groupBy("canonical_url")
      .agg(min(struct(col("file"), col("rec_index"))).as("__w"),
        count(lit(1)).as("url_copies"))
      .select(col("canonical_url").as("__cu"),
        col("__w.file").as("__wf"), col("__w.rec_index").as("__wi"),
        col("url_copies"))
    withCanon.join(winners,
        withCanon("canonical_url") === winners("__cu") &&
          withCanon("file") === winners("__wf") &&
          withCanon("rec_index") === winners("__wi"))
      .drop("__cu", "__wf", "__wi")
  }

  // ------------------------------------------------------------ parser —

  private def parseStream(file: String,
      in: InputStream): Iterator[Record] = new Iterator[Record] {
    private var idx = 0
    private var nextRec: Record = null
    private var done = false

    private def fail(msg: String): Nothing = {
      in.close()
      throw new IllegalArgumentException(
        s"malformed WARC $file record #$idx: $msg")
    }

    /** One CRLF-terminated header line; None = clean EOF at a record
      * boundary. */
    private def readLine(atBoundary: Boolean): Option[String] = {
      val sb = new java.io.ByteArrayOutputStream(128)
      var c = in.read()
      if (c < 0) {
        if (atBoundary) return None
        fail("unexpected EOF inside headers")
      }
      while (c >= 0 && c != '\n') { sb.write(c); c = in.read() }
      if (c < 0) fail("header line without newline (truncated)")
      val s = new String(sb.toByteArray, UTF_8)
      Some(if (s.endsWith("\r")) s.dropRight(1) else s)
    }

    private def advance(): Unit = {
      // skip blank separator lines between records; EOF here is clean
      var line: Option[String] = None
      var looking = true
      while (looking) {
        line = readLine(atBoundary = true)
        looking = line.contains("")
      }
      line match {
        case None => done = true; in.close()
        case Some(version) =>
          if (!version.startsWith("WARC/"))
            fail(s"expected a WARC/1.x version line, got '${version.take(40)}'")
          var headers = Map.empty[String, String]
          var h = readLine(atBoundary = false).get
          while (h.nonEmpty) {
            val i = h.indexOf(':')
            if (i <= 0) fail(s"unparseable header '${h.take(60)}'")
            headers += (h.take(i).trim.toLowerCase -> h.drop(i + 1).trim)
            h = readLine(atBoundary = false).get
          }
          val len = headers.getOrElse("content-length",
            fail("missing Content-Length")).toLong
          // validate BEFORE allocating: a record ≥ 2 GiB (or a corrupt
          // length whose low 32 bits happen to be small) would silently
          // truncate through toInt, read the wrong byte count, and
          // desynchronize the rest of the stream — the fail-loudly
          // contract demands file + record index instead
          if (len < 0 || len > Int.MaxValue)
            fail(s"Content-Length $len outside [0, ${Int.MaxValue}] — " +
              "corrupt or unsupported (records are bounded by the " +
              "per-record gzip-member container)")
          val payload = new Array[Byte](len.toInt)
          var off = 0
          while (off < len) {
            val n = in.read(payload, off, len.toInt - off)
            if (n < 0) fail(
              s"truncated payload: expected $len bytes, got $off")
            off += n
          }
          val wtype = headers.getOrElse("warc-type", fail("missing WARC-Type"))
          val body =
            if (wtype == "response") httpBody(payload)
            else payload
          nextRec = Record(file, idx, wtype,
            headers.getOrElse("warc-record-id", ""),
            headers.getOrElse("warc-target-uri", ""),
            headers.getOrElse("content-type", ""), len, payload, body)
          idx += 1
      }
    }

    override def hasNext: Boolean = {
      if (nextRec == null && !done) advance()
      nextRec != null
    }

    override def next(): Record = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRec
      nextRec = null
      r
    }
  }

  /** The HTTP message body: bytes after the first CRLFCRLF. A payload
    * that is not an HTTP message (no blank line) returns whole — the
    * caller asked for a response's content, not a parse error. */
  private def httpBody(payload: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 4, payload.length)
      i += 1
    }
    payload
  }

  // ------------------------------------------------------------ writer —

  /** Deterministic fixture writer: each (warcType, targetUri,
    * contentType, payload) becomes one record — its own gzip member
    * when `gzip` — with a FIXED date and a URI-derived id, so the same
    * inputs produce byte-identical files. */
  def writeFixture(file: String,
      recs: Iterator[(String, String, String, Array[Byte])],
      gzip: Boolean,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Unit = {
    val p = new HPath(file)
    val out = FileSystem.get(p.toUri, conf).create(p, true)
    try recs.foreach { case (wtype, uri, ctype, payload) =>
      val sink: OutputStream =
        if (gzip) new MemberGzip(out) else out
      val id = "<urn:uuid:" + java.util.UUID.nameUUIDFromBytes(
        uri.getBytes(UTF_8)) + ">"
      val header =
        s"WARC/1.0\r\n" +
          s"WARC-Type: $wtype\r\n" +
          s"WARC-Record-ID: $id\r\n" +
          s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
          s"WARC-Target-URI: $uri\r\n" +
          s"Content-Type: $ctype\r\n" +
          s"Content-Length: ${payload.length}\r\n\r\n"
      sink.write(header.getBytes(UTF_8))
      sink.write(payload)
      sink.write("\r\n\r\n".getBytes(UTF_8))
      sink match {
        case g: MemberGzip => g.finish(); g.end()
        case _ =>
      }
    } finally out.close()
  }

  /** One gzip MEMBER (identical bytes to a plain GZIPOutputStream —
    * fixtures stay byte-reproducible) whose native Deflater is freed
    * eagerly: `finish()` writes the trailer without closing the
    * underlying stream, and `end()` releases the native memory —
    * without it, every record leaks one Deflater until GC, real
    * native-memory churn at corpus-sized record counts. */
  private final class MemberGzip(out: OutputStream)
      extends GZIPOutputStream(out) {
    def end(): Unit = `def`.end()
  }
}
