package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC/WET ingestion: the format a production curation run actually
  * starts from (Common-Crawl-style crawl archives), parsed with the
  * same quarantine semantics as [[graft.ingest.Json.readJsonlFiles]] —
  * a malformed record becomes a quarantined ROW (error set, raw bytes
  * kept), never a failed task, and the parser resynchronizes on the
  * next record marker so one corrupt record cannot eat a 1 GB file.
  *
  * Format (public spec, ISO 28500 / WARC 1.1; also the reference for
  * Common Crawl WET "conversion" records, which are plain WARC): each
  * record is `WARC/1.x CRLF`, header lines `Name: value CRLF`, a blank
  * CRLF, exactly `Content-Length` payload BYTES, then CRLF CRLF. The
  * payload is sliced by Content-Length — never by delimiter scanning —
  * so binary payloads containing `CRLF CRLF` round-trip bit-exactly.
  *
  * Scale shape: WARC.gz members are not splittable, so the unit of
  * parallelism is the FILE — exactly how Common Crawl ships (segments
  * of ~1 GB gzip files; a 100 TB crawl is ~10⁵ files = ample tasks for
  * 1000 executors). Each task decodes one file streaming through the
  * gzip codec (multi-member per the gzip RFC 1952 — Java's
  * GZIPInputStream concatenates members) and emits records; payload
  * bytes stay in the task that read them — downstream projections
  * (text extraction, digests) should run before any shuffle.
  * `binaryFile` caps a single file at Int.MaxValue bytes, which is the
  * crawl-segment contract anyway. */
object Warc {

  /** One parsed record (or one quarantined byte range, `error` set).
    * `payload` for a quarantined range is the raw unparsed bytes up to
    * the next record marker — the dead-letter content. */
  final case class WarcRecord(
      path: String,
      record_idx: Long,
      warc_version: String,
      warc_type: String,
      target_uri: String,
      record_id: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      headers: Map[String, String],
      payload: Array[Byte],
      error: String)

  private val Marker = "WARC/".getBytes(UTF_8)

  private def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  /** Decoded prefix of a gzip buffer: `data` = the concatenation of
    * every VALID member, `consumed` = exact input bytes those members
    * span, `error` = null iff the whole buffer decoded. A non-null
    * error means bytes [consumed, length) are an undecodable remainder
    * the caller must quarantine — NOT silently drop. */
  private[graft] final case class Gunzipped(data: Array[Byte], consumed: Int,
      error: String)

  /** Fully decode a (possibly multi-member) gzip buffer, MEMBER BY
    * MEMBER with exact byte accounting (RFC 1952 framing + raw-deflate
    * Inflater + CRC32/ISIZE trailer check). `GZIPInputStream` over a
    * concatenated buffer treats a garbage member header after a valid
    * member as clean EOF — silent record loss; here a garbage,
    * truncated, or CRC-failing member stops the decode with the
    * remainder reported so the caller can quarantine it. */
  private[graft] def gunzipMembers(bytes: Array[Byte]): Gunzipped = {
    // initial-capacity HINT only — clamped so a ~1 GB segment cannot
    // overflow Int (negative size throws) or eagerly grab 4 GB
    val out = new ByteArrayOutputStream(
      math.min(bytes.length.toLong * 4, 1L << 26).toInt max 64)
    var pos = 0
    var err: String = null
    while (err == null && pos < bytes.length) {
      if (!(pos + 2 <= bytes.length && (bytes(pos) & 0xff) == 0x1f &&
          (bytes(pos + 1) & 0xff) == 0x8b))
        err = s"not a gzip member header at offset $pos"
      else decodeMember(bytes, pos) match {
        case Right((data, next)) => out.write(data, 0, data.length); pos = next
        case Left(e) => err = e
      }
    }
    Gunzipped(out.toByteArray, pos, err)
  }

  /** Decode ONE gzip member starting at `pos`: parse the RFC 1952
    * header (FEXTRA/FNAME/FCOMMENT/FHCRC honored), inflate the raw
    * deflate stream, verify the CRC32 + ISIZE trailer. Returns the
    * member's decoded bytes and the offset just past its trailer, or
    * an error (nothing consumed). */
  private def decodeMember(bytes: Array[Byte],
      pos: Int): Either[String, (Array[Byte], Int)] = {
    def fail(m: String) = Left(s"gzip member at offset $pos: $m")
    if (pos + 10 > bytes.length) return fail("truncated header")
    if ((bytes(pos + 2) & 0xff) != 8)
      return fail(s"unknown compression method ${bytes(pos + 2) & 0xff}")
    val flg = bytes(pos + 3) & 0xff
    var i = pos + 10
    if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
      if (i + 2 > bytes.length) return fail("truncated FEXTRA length")
      i += 2 + ((bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8))
      if (i > bytes.length) return fail("truncated FEXTRA payload")
    }
    for (bit <- Seq(8, 16)) if ((flg & bit) != 0) { // FNAME / FCOMMENT
      while (i < bytes.length && bytes(i) != 0) i += 1
      if (i >= bytes.length) return fail("unterminated FNAME/FCOMMENT")
      i += 1
    }
    if ((flg & 2) != 0) { // FHCRC
      if (i + 2 > bytes.length) return fail("truncated FHCRC")
      i += 2
    }
    val inf = new java.util.zip.Inflater(true)
    val out = new ByteArrayOutputStream(
      math.min((bytes.length - i).toLong * 4, 1L << 26).toInt max 64)
    val crc = new java.util.zip.CRC32
    try {
      inf.setInput(bytes, i, bytes.length - i)
      val buf = new Array[Byte](1 << 16)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case e: java.util.zip.DataFormatException =>
            return fail(s"corrupt deflate stream: ${e.getMessage}") }
        if (n > 0) { out.write(buf, 0, n); crc.update(buf, 0, n) }
        else if (!inf.finished())
          return fail("truncated deflate stream")
      }
      val trailer = i + inf.getBytesRead.toInt
      if (trailer + 8 > bytes.length) return fail("truncated trailer")
      def le32(o: Int): Long =
        ((bytes(o) & 0xffL)) | ((bytes(o + 1) & 0xffL) << 8) |
          ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      if (le32(trailer) != crc.getValue)
        return fail("CRC32 mismatch")
      if (le32(trailer + 4) != (out.size().toLong & 0xffffffffL))
        return fail("ISIZE mismatch")
      Right((out.toByteArray, trailer + 8))
    } finally inf.end()
  }

  /** Index of the next `WARC/` marker at or after `from` that sits at
    * a record boundary (start of buffer or right after a CRLF) — the
    * resynchronization point after a malformed record. */
  private def nextMarker(b: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    while (i <= b.length - Marker.length) {
      var j = 0
      while (j < Marker.length && b(i + j) == Marker(j)) j += 1
      if (j == Marker.length &&
        (i == 0 || (i >= 2 && b(i - 2) == '\r' && b(i - 1) == '\n')))
        return i
      i += 1
    }
    -1
  }

  /** Read one CRLF-terminated header line starting at `i`; returns
    * (line without CRLF, index after CRLF) or null if no CRLF before
    * EOF (truncation). Header lines are ASCII per spec; decoded UTF-8
    * for tolerance. */
  private def readLine(b: Array[Byte], i: Int): (String, Int) = {
    var j = i
    while (j < b.length - 1 && !(b(j) == '\r' && b(j + 1) == '\n')) j += 1
    if (j >= b.length - 1) null
    else (new String(b, i, j - i, UTF_8), j + 2)
  }

  /** Parse a whole (decoded) WARC buffer into records + quarantines. */
  def parseBuffer(path: String,
      bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    var idx = 0L
    def quarantine(from: Int, until: Int, err: String): Unit = {
      out += WarcRecord(path, idx, null, null, null, null, null, null,
        -1L, Map.empty, java.util.Arrays.copyOfRange(bytes, from, until),
        err)
      idx += 1
    }
    var pos = 0
    // leading garbage before the first marker is quarantined once
    val first = nextMarker(bytes, 0)
    if (first < 0) {
      if (bytes.nonEmpty) quarantine(0, bytes.length, "no WARC record marker")
      return out.result()
    }
    if (first > 0) quarantine(0, first, "leading bytes before first record")
    pos = first
    while (pos >= 0 && pos < bytes.length) {
      val recStart = pos
      def fail(err: String): Unit = {
        val next = nextMarker(bytes, recStart + Marker.length)
        val until = if (next < 0) bytes.length else next
        quarantine(recStart, until, err)
        pos = next
      }
      readLine(bytes, pos) match {
        case null => fail("truncated version line")
        case (version, afterVersion) if !version.startsWith("WARC/") =>
          fail(s"bad version line: $version")
        case (version, afterVersion) =>
          // header block until the blank CRLF line
          var hdrs = Map.empty[String, String]
          var i = afterVersion
          var done = false
          var broken: String = null
          while (!done && broken == null) {
            readLine(bytes, i) match {
              case null => broken = "truncated header block"
              case ("", after) => i = after; done = true
              case (line, after) =>
                val c = line.indexOf(':')
                if (c <= 0) broken = s"malformed header line: $line"
                else {
                  hdrs += (line.substring(0, c).trim -> line.substring(c + 1).trim)
                  i = after
                }
            }
          }
          if (broken != null) fail(broken)
          else {
          // ISO 28500 field names are case-insensitive: look up via a
          // lowercased key map; `hdrs` keeps the raw casing for the
          // headers column
          val lk = hdrs.map { case (k, v) =>
            k.toLowerCase(java.util.Locale.ROOT) -> v }
          lk.get("content-length").flatMap(_.toLongOption) match {
            case None => fail("missing or non-numeric Content-Length")
            case Some(len) if len < 0 => fail("negative Content-Length")
            case Some(len) if len > Int.MaxValue - 8 =>
              fail(s"Content-Length $len exceeds the per-record buffer cap")
            case Some(len) if i + len > bytes.length =>
              fail(s"truncated payload: need $len bytes, have ${bytes.length - i}")
            case Some(len) =>
              val payload =
                java.util.Arrays.copyOfRange(bytes, i, i + len.toInt)
              out += WarcRecord(path, idx, version,
                lk.getOrElse("warc-type", null),
                lk.getOrElse("warc-target-uri", null),
                lk.getOrElse("warc-record-id", null),
                lk.getOrElse("warc-date", null),
                lk.getOrElse("content-type", null),
                len, hdrs, payload, null)
              idx += 1
              // spec: CRLF CRLF after the payload; tolerate EOF (last
              // record) and resync otherwise
              val after = i + len.toInt
              val tail = nextMarker(bytes, after)
              if (after >= bytes.length) pos = -1
              else if (tail < 0) {
                // trailing bytes after last record that never reach a
                // marker: the record separator (up to 4 CRLF bytes) is
                // expected framing; anything more is quarantined
                if (bytes.length - after > 4)
                  quarantine(after, bytes.length, "trailing bytes after last record")
                pos = -1
              } else {
                if (tail - after > 4)
                  quarantine(after, tail, "inter-record garbage")
                pos = tail
              }
          }
          }
      }
    }
    out.result()
  }

  /** Parse one file's raw bytes (gzip auto-detected by magic, so
    * `.warc`, `.warc.gz` and `.wet.gz` all work). Gzip decode is
    * member-by-member with byte accounting: valid members parse
    * normally and an undecodable REMAINDER (garbage member header
    * after a valid member, truncation, CRC failure) becomes one
    * quarantine record carrying the raw undecoded bytes — never a
    * silent drop, never a failed task. A file whose very first member
    * is undecodable quarantines as one record, as before. */
  def parseFile(path: String,
      bytes: Array[Byte]): Seq[WarcRecord] =
    if (!isGzip(bytes)) parseBuffer(path, bytes)
    else {
      val g = gunzipMembers(bytes)
      if (g.consumed == 0)
        Seq(WarcRecord(path, 0L, null, null, null, null,
          null, null, -1L, Map.empty, bytes, g.error))
      else {
        val recs = parseBuffer(path, g.data)
        if (g.error == null) recs
        else recs :+ WarcRecord(path, recs.length.toLong, null, null,
          null, null, null, null, -1L, Map.empty,
          java.util.Arrays.copyOfRange(bytes, g.consumed, bytes.length),
          s"undecoded gzip remainder (${bytes.length - g.consumed} " +
            s"bytes): ${g.error}")
      }
    }

  /** Read a directory (or glob) of WARC/WET files into a DataFrame:
    * (path, record_idx, warc_version, warc_type, target_uri,
    * record_id, warc_date, content_type, content_length, headers,
    * payload, error) — `error` IS NULL for clean records, set for
    * quarantined byte ranges (the JSONL dead-letter posture). One task
    * per file (gzip is not splittable); see the object doc for why
    * that is the right 100 TB shape. */
  def readWarcFiles(spark: SparkSession, path: String): DataFrame =
    readWarcFiles(spark, Seq(path))

  /** Multi-path form — the [[IncrementalFiles.readNewWarc]] entry
    * point (an increment is an explicit file list, not a glob). */
  def readWarcFiles(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => parseFile(p, bytes) }
      .toDF()
  }

  /** Parsed crawl records → the documents-shaped frame the curation
    * tier ingests (url, record_id, warc_date, text + envelope/decode
    * columns): WET `conversion` payloads are plain text — UTF-8 by the
    * Common Crawl WET convention, decoded STRICTLY with a windows-1252
    * fallback ([[graft.expressions.PlainTextDecode]]) so a corrupt
    * payload reports its real charset instead of silent U+FFFD
    * mojibake; `response` payloads carry an HTTP
    * message, decoded byte-exactly by
    * [[graft.expressions.HttpBodyDecode]] — body after the first CRLF
    * CRLF, `Content-Encoding: gzip/deflate` honored, charset resolved
    * Content-Type param → meta sniff → UTF-8-strict-else-windows-1252.
    * An undecodable body yields a NULL text with `decode_error` set
    * (the quarantine posture). Quarantined and non-document record
    * types (warcinfo, request, metadata) are filtered.
    *
    * A pure projection over the record frame — decompression, charset
    * trial, and the body slice run in the task that parsed the file,
    * before any shuffle; compose [[graft.functions.TextAnalysis]]
    * gates directly downstream. Output: (url, record_id, warc_date,
    * http_status, http_content_type, text, charset, content_encoding,
    * decode_error). */
  def documentsFrame(records: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftglue.Bridge
    // ISO-8859-1 decode for the ENVELOPE extracts: byte-position-exact
    // (headers are ASCII per spec; a binary body cannot shift offsets)
    val txt = decode(col("payload"), "ISO-8859-1")
    val bodyPos = locate("\r\n\r\n", txt)
    val isResp = col("warc_type") === "response"
    // HTTP envelope signals a crawl gate reads (status != 200 and
    // non-text content-type rows are dropped before the text tier):
    // RE2-safe extracts over the HEADER BLOCK only — a Content-Type
    // string inside the body must not match
    val hdr = when(bodyPos > 0, txt.substr(lit(1), bodyPos - 1))
      .otherwise(txt)
    val status = regexp_extract(hdr, "^HTTP/[0-9.]+ ([0-9]{3})", 1)
    val ctype = regexp_extract(hdr,
      "(?i)(?:^|\r\n)content-type:\\s*([^\r\n;]+)", 1)
    val dec = Bridge.column(
      graft.expressions.HttpBodyDecode(Bridge.expression(col("payload"))))
    // conversion payloads take the SAME strict-UTF-8-else-windows-1252
    // trial as an undeclared response body — Spark's lenient decode
    // would report charset='utf-8' while silently replacing malformed
    // bytes with U+FFFD (mojibake into dedup digests/quality gates)
    val pdec = Bridge.column(
      graft.expressions.PlainTextDecode(Bridge.expression(col("payload"))))
    records
      .filter(col("error").isNull &&
        col("warc_type").isin("conversion", "response"))
      // CaseWhen is lazy per row: WET conversion records never pay the
      // HTTP envelope scan/decompress/charset trial and response
      // records never pay the plain trial
      .withColumn("__dec", when(isResp, dec))
      .withColumn("__pdec", when(!isResp, pdec))
      .select(col("target_uri").as("url"), col("record_id"),
        col("warc_date"),
        when(isResp && status =!= "", status.cast("int"))
          .otherwise(lit(null).cast("int")).as("http_status"),
        when(isResp && ctype =!= "", lower(trim(ctype)))
          .otherwise(lit(null).cast("string")).as("http_content_type"),
        when(isResp, col("__dec.text"))
          .otherwise(col("__pdec.text")).as("text"),
        when(isResp, col("__dec.charset"))
          .otherwise(col("__pdec.charset")).as("charset"),
        when(isResp, col("__dec.content_encoding"))
          .otherwise(lit(null).cast("string")).as("content_encoding"),
        when(isResp, col("__dec.error"))
          .otherwise(lit(null).cast("string")).as("decode_error"))
  }

  /** URL-level crawl dedup — the keep-latest-per-URL pass between WARC
    * ingestion and the text tiers: the same page re-crawled across
    * segments (or reached via casing/trailing-slash/tracking-param URL
    * variants) must enter dedup/quality gates ONCE, as its latest
    * capture. Keys on [[graft.functions.UrlOps.canonical]] of `urlCol`
    * and keeps the row with the max (`dateCol`, `tieCol`) — WARC dates
    * are ISO 8601, so lexicographic max IS chronological; `tieCol`
    * (record_id) makes same-instant recrawls deterministic. NULL dates
    * lose to any dated capture (coalesced to "").
    *
    * Scale shape: ONE hash aggregation (`max_by` of the whole row) on
    * the canonical key — the CDC keep-latest shape
    * ([[graft.operators.Analytics]] `applyChangelog`), no window over
    * the corpus. Partial aggregation collapses same-key recrawls
    * map-side, so at Common-Crawl recrawl rates the shuffle carries
    * barely more than one row per URL. Output: `canonical_url` + the
    * input columns of the kept row. */
  def latestByUrl(docs: DataFrame, urlCol: String = "url",
      dateCol: String = "warc_date",
      tieCol: String = "record_id"): DataFrame = {
    require(Seq(urlCol, dateCol, tieCol).forall(docs.columns.contains),
      s"latestByUrl needs ($urlCol, $dateCol, $tieCol), got " +
        docs.columns.mkString(", "))
    val others = docs.columns.toSeq
    // canonical() maps an unparseable target URI (no scheme://host —
    // e.g. angle-bracket-wrapped URIs some WARC writers emit) to ""
    // and a NULL url to NULL; keying on that verbatim would collapse
    // EVERY such record into one group and max_by would silently keep
    // exactly one. Fall back to the RAW url (each distinct unparseable
    // string stays its own group — no data loss), and give url-less
    // records a per-record surrogate key (tieCol) so none is dropped;
    // their canonical_url reads back as NULL.
    val canon = graft.functions.UrlOps.canonicalWithQuery(col(urlCol))
    val key = when(col(urlCol).isNull,
        concat(lit(NoUrlKeyPrefix), col(tieCol).cast("string")))
      .when(canon === "", col(urlCol).cast("string"))
      .otherwise(canon)
    docs
      .withColumn("__canon", key)
      .groupBy(col("__canon"))
      .agg(max_by(struct(others.map(col): _*),
        struct(coalesce(col(dateCol).cast("string"), lit("")),
          col(tieCol))).as("__r"))
      .select(when(col("__canon").startsWith(NoUrlKeyPrefix),
          lit(null).cast("string"))
          .otherwise(col("__canon")).as("canonical_url") +:
        others.map(c => col(s"__r.`$c`").as(c)): _*)
  }

  /** Surrogate group-key prefix for url-less records in
    * [[latestByUrl]] — U+0000 cannot appear in a real URL, so the
    * prefix cannot collide with a canonical key. */
  private val NoUrlKeyPrefix = "\u0000nourl:"

  /** WARC `revisit` records (ISO 28500; the Common Crawl dedupe
    * convention): a revisit marks "this URL was fetched again and the
    * content was unchanged" — it carries no body worth the text tier,
    * but its `warc_date` is a FRESHNESS signal the URL-dedup tier
    * should absorb instead of dropping. Scan-local projection; the
    * refers-to headers are looked up case-insensitively (the parser
    * keeps raw casing in the headers column). Output: (url, record_id,
    * warc_date, refers_to, refers_to_date). */
  def revisitFrame(records: DataFrame): DataFrame = {
    // FIRST case-insensitive match per field — a map_from_entries of
    // lowercased keys would THROW on case-variant duplicate headers
    // (mapKeyDedupPolicy=EXCEPTION), violating the never-fail posture.
    // `get` (0-based) returns NULL on an empty filter result where
    // element_at would throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT under
    // ANSI mode — WARC-Refers-To-Date is a WARC 1.1 OPTIONAL header,
    // so a revisit without it must yield NULL, not a failed task
    def hdr(name: String) = get(filter(
      map_entries(col("headers")),
      e => lower(e.getField("key")) === name), lit(0)).getField("value")
    records
      .filter(col("error").isNull && col("warc_type") === "revisit")
      .select(col("target_uri").as("url"), col("record_id"),
        col("warc_date"),
        hdr("warc-refers-to").as("refers_to"),
        hdr("warc-refers-to-date").as("refers_to_date"))
  }

  /** [[latestByUrl]] with revisit freshness folded in: the kept row
    * per canonical URL is still the latest CAPTURE (revisits carry no
    * body), and `last_seen` = max(kept capture date, any revisit date
    * for the URL) — the signal a recrawl scheduler reads (a page whose
    * last_seen is a recent revisit need not be refetched even though
    * its body capture is old). Revisits for URLs with no capture are
    * dropped — there is nothing to keep. One extra registry-shaped
    * aggregation + one join on the canonical key; text still shuffles
    * at most once, in latestByUrl. */
  def latestWithRevisits(docs: DataFrame, revisits: DataFrame,
      urlCol: String = "url", dateCol: String = "warc_date",
      tieCol: String = "record_id"): DataFrame = {
    val kept = latestByUrl(docs, urlCol, dateCol, tieCol)
    val rv = revisits
      .select(graft.functions.UrlOps.canonicalWithQuery(col(urlCol))
        .as("canonical_url"),
        col(dateCol).cast("string").as("__rd"))
      .filter(col("__rd").isNotNull)
      .groupBy("canonical_url").agg(max(col("__rd")).as("__rv_max"))
    kept.join(rv, Seq("canonical_url"), "left")
      .withColumn("last_seen",
        greatest(coalesce(col(dateCol).cast("string"), lit("")),
          coalesce(col("__rv_max"), lit(""))))
      .drop("__rv_max")
  }

  // ---- fixture/writer side (tests and deterministic oracles) ----

  /** Serialize one record with correct Content-Length framing. */
  def buildRecord(version: String, headers: Seq[(String, String)],
      payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(version).append("\r\n")
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(UTF_8)
    val out = new ByteArrayOutputStream(head.length + payload.length + 4)
    out.write(head); out.write(payload); out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  /** Gzip a buffer (single member). */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(out)
    gz.write(bytes); gz.close()
    out.toByteArray
  }

  /** zlib-deflate a buffer (the HTTP `deflate` content coding). */
  def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(bytes); d.finish()
    val out = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
    d.end()
    out.toByteArray
  }
}
