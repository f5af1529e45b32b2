package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 / WARC/1.0) container reader + writer — the crawl
  * interchange format, completing the web front door from RAW ARCHIVE
  * BYTES: WARC files → [[WarcIO.readPages]] → (page_id, url, html,
  * source) → [[graft.pipeline.WebCurate.run]].
  *
  * Record layout (public spec): `WARC/1.0\r\n`, named header fields
  * (`Name: value\r\n` each), `\r\n`, exactly `Content-Length` payload
  * bytes, `\r\n\r\n` separator. A `response` record's payload is an HTTP
  * response (status line, headers, blank line, entity body). Files open
  * with a `warcinfo` record describing the capture (we carry the crawl
  * SOURCE label there, one collection per file — the Common-Crawl
  * convention of segment-scoped metadata).
  *
  * Page identity: readers need stable doc ids. `WARC-Record-ID` is "a
  * globally unique identifier assigned to the record" (any URI scheme),
  * so the writer mints `<urn:graft:page:N>` from the page id and the
  *reader recovers N — exactly how production pipelines derive doc ids
  * from record ids (parse when structured, hash when not; non-URN ids
  * here fall back to a 63-bit xxhash of the id string, documented).
  *
  * Scale posture: one WARC file = one indivisible parse unit (records
  * are sequential within a file; real crawls shard into many ~1 GB
  * files, so file-level parallelism IS the parallelism — the
  * binaryFile source distributes files across partitions and bytes
  * never shuffle; only the extracted page rows do).
  *
  * `.warc.gz` transport (r12): Common Crawl ships WARC as CONCATENATED
  * GZIP MEMBERS, ONE RECORD PER MEMBER (the WARC spec's annex D form —
  * member boundaries give readers random access to records without
  * decompressing the file). The writer ([[renderFileGz]]) emits exactly
  * that layout via JDK `GZIPOutputStream` (one member per record, spec-
  * pinned byte-identical to independently gzipping each record); the
  * reader ([[gunzipAll]]) uses JDK `GZIPInputStream`, which walks
  * concatenated members natively, then parses the joined stream with the
  * same strict [[parseRecords]]. [[pagesOfWarcRows]] sniffs the 2-byte
  * gzip magic per file, so batch, streaming, and mixed plain/gz
  * directories all share one decode path. */
object WarcIO {

  final case class WarcRecord(headers: Seq[(String, String)],
      body: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
  }

  private val Crlf = "\r\n"

  // ── writer ───────────────────────────────────────────────────────────

  /** Render one record: version line, headers (Content-Length appended),
    * blank line, body, record separator. */
  def render(rec: WarcRecord): Array[Byte] = {
    val head = new StringBuilder("WARC/1.0").append(Crlf)
    rec.headers.foreach { case (k, v) =>
      require(!k.contains(":") && !(k + v).exists(c => c == '\r' || c == '\n'),
        s"malformed WARC header: $k")
      head.append(k).append(": ").append(v).append(Crlf)
    }
    head.append("Content-Length: ").append(rec.body.length).append(Crlf)
    head.append(Crlf)
    val hb = head.toString.getBytes("UTF-8")
    val out = new Array[Byte](hb.length + rec.body.length + 4)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(rec.body, 0, out, hb.length, rec.body.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** One WARC file's bytes: a `warcinfo` record naming the collection
    * (source label) followed by one `response` record per page. */
  def renderFile(source: String,
      pages: Iterator[(Long, String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(render(WarcRecord(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<urn:graft:warcinfo:$source>",
      "Content-Type" -> "application/warc-fields"),
      s"software: graft${Crlf}collection: $source$Crlf".getBytes("UTF-8"))))
    pages.foreach { case (pageId, url, html) =>
      val entity = html.getBytes("UTF-8")
      val http = (s"HTTP/1.1 200 OK${Crlf}Content-Type: text/html$Crlf" +
        s"Content-Length: ${entity.length}$Crlf$Crlf").getBytes("UTF-8")
      out.write(render(WarcRecord(Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:graft:page:$pageId>",
        "WARC-Target-URI" -> url,
        "Content-Type" -> "application/http; msgtype=response"),
        http ++ entity)))
    }
    out.toByteArray
  }

  // ── gzip transport (.warc.gz: one gzip member per record) ───────────

  /** One gzip member holding `bytes`. JDK `GZIPOutputStream` writes no
    * MTIME/FNAME (header fields zeroed), so output is deterministic for
    * a given input on a given JDK — the fixture stamp's requirement. */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    try { gz.write(bytes); gz.finish() } finally gz.close()
    bos.toByteArray
  }

  /** Decompress ALL concatenated gzip members, STRICTLY: any truncated
    * or corrupt member — including a damaged SECOND-or-later member
    * header and trailing garbage — throws, so a damaged `.warc.gz`
    * surfaces at the caller as an unparseable file instead of a silently
    * shorter archive.
    *
    * Member-by-member on purpose (r13, ADVICE): JDK `GZIPInputStream`
    * reads through member boundaries natively BUT its `readTrailer`
    * swallows any IOException thrown while probing the NEXT member's
    * header and reports end-of-stream — a corrupt later header or
    * trailing garbage would silently DROP every following record. Here
    * each member's header is parsed explicitly (magic/CM/FLG fields),
    * its deflate stream inflated with a raw `Inflater` (which reports
    * exactly how many input bytes it consumed), and its CRC32/ISIZE
    * trailer verified; decoding must consume the input EXACTLY to the
    * end. */
  def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.isEmpty) return bytes // zero members ⇒ zero bytes
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    var off = 0
    while (off < bytes.length) off = inflateMember(bytes, off, out)
    out.toByteArray
  }

  /** Decode ONE gzip member starting at `off`, appending its payload to
    * `out`; returns the offset just past the member's 8-byte trailer.
    * Throws `ZipException` on any malformation. */
  private def inflateMember(bytes: Array[Byte], off0: Int,
      out: java.io.ByteArrayOutputStream): Int = {
    def fail(msg: String): Nothing =
      throw new java.util.zip.ZipException(
        s"$msg (member starting at offset $off0)")
    var off = off0
    def u8(): Int = {
      if (off >= bytes.length) fail("truncated gzip header")
      val b = bytes(off) & 0xff; off += 1; b
    }
    if (u8() != 0x1f || u8() != 0x8b) fail("bad gzip magic")
    if (u8() != 8) fail("unsupported gzip compression method")
    val flg = u8()
    if ((flg & 0xe0) != 0) fail("reserved gzip FLG bits set") // RFC 1952 §2.3.1
    off += 6 // MTIME(4) + XFL + OS (ignorable per RFC 1952)
    if (off > bytes.length) fail("truncated gzip header")
    if ((flg & 0x04) != 0) { // FEXTRA: XLEN then XLEN payload bytes
      val xl = u8() | (u8() << 8); off += xl
      if (off > bytes.length) fail("truncated gzip header") // inside FEXTRA
    }
    if ((flg & 0x08) != 0) while (u8() != 0) () // FNAME (NUL-terminated)
    if ((flg & 0x10) != 0) while (u8() != 0) () // FCOMMENT
    if ((flg & 0x02) != 0) { // FHCRC: 2-byte header CRC16
      off += 2
      if (off > bytes.length) fail("truncated gzip header") // inside FHCRC
    }
    if (off > bytes.length) fail("truncated gzip header")
    val inf = new java.util.zip.Inflater(true) // raw deflate
    try {
      inf.setInput(bytes, off, bytes.length - off)
      val buf = new Array[Byte](64 * 1024)
      val crc = new java.util.zip.CRC32()
      var isize = 0L
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case e: java.util.zip.DataFormatException =>
            fail(s"corrupt deflate stream: ${e.getMessage}") }
        if (n > 0) { crc.update(buf, 0, n); out.write(buf, 0, n); isize += n }
        else if (!inf.finished()) {
          if (inf.needsInput()) fail("truncated deflate stream")
          else fail("inflater stalled") // unreachable for valid gzip
        }
      }
      off += inf.getBytesRead.toInt
      if (off + 8 > bytes.length) fail("truncated gzip trailer")
      def u32(): Long = {
        val v = (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
          ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
        off += 4; v
      }
      if (u32() != crc.getValue) fail("gzip CRC32 mismatch")
      if (u32() != (isize & 0xffffffffL)) fail("gzip ISIZE mismatch")
      off
    } finally inf.end()
  }

  private def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte

  /** One `.warc.gz` file's bytes: [[renderFile]]'s records, each record
    * its own gzip member, members concatenated — the Common Crawl
    * transport layout. Layout is spec-pinned (WarcGzSpec): the output
    * equals gzipping each rendered record independently, so a
    * range-reader seeking to a member boundary decompresses exactly one
    * record. */
  def renderFileGz(source: String,
      pages: Iterator[(Long, String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    // reuse renderFile's record framing by re-rendering per record
    out.write(gzipMember(render(WarcRecord(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<urn:graft:warcinfo:$source>",
      "Content-Type" -> "application/warc-fields"),
      s"software: graft${Crlf}collection: $source$Crlf".getBytes("UTF-8")))))
    pages.foreach { case (pageId, url, html) =>
      val entity = html.getBytes("UTF-8")
      val http = (s"HTTP/1.1 200 OK${Crlf}Content-Type: text/html$Crlf" +
        s"Content-Length: ${entity.length}$Crlf$Crlf").getBytes("UTF-8")
      out.write(gzipMember(render(WarcRecord(Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:graft:page:$pageId>",
        "WARC-Target-URI" -> url,
        "Content-Type" -> "application/http; msgtype=response"),
        http ++ entity))))
    }
    out.toByteArray
  }

  // ── parser ───────────────────────────────────────────────────────────

  /** Parse every record in a WARC file. Strict: a malformed version
    * line, header, or truncated body aborts with None (the codec
    * "None, never garbage" posture — a half-parsed crawl file must
    * surface as a unit, not as silently-missing tail records). */
  def parseRecords(bytes: Array[Byte]): Option[Seq[WarcRecord]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var off = 0
    def lineEnd(from: Int): Int = { // index of the \r in the next CRLF
      var i = from
      while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n'))
        i += 1
      if (i + 1 < bytes.length) i else -1
    }
    while (off < bytes.length) {
      val ve = lineEnd(off)
      if (ve < 0) return None
      if (new String(bytes, off, ve - off, "UTF-8") != "WARC/1.0") return None
      var p = ve + 2
      val headers = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var blank = false
      while (!blank) {
        val he = lineEnd(p)
        if (he < 0) return None
        if (he == p) { blank = true; p += 2 }
        else {
          val line = new String(bytes, p, he - p, "UTF-8")
          val c = line.indexOf(':')
          if (c <= 0) return None
          headers += ((line.substring(0, c).trim, line.substring(c + 1).trim))
          p = he + 2
        }
      }
      val len = headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase("Content-Length") => v
      }.flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(return None)
      if (len < 0 || p + len + 4 > bytes.length) return None
      val body = java.util.Arrays.copyOfRange(bytes, p, p + len)
      p += len
      if (!(bytes(p) == '\r' && bytes(p + 1) == '\n' &&
        bytes(p + 2) == '\r' && bytes(p + 3) == '\n')) return None
      out += WarcRecord(
        headers.filterNot(_._1.equalsIgnoreCase("Content-Length")).toSeq, body)
      off = p + 4
    }
    Some(out.toSeq)
  }

  /** HTTP entity body of a response payload (bytes after the first
    * CRLFCRLF); None when no header/body split exists. */
  def httpBody(payload: Array[Byte]): Option[Array[Byte]] = {
    var i = 0
    while (i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n')
        return Some(java.util.Arrays.copyOfRange(payload, i + 4, payload.length))
      i += 1
    }
    None
  }

  private val PageUrn = "<urn:graft:page:(\\d+)>".r

  /** Crawl pages from a directory of WARC files, in WebCurate's input
    * shape (page_id, url, html, source). Each file parses inside its own
    * task (binaryFile rows distribute across partitions; bytes never
    * shuffle); the file's warcinfo collection field becomes `source`.
    * Strict per file: an unparseable file fails the job loudly rather
    * than dropping records — crawl-side quarantining belongs to the
    * transport layer, not a silent reader. */
  def readPages(spark: SparkSession, dir: String): DataFrame = {
    // pathGlobFilter, not a /*.warc path glob: the glob form resolves
    // through a fallback that logs a spurious FileNotFoundException
    // stack per session before succeeding (observed r11 bench noise)
    pagesOfWarcRows(spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc").load(dir))
  }

  /** Crawl pages from a directory of `.warc.gz` files (gzip-member-per-
    * record, the Common Crawl transport) — same shape, same strictness,
    * same file-level parallelism as [[readPages]]; decompression happens
    * inside each file's parse task (compressed bytes never shuffle, and
    * the decompressed form never materializes outside the task). */
  def readPagesGz(spark: SparkSession, dir: String): DataFrame =
    pagesOfWarcRows(spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz").load(dir))

  /** The per-file parse over any (path, content) binaryFile frame —
    * shared by the batch [[readPages]] and the streaming
    * [[graft.streaming.StreamingWarcIngest]] (batch≡stream parity by
    * shared definition). */
  def pagesOfWarcRows(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, raw) =>
        // transport sniff: gzip magic ⇒ concatenated-member decompress
        // (the .warc.gz form); plain bytes parse directly. Per-file, so
        // mixed directories and both batch/stream callers share the path.
        val bytes = if (isGzip(raw)) gunzipAll(raw) else raw
        val recs = parseRecords(bytes).getOrElse(
          throw new IllegalArgumentException(s"unparseable WARC file: $path"))
        val source = recs.headOption
          .filter(_.header("WARC-Type").contains("warcinfo"))
          .flatMap(r => new String(r.body, "UTF-8").linesIterator
            .collectFirst { case l if l.startsWith("collection: ") =>
              l.stripPrefix("collection: ") })
          .getOrElse("unknown")
        recs.iterator
          .filter(_.header("WARC-Type").contains("response"))
          .map { r =>
            val id = r.header("WARC-Record-ID") match {
              case Some(PageUrn(n)) => n.toLong
              case other => // non-URN ids: stable 63-bit hash (documented)
                scala.util.hashing.MurmurHash3
                  .stringHash(other.getOrElse("")).toLong & Long.MaxValue
            }
            val html = httpBody(r.body)
              .map(new String(_, "UTF-8")).getOrElse("")
            (id, r.header("WARC-Target-URI").getOrElse(""), html, source)
          }.toSeq
      }
      .toDF("page_id", "url", "html", "source")
  }

  /** DISTRIBUTED WARC writer — the 100 TB path: pages repartition by
    * source (all of a source's pages land in one task), each task
    * renders its sources' records and streams them to
    * `dir/<source>-p<partition>.warc` through the Hadoop FileSystem API
    * (local/HDFS/S3 alike) — page bytes never pass through the driver.
    * File contents are deterministic (pages sorted by page_id within a
    * source); file NAMES carry the partition id, and the reader's
    * per-file warcinfo contract makes multi-file sources compose. A real
    * deployment would additionally split giant sources into ~1 GB
    * rolling segments inside the loop — the seam is this per-source
    * iterator. */
  def writePagesDistributed(pages: DataFrame, dir: String,
      gzip: Boolean = false): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    import pages.sparkSession.implicits._
    pages.select("page_id", "url", "html", "source")
      .as[(Long, String, String, String)]
      .repartition(col("source"))
      .foreachPartition { (it: Iterator[(Long, String, String, String)]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        it.toSeq.groupBy(_._4).foreach { case (source, rows) =>
          val sorted = rows.sortBy(_._1).iterator.map(r => (r._1, r._2, r._3))
          val bytes = if (gzip) renderFileGz(source, sorted)
            else renderFile(source, sorted)
          val ext = if (gzip) "warc.gz" else "warc"
          val p = new org.apache.hadoop.fs.Path(dir, s"$source-p$pid.$ext")
          val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
          val out = fs.create(p, true)
          try out.write(bytes) finally out.close()
        }
      }
  }

  /** Serialize a (page_id, url, html, source) frame into one WARC file
    * per source under `dir` — the fixture writer for the q235 gate and
    * the round-trip specs ([[writePagesDistributed]] is the scale path;
    * one file per source keeps the fixture byte-deterministic). */
  def writePages(pages: DataFrame, dir: String, gzip: Boolean = false): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    import pages.sparkSession.implicits._
    pages.select("page_id", "url", "html", "source")
      .as[(Long, String, String, String)]
      .collect() // fixture-scale writer (the reader is the scale path)
      .groupBy(_._4)
      .foreach { case (source, rows) =>
        val sorted = rows.sortBy(_._1).iterator.map(r => (r._1, r._2, r._3))
        val bytes = if (gzip) renderFileGz(source, sorted)
          else renderFile(source, sorted)
        val ext = if (gzip) "warc.gz" else "warc"
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"$source.$ext"), bytes)
      }
  }
}
