package graft.sources

/** WARC (ISO 28500, WARC/1.0 and WARC/1.1) record walk — the crawl
  * corpus' NATIVE container: every large-scale text pipeline's first
  * mile reads WARC segments before any HTML strip runs. Same
  * byte-exact scope discipline as the media codecs: the gateable
  * surface is the record STRUCTURE — version line, named headers,
  * Content-Length payload hop, CRLF framing — which this parses for
  * real, strictly:
  *
  *  - plain streams: `WARC/1.0\r\n` or `WARC/1.1\r\n` (the two IIPC
  *    spec revisions — 1.1 only tightens WARC-Date precision, which
  *    this walk does not interpret, so records of both revisions may
  *    interleave in one segment), header lines `Name: value\r\n`
  *    until the empty line, exactly Content-Length payload bytes, then
  *    the mandatory `\r\n\r\n` record trailer; records walk back to
  *    back to EOF. Missing version line / Content-Length, a malformed
  *    header, a truncated payload, or a broken trailer rejects (None)
  *    — never a resynchronized guess.
  *  - gzip streams (how WARCs ship: one gzip MEMBER per record,
  *    members concatenated): detected by the 1F 8B magic and inflated
  *    by a strict hand-walked RFC 1952 member reader (CRC32 + ISIZE
  *    verified per member; truncation, mid-stream corruption, and
  *    trailing garbage ALL reject — the JDK reader would silently
  *    truncate those), then the SAME
  *    walk runs over the decompressed stream — so record offsets are
  *    reported in decompressed space, identical to the plain layout,
  *    and an analytic oracle covers BOTH variants with one closed
  *    form (compression never changes the gated fields, exactly the
  *    invariant a first-mile reader relies on).
  *
  * Untrusted-bytes contract: the inflate loop enforces
  * [[WarcCodec.MaxInflatedBytes]] (overridable per call) on the TOTAL
  * decompressed size, so a crafted high-ratio member (a gzip bomb —
  * RFC 1952 deflate reaches ~1032:1) rejects the BLOB with None like
  * every other structural violation instead of raising
  * OutOfMemoryError through the NonFatal catch and killing the
  * executor — drop the blob, never the job.
  *
  * At 100 TB this is a narrow per-blob map: headers are a few hundred
  * bytes, payload bytes are hopped over (plain) or streamed once
  * (gzip inflate); nothing is retained but the slim record rows.
  */
object WarcCodec {

  /** Default cap on a blob's total decompressed bytes (all members).
    * 256 MiB: an order of magnitude above Common Crawl's ~1 GiB
    * COMPRESSED segment grain divided across its per-record members
    * (individual records decompress to a few MB at most), and far
    * below executor-heap scale — a member that inflates past this is
    * a bomb, not a capture. */
  val MaxInflatedBytes: Long = 256L << 20

  final case class WarcRec(idx: Int, recType: String, targetUri: String,
                           contentLength: Long, offset: Long,
                           payload: Array[Byte])

  private val Crlf = "\r\n"

  /** Synthesize a WARC stream; `records` = (type, targetUri, payload).
    * An empty targetUri omits the WARC-Target-URI header (warcinfo
    * records have none). `gzipPerRecord` wraps each record in its own
    * gzip member, the shipping layout. `version(i)` picks the record's
    * spec revision ("WARC/1.0" or "WARC/1.1" — both 8 octets, so
    * mixing revisions never moves offsets). */
  def buildWarc(records: Seq[(String, String, Array[Byte])],
                gzipPerRecord: Boolean = false,
                version: Int => String = _ => "WARC/1.0"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.zipWithIndex.foreach { case ((tpe, uri, payload), ri) =>
      val h = new StringBuilder()
      h.append(version(ri)).append(Crlf)
      h.append("WARC-Type: ").append(tpe).append(Crlf)
      if (uri.nonEmpty)
        h.append("WARC-Target-URI: ").append(uri).append(Crlf)
      h.append("WARC-Date: 2026-01-01T00:00:00Z").append(Crlf)
      h.append("Content-Length: ").append(payload.length).append(Crlf)
      h.append(Crlf)
      val head = h.toString.getBytes("US-ASCII")
      val rec = new Array[Byte](head.length + payload.length + 4)
      System.arraycopy(head, 0, rec, 0, head.length)
      System.arraycopy(payload, 0, rec, head.length, payload.length)
      rec(rec.length - 4) = '\r'; rec(rec.length - 3) = '\n'
      rec(rec.length - 2) = '\r'; rec(rec.length - 1) = '\n'
      if (!gzipPerRecord) out.write(rec)
      else {
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(rec)
        // close(), not finish(): close ends the native Deflater too
        // (finish alone leaks zlib memory until GC on a per-record hot
        // path); BAOS.close() is a documented no-op, so the shared
        // sink survives.
        gz.close()
      }
    }
    out.toByteArray
  }

  /** Strict record walk; None on any structural violation (including
    * a decompressed size past `maxInflated` — the gzip-bomb guard).
    * Offsets are in the (decompressed, for gzip inputs) record
    * stream. */
  def parseWarc(bytes: Array[Byte],
                maxInflated: Long = MaxInflatedBytes)
      : Option[(Boolean, Seq[WarcRec])] =
    try {
      val gz = bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
        (bytes(1) & 0xff) == 0x8b
      val plain = if (!gz) Some(bytes) else gunzipMembers(bytes, maxInflated)
      plain.flatMap(walk).map(rs => (gz, rs))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Strict multi-member gunzip. NOT the JDK GZIPInputStream: that
    * reader treats a malformed later member header as plain EOF
    * (readTrailer swallows the exception), which would silently
    * TRUNCATE a corrupted segment to its earlier records — a
    * resynchronized guess the plain layout rejects. This walks the
    * RFC 1952 members by hand — header (magic, CM=8, FEXTRA/FNAME/
    * FCOMMENT/FHCRC fields by FLG), raw-deflate body via Inflater
    * (ended in finally: per-blob native zlib memory must not wait for
    * GC), then the CRC32 + ISIZE trailer both VERIFIED — and rejects
    * trailing garbage, truncation, or any mid-stream corruption, so
    * gzip and plain layouts fail identically. The running TOTAL of
    * inflated bytes is capped at `maxInflated` INSIDE the loop —
    * checked before the next buffer is retained, so a gzip bomb never
    * allocates past the cap before rejecting (the untrusted-bytes
    * drop-the-blob contract). */
  private def gunzipMembers(b: Array[Byte],
                            maxInflated: Long): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var p = 0
    def le32(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    while (p < b.length) {
      if (p + 10 > b.length) return None
      if ((b(p) & 0xff) != 0x1f || (b(p + 1) & 0xff) != 0x8b ||
          b(p + 2) != 8) return None
      val flg = b(p + 3) & 0xff
      var q = p + 10
      if ((flg & 4) != 0) { // FEXTRA
        if (q + 2 > b.length) return None
        q += 2 + ((b(q) & 0xff) | ((b(q + 1) & 0xff) << 8))
      }
      if ((flg & 8) != 0) { // FNAME, NUL-terminated
        while (q < b.length && b(q) != 0) q += 1
        q += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        while (q < b.length && b(q) != 0) q += 1
        q += 1
      }
      if ((flg & 2) != 0) q += 2 // FHCRC (not verified; body CRC is)
      if (q >= b.length) return None
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(b, q, b.length - q)
        val buf = new Array[Byte](8192)
        val crc = new java.util.zip.CRC32()
        var msize = 0L
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
            return None // truncated / underspecified member
          if (out.size().toLong + n > maxInflated)
            return None // gzip bomb: cap TOTAL inflated bytes
          crc.update(buf, 0, n)
          out.write(buf, 0, n)
          msize += n
        }
        val t = q + (b.length - q - inf.getRemaining)
        if (t + 8 > b.length) return None
        if (le32(t) != crc.getValue) return None
        if (le32(t + 4) != (msize & 0xffffffffL)) return None
        p = t + 8
      } catch {
        case _: java.util.zip.DataFormatException => return None
      } finally inf.end()
    }
    Some(out.toByteArray)
  }

  private def walk(b: Array[Byte]): Option[Seq[WarcRec]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRec]
    var p = 0
    var idx = 0
    def line(from: Int): Option[(String, Int)] = {
      var i = from
      while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
      if (i + 1 >= b.length) None
      else Some((new String(b, from, i - from, "US-ASCII"), i + 2))
    }
    while (p < b.length) {
      val off = p.toLong
      val v = line(p) match {
        case Some(("WARC/1.0" | "WARC/1.1", next)) => next
        case _ => return None
      }
      var q = v
      var tpe = ""; var uri = ""; var clen = -1L
      var done = false
      while (!done) {
        line(q) match {
          case None => return None
          case Some(("", next)) => q = next; done = true
          case Some((l, next)) =>
            val c = l.indexOf(": ")
            if (c <= 0) return None
            val (name, value) = (l.substring(0, c), l.substring(c + 2))
            name match {
              case "WARC-Type" => tpe = value
              case "WARC-Target-URI" => uri = value
              case "Content-Length" =>
                clen = try value.toLong catch {
                  case _: NumberFormatException => return None
                }
              case _ => () // unknown headers are legal and skipped
            }
            q = next
        }
      }
      if (tpe.isEmpty || clen < 0) return None
      val endPay = q + clen
      if (endPay + 4 > b.length) return None // truncated payload/trailer
      if (!(b(endPay.toInt) == '\r' && b(endPay.toInt + 1) == '\n' &&
          b(endPay.toInt + 2) == '\r' && b(endPay.toInt + 3) == '\n'))
        return None
      out += WarcRec(idx, tpe, uri, clen, off,
        java.util.Arrays.copyOfRange(b, q, endPay.toInt))
      idx += 1
      p = endPay.toInt + 4
    }
    if (out.isEmpty) None else Some(out.toSeq)
  }
}
