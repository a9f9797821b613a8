package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata structs, plus decode / feature-extract /
  * resize / frame-sample operators.
  *
  * Codec status: WAV (RIFF/PCM), BMP, PNG (zlib DEFLATE + full filter
  * reconstruction), GIF (variable-width LZW), and baseline JPEG
  * (canonical Huffman + exact separable IDCT, cross-validated against
  * the JDK's independent ImageIO codec) decode are REAL — parsed by
  * [[MediaCodecs]] with no library beyond the JDK, gated end to end by
  * `mm_wav_decode`/`mm_bmp_decode`/`mm_png_decode`/`mm_gif_decode`/
  * `mm_jpeg_decode` — as are the header-only metadata sniff
  * ([[decodeMeta]]: all six containers including the ISO-BMFF/MP4 box
  * walk — mvhd duration, tkhd geometry, stsz frame count, stsd codec
  * fourcc — and the progressive-JPEG flag) and pixel-block feature
  * extraction ([[extractFeatures]]). MP4 PIXEL decode is permanently
  * out of scope (decided 2026-08-15, the same way JPEG was decided
  * the other way): the box LAYOUT is pure public byte structure and
  * is now parsed for real, while the codec payload inside mdat
  * (H.264/HEVC entropy decode + inter-frame prediction) is a video
  * decoder this environment does not ship and no formula oracle could
  * gate. [[frameSampleStub]] remains the clearly-marked stand-in for
  * that one step: frames are fixed-size byte slices — the Spark-side
  * contract (schema, binary handling, explode shape) is real and
  * tested; swap the slice for a codec call (e.g. ffmpeg bindings)
  * without touching any plan structure.
  *
  * Scale design: per-partition batched processing via `mapPartitions`
  * (the JVM analog of arrow-batched pandas UDFs): media bytes never pass
  * through a shuffle here — all operators are narrow maps; downstream
  * aggregations group on extracted (small) columns, never on the blobs.
  * Blobs larger than a few MB should be externalized to object storage
  * with a pointer column; `withPointerLayout` models that split.
  */
object MultimodalOps {

  /** Typed metadata for an opaque media blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),          // image | audio | video
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),  // audio only
    StructField("n_frames", IntegerType),     // GIF / MP4 only
    StructField("progressive", BooleanType),  // JPEG only
    StructField("duration_ms", IntegerType),  // MP4 only
    StructField("codec", StringType)))        // MP4 only (stsd fourcc)

  case class MediaMetaRow(docId: Long, kind: String,
                          width: Option[Int], height: Option[Int],
                          channels: Option[Int], sampleRate: Option[Int],
                          nFrames: Option[Int],
                          progressive: Option[Boolean],
                          durationMs: Option[Int], codec: Option[String])

  /** REAL metadata decode: [[MediaCodecs.sniffMeta]] dispatches on the
    * container magic and parses only the header structures — PNG IHDR
    * (CRC-verified), GIF logical screen descriptor + frame-count block
    * walk, BMP info header, WAV fmt chunk. Blobs whose header is
    * unrecognized or structurally invalid are DROPPED (the
    * filter-invalid contract of an ingest decode stage, same as
    * [[decodeWav]]). Narrow map, cost O(header) per blob — payload
    * bytes are never visited, so this is the catalog pass you can run
    * over 100 TB of media. */
  def decodeMeta(media: DataFrame, idCol: String,
                 bytesCol: String): Dataset[MediaMetaRow] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          MediaCodecs.sniffMeta(bytes).map(m =>
            MediaMetaRow(id, m.kind, m.width, m.height, m.channels,
              m.sampleRate, m.nFrames, m.progressive, m.durationMs,
              m.codec))
        }
      }
  }

  /** Shared per-blob flatMap scaffolding for the byte-walk ops below:
    * one copy of the select/cast/encoder plumbing, so each op owns
    * only its decode body (and a guard fixed once is fixed for all). */
  private def blobFlatMap[T: org.apache.spark.sql.Encoder](
      media: DataFrame, idCol: String, bytesCol: String)(
      f: (Long, Array[Byte]) => IterableOnce[T]): Dataset[T] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => f(id, bytes) })
  }

  /** The response-record walk shared by the WET and HTTP ops. */
  private def responseRecords(bytes: Array[Byte]) =
    graft.sources.WarcCodec.parseWarc(bytes).toSeq.flatMap {
      case (_, recs) => recs.filter(_.recType == "response")
    }

  case class Mp3MetaRow(docId: Long, version: String, layer: Int,
                        channels: Int, sampleRate: Int, nFrames: Long,
                        durationMs: Long, avgKbps: Long, vbr: Boolean,
                        hasId3: Boolean, hasXing: Boolean, nBytes: Long)

  /** MPEG-audio frame walk over blobs ([[Mp3Codec.parseMp3]]): ID3v2
    * skip, per-frame header validation, exact frame-length hops,
    * Xing/Info detection, stream-consistency checks. Structurally
    * invalid blobs are DROPPED (the ingest filter-invalid contract).
    * Narrow map; per blob the walk touches 4 header bytes per frame
    * plus the hop arithmetic — payload bytes are never read, so this
    * catalogs 100 TB of audio at I/O speed. */
  def mp3Meta(media: DataFrame, idCol: String,
              bytesCol: String): Dataset[Mp3MetaRow] = {
    import media.sparkSession.implicits._
    blobFlatMap(media, idCol, bytesCol) { (id, bytes) =>
      Mp3Codec.parseMp3(bytes).map(m =>
        Mp3MetaRow(id, m.version, m.layer, m.channels, m.sampleRate,
          m.nFrames, m.durationMs, m.avgKbps, m.vbr, m.hasId3,
          m.hasXing, m.nBytes))
    }
  }

  case class WarcRow(docId: Long, recIdx: Int, recType: String,
                     targetUri: String, contentLength: Long,
                     recOffset: Long, compressed: Boolean)

  /** WARC record walk over blobs ([[graft.sources.WarcCodec]]): plain
    * or gzip-member streams, one slim row per record, offsets in
    * decompressed space (identical across both layouts — the
    * invariant that lets one analytic oracle gate both). Structurally
    * invalid blobs drop (ingest contract). Narrow flatMap. */
  def warcRecords(media: DataFrame, idCol: String,
                  bytesCol: String): Dataset[WarcRow] = {
    import media.sparkSession.implicits._
    blobFlatMap(media, idCol, bytesCol) { (id, bytes) =>
      graft.sources.WarcCodec.parseWarc(bytes).toSeq.flatMap {
        case (gz, recs) => recs.map(r =>
          WarcRow(id, r.idx, r.recType, r.targetUri, r.contentLength,
            r.offset, gz))
      }
    }
  }

  case class DigestRow(docId: Long, recIdx: Int, recType: String,
                       contentLength: Long, digest: Long)

  /** Per-record payload digest — crawl-native EXACT dedup before any
    * byte ever decodes (the `WARC-Payload-Digest` pattern: Common
    * Crawl marks `revisit` records by payload digest so identical
    * captures are stored once and deduped downstream without reading
    * payloads twice). The digest here is a Horner fold
    * `acc = (acc * 31 + byte) mod 1e9+7` over the payload bytes —
    * chosen over SHA-1 for the same reason every gated hash in this
    * engine is integer-exact: a DuckDB oracle can recompute it in
    * closed form from the fixture's generation formula, so the gate
    * proves the WALK delivered exactly the right payload slices
    * (production swaps in SHA-1 without touching the plan). Narrow
    * flatMap, one pass over payload bytes, slim rows out; the dedup
    * consumer groups on (digest, length) — one shuffle of hashes,
    * never of payloads, the 100 TB shape. */
  def warcPayloadDigests(media: DataFrame, idCol: String,
                         bytesCol: String): Dataset[DigestRow] = {
    import media.sparkSession.implicits._
    blobFlatMap(media, idCol, bytesCol) { (id, bytes) =>
      graft.sources.WarcCodec.parseWarc(bytes).toSeq.flatMap {
        case (_, recs) => recs.map { r =>
          var acc = 0L
          var i = 0
          while (i < r.payload.length) {
            acc = (acc * 31 + (r.payload(i) & 0xff)) % 1000000007L
            i += 1
          }
          DigestRow(id, r.idx, r.recType, r.contentLength, acc)
        }
      }
    }
  }

  case class WetRow(docId: Long, recIdx: Int, targetUri: String,
                    text: String)

  /** WET derivation, step 1 of 2 (the Common-Crawl pattern: WARC in,
    * extracted text out): walk each blob, keep the `response` records,
    * surface their payloads as text rows for the HTML strip to
    * consume. US-ASCII decode — the gate's synthesis is ASCII by
    * construction; a production reader would charset-sniff here
    * (Content-Type header + BOM), which changes decoding, not the
    * walk or the strip this gates. Stateless narrow flatMap: the same
    * function body serves a readStream of WARC segments unchanged. */
  def warcHtmlText(media: DataFrame, idCol: String,
                   bytesCol: String): Dataset[WetRow] = {
    import media.sparkSession.implicits._
    blobFlatMap(media, idCol, bytesCol) { (id, bytes) =>
      responseRecords(bytes).map(r =>
        WetRow(id, r.idx, r.targetUri, new String(r.payload, "US-ASCII")))
    }
  }

  case class CharsetRow(docId: Long, charset: String, nBytes: Long,
                        nSeq: Long)

  /** Charset sniff — the decode decision the WET step defers to
    * ([[warcHtmlText]]'s documented gap): BOMs first (EF BB BF /
    * FF FE / FE FF), then pure-ASCII, then a REAL RFC 3629 UTF-8
    * validity scan — prefix-length dispatch with the exact
    * continuation ranges that reject overlong encodings (C0/C1, E0
    * 80–9F, F0 80–8F), surrogates (ED A0–BF), code points past
    * U+10FFFF (F4 90+, F5+), and truncated tails. Valid non-ASCII →
    * `utf8` with the multibyte-sequence count; anything else →
    * `unknown-8bit` (the latin-1-or-binary fallback a crawl pipeline
    * quarantines). One narrow pass per blob, O(bytes). */
  def charsetSniff(media: DataFrame, idCol: String,
                   bytesCol: String): Dataset[CharsetRow] = {
    import media.sparkSession.implicits._
    blobFlatMap(media, idCol, bytesCol) { (id, bytes) =>
      Some {
        val b = if (bytes == null) Array.emptyByteArray else bytes
        def at(i: Int): Int = b(i) & 0xff
        val cs =
          if (b.length >= 3 && at(0) == 0xEF && at(1) == 0xBB &&
              at(2) == 0xBF) "utf8-bom"
          else if (b.length >= 2 && at(0) == 0xFF && at(1) == 0xFE)
            "utf16le-bom"
          else if (b.length >= 2 && at(0) == 0xFE && at(1) == 0xFF)
            "utf16be-bom"
          else null
        var nSeq = 0L
        val charset =
          if (cs == "utf16le-bom" || cs == "utf16be-bom") cs
          else {
            val from = if (cs == "utf8-bom") 3 else 0
            var i = from
            var ascii = true
            var valid = true
            while (valid && i < b.length) {
              val c = at(i)
              if (c < 0x80) i += 1
              else {
                ascii = false
                val (need, lo, hi) =
                  if (c >= 0xC2 && c <= 0xDF) (1, 0x80, 0xBF)
                  else if (c == 0xE0) (2, 0xA0, 0xBF)
                  else if (c >= 0xE1 && c <= 0xEC) (2, 0x80, 0xBF)
                  else if (c == 0xED) (2, 0x80, 0x9F) // no surrogates
                  else if (c >= 0xEE && c <= 0xEF) (2, 0x80, 0xBF)
                  else if (c == 0xF0) (3, 0x90, 0xBF)
                  else if (c >= 0xF1 && c <= 0xF3) (3, 0x80, 0xBF)
                  else if (c == 0xF4) (3, 0x80, 0x8F) // <= U+10FFFF
                  else (-1, 0, 0) // 80-C1 (stray cont/overlong), F5-FF
                if (need < 0 || i + need >= b.length) valid = false
                else {
                  // first continuation carries the special range; the
                  // rest are plain 80-BF
                  var j = 1
                  var okSeq = at(i + 1) >= lo && at(i + 1) <= hi
                  j = 2
                  while (okSeq && j <= need) {
                    okSeq = at(i + j) >= 0x80 && at(i + j) <= 0xBF
                    j += 1
                  }
                  if (!okSeq) valid = false
                  else { nSeq += 1; i += need + 1 }
                }
              }
            }
            if (!valid) { nSeq = 0L; "unknown-8bit" }
            else if (cs == "utf8-bom") "utf8-bom"
            else if (ascii) "ascii"
            else "utf8"
          }
        CharsetRow(id, charset, b.length.toLong, nSeq)
      }
    }
  }

  case class HttpRow(docId: Long, recIdx: Int, targetUri: String,
                     status: Int, contentType: String, body: String,
                     chunked: Boolean, location: String, etag: String,
                     lastModified: String)

  /** HTTP envelope parse inside WARC response payloads — how crawl
    * WARCs actually store pages (`WARC-Type: response` wraps the full
    * HTTP message, status line + headers + body), so the real chain
    * is WARC walk → THIS → charset/strip. Strict per record: the
    * status line must read `HTTP/1.<x> <3-digit code> [reason]`, the
    * header block must terminate with the CRLF CRLF blank line;
    * Content-Type is surfaced (first occurrence, case-insensitive
    * name per RFC 9110, '' when absent); anything malformed drops
    * the RECORD (ingest contract — one bad capture never kills the
    * segment). `Transfer-Encoding: chunked` bodies (how crawl WARCs —
    * Common Crawl pre-2019 especially — store chunked responses: the
    * chunk-size framing is captured intact) are de-chunked per RFC
    * 9112 §7.1 here, so hex-length lines and trailing CRLFs never
    * leak into the WET text; a malformed chunk (bad hex, truncated
    * data, broken CRLF, garbage after the last chunk) or an
    * unsupported Transfer-Encoding value drops the record. US-ASCII
    * envelope decode per the RFC; body decode stays the
    * [[charsetSniff]] decision (the gate's synthesis is ASCII).
    * Stateless narrow flatMap. */
  private val StatusLineRe =
    java.util.regex.Pattern.compile("^HTTP/1\\.[01] ([0-9]{3})(?: .*)?$")

  /** RFC 9112 §7.1 chunked-body decode. Operates on the US-ASCII
    * decoded string, which is 1:1 byte-per-char (invalid bytes decode
    * to one U+FFFD each), so char offsets ARE byte offsets and the
    * hex chunk sizes count correctly. Grammar enforced exactly:
    * `chunk-size [;ext] CRLF data CRLF` repeated, the `0` last chunk,
    * optional trailer fields, the final CRLF, nothing after. Any
    * violation — non-hex size, empty size, truncated data, missing
    * CRLF, trailing garbage — returns None (drop the record). */
  private def dechunk(s: String): Option[String] = {
    val sb = new java.lang.StringBuilder
    var p = 0
    while (true) {
      val eol = s.indexOf("\r\n", p)
      if (eol < 0) return None
      val sizeLine = s.substring(p, eol)
      val semi = sizeLine.indexOf(';')
      val hex = if (semi >= 0) sizeLine.substring(0, semi) else sizeLine
      if (hex.isEmpty || hex.length > 15 ||
          !hex.forall(c => Character.digit(c, 16) >= 0)) return None
      val size = java.lang.Long.parseLong(hex, 16)
      p = eol + 2
      if (size == 0L) {
        // trailer section: zero or more non-empty field lines, then
        // the terminating blank line; anything after it is garbage
        while (!s.startsWith("\r\n", p)) {
          val te = s.indexOf("\r\n", p)
          if (te < 0) return None
          p = te + 2
        }
        return if (p + 2 == s.length) Some(sb.toString) else None
      }
      // LONG arithmetic for the truncation guard: a declared size near
      // Int.MaxValue must not wrap `p + n + 2` negative and sneak past
      // the bound into an uncaught IndexOutOfBounds (drop, never throw)
      if (p.toLong + size + 2 > s.length) return None // truncated chunk
      val n = size.toInt
      sb.append(s, p, p + n)
      if (s.charAt(p + n) != '\r' || s.charAt(p + n + 1) != '\n')
        return None // chunk data must end at its own CRLF exactly
      p += n + 2
    }
    None // unreachable
  }

  def warcHttpResponses(media: DataFrame, idCol: String,
                        bytesCol: String): Dataset[HttpRow] = {
    import media.sparkSession.implicits._
    blobFlatMap(media, idCol, bytesCol) { (id, bytes) =>
      responseRecords(bytes).flatMap { r =>
        val p = new String(r.payload, "US-ASCII")
        val hdrEnd = p.indexOf("\r\n\r\n")
        val eol = p.indexOf("\r\n")
        if (hdrEnd < 0 || eol < 0) None
        else {
          val m = StatusLineRe.matcher(p.substring(0, eol))
          if (!m.matches()) None
          else {
            // hdrEnd == eol is a LEGAL zero-header message (the status
            // line's own CRLF starts the blank-line terminator) —
            // substring(eol + 2, hdrEnd) would throw on it.
            val hdrBlock =
              if (hdrEnd <= eol) "" else p.substring(eol + 2, hdrEnd)
            val hdrs = hdrBlock.split("\r\n")
            def header(name: String): Option[String] = {
              val pfx = name + ":"
              hdrs.collectFirst {
                case h if h.length >= pfx.length &&
                    h.substring(0, pfx.length).equalsIgnoreCase(pfx) =>
                  h.substring(pfx.length).trim
              }
            }
            val ct = header("Content-Type").getOrElse("")
            val loc = header("Location").getOrElse("")
            // the two RFC 9110 revisit validators a recrawl scheduler
            // conditions on (If-None-Match / If-Modified-Since)
            val etag = header("ETag").getOrElse("")
            val lastMod = header("Last-Modified").getOrElse("")
            val raw = p.substring(hdrEnd + 4)
            val te = header("Transfer-Encoding")
              .map(_.toLowerCase(java.util.Locale.ROOT))
            te match {
              case None =>
                Some(HttpRow(id, r.idx, r.targetUri, m.group(1).toInt,
                  ct, raw, chunked = false, loc, etag, lastMod))
              case Some("chunked") =>
                dechunk(raw).map(body =>
                  HttpRow(id, r.idx, r.targetUri, m.group(1).toInt,
                    ct, body, chunked = true, location = loc,
                    etag = etag, lastModified = lastMod))
              case Some("identity") =>
                Some(HttpRow(id, r.idx, r.targetUri, m.group(1).toInt,
                  ct, raw, chunked = false, loc, etag, lastMod))
              case Some(_) => None // gzip/deflate/stacked: undecodable
            }
          }
        }
      }
    }
  }

  case class MediaFeature(mediaId: Long, nBytes: Int, feature: Array[Long])

  /** REAL feature extraction — partition-batched `mapPartitions` with an
    * explicit batch size (the shape that would hand each batch of blobs
    * to a codec/model library in one call, amortizing per-call
    * overhead). Features come from the ACTUAL decoded pixels: the
    * R-channel grid from [[MediaCodecs.bmpGrayR]] (bottom-up flip + row
    * padding applied) is split into `dim` contiguous equal blocks in
    * row-major order (block of pixel i = i·dim div n) and each feature
    * is that block's floor-divided integer mean — integer-exact, so an
    * analytic oracle over the pixel formula still gates it, and a
    * one-pixel change moves its block's feature. Rows that are not
    * valid 24-bit BMPs are dropped (filter-invalid contract). */
  def extractFeatures(media: DataFrame, idCol: String, bytesCol: String,
                      dim: Int = 8, batchSize: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (id, bytes) =>
            MediaCodecs.bmpGrayR(bytes).map { px =>
              val n = px.length
              val sums = new Array[Long](dim)
              val counts = new Array[Long](dim)
              var i = 0
              while (i < n) {
                val b = ((i.toLong * dim) / n).toInt
                sums(b) += px(i)
                counts(b) += 1
                i += 1
              }
              val feat = Array.tabulate(dim)(b =>
                if (counts(b) == 0) 0L else sums(b) / counts(b))
              MediaFeature(id, bytes.length, feat)
            }
          }
        }
      }
  }

  /** STUB frame sampling — video blob → every k-th "frame" (fixed-size
    * byte slices standing in for decoded frames), exploded to one row per
    * sampled frame with a frame index. The explode-with-index shape is the
    * real contract for downstream per-frame feature extraction. */
  def frameSampleStub(media: DataFrame, idCol: String, bytesCol: String,
                      frameBytes: Int = 256, everyK: Int = 10): DataFrame =
    media
      .withColumn("__n_frames",
        greatest(lit(1), (length(col(bytesCol)) / frameBytes).cast("int")))
      .select(col(idCol), col(bytesCol), col("__n_frames"),
        posexplode(expr(s"sequence(0, (__n_frames - 1) div $everyK)"))
          .as(Seq("sample_idx", "frame_idx_raw")))
      .withColumn("frame_idx", (col("frame_idx_raw") * everyK).cast("int"))
      .withColumn("frame_bytes", expr(
        s"substring($bytesCol, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col(idCol), col("sample_idx"), col("frame_idx"), col("frame_bytes"))

  case class WavRow(docId: Long, sampleRate: Int, channels: Int,
                    nSamples: Long, sumSquares: Long)
  case class BmpRow(docId: Long, width: Int, height: Int, bpp: Int,
                    sumR: Long, sumG: Long, sumB: Long)

  /** REAL audio decode (no stub): RIFF/WAVE PCM-16 parsed byte-for-byte
    * by [[MediaCodecs.parseWav]] in a partition-batched narrow map —
    * chunk walk, LE field extraction, exact integer sample fold. Rows
    * that are not valid PCM-16 WAV are dropped (the filter-invalid
    * contract of an ingest decode stage). Blobs never shuffle; only the
    * slim decoded columns flow on. */
  def decodeWav(media: DataFrame, idCol: String,
                bytesCol: String): Dataset[WavRow] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        MediaCodecs.parseWav(bytes).map(m =>
          WavRow(id, m.sampleRate, m.channels, m.nSamples, m.sumSquares))
      })
  }

  case class WavChRow(docId: Long, channel: Int, nSamples: Long,
                      sumSquares: Long, peak: Int, zeroCrossings: Long)

  /** Per-channel WAV features (round-11 stereo de-interleave): one row
    * per (doc, channel) via [[MediaCodecs.wavChannelFeatures]] —
    * crossings counted WITHIN each channel, never across the
    * interleaved stream. Narrow flatMap, blobs never shuffle. */
  def decodeWavChannels(media: DataFrame, idCol: String,
                        bytesCol: String): Dataset[WavChRow] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        MediaCodecs.wavChannelFeatures(bytes).toSeq.flatten.map {
          case (c, n, ss, pk, zc) => WavChRow(id, c, n, ss, pk, zc)
        }
      })
  }

  case class FlacChRow(docId: Long, sampleRate: Int, channels: Int,
                       channel: Int, nSamples: Long, sumSquares: Long,
                       peak: Int, zeroCrossings: Long)

  /** REAL compressed-audio decode (no stub): FLAC parsed bit-for-bit by
    * [[FlacCodec.decodeFlac]] — frame sync walk, Rice residuals, fixed/
    * LPC prediction, stereo decorrelation, CRC-8/CRC-16 verification —
    * then per-channel features over the reconstructed planes (the
    * [[decodeWavChannels]] row shape, so WAV and FLAC pipelines are
    * drop-in interchangeable downstream). Invalid/corrupt streams are
    * dropped (the filter-invalid ingest contract); narrow flatMap,
    * blobs never shuffle. */
  def decodeFlacChannels(media: DataFrame, idCol: String,
                         bytesCol: String): Dataset[FlacChRow] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        FlacCodec.decodeFlac(bytes).toSeq.flatMap { case (info, planes) =>
          planes.zipWithIndex.map { case (s, c) =>
            // same crossing rule as MediaCodecs.wavChannelFeatures:
            // sign memory persists across zero samples
            var ss = 0L; var pk = 0; var zc = 0L; var prev = 0
            var i = 0
            while (i < s.length) {
              ss += s(i).toLong * s(i)
              val a = math.abs(s(i))
              if (a > pk) pk = a
              val sign = Integer.signum(s(i))
              if (sign != 0) {
                if (prev != 0 && sign != prev) zc += 1
                prev = sign
              }
              i += 1
            }
            FlacChRow(id, info.sampleRate, info.channels, c, s.length.toLong,
              ss, pk, zc)
          }
        }
      })
  }

  /** REAL bytes→bytes transcode: FLAC decoded by [[FlacCodec]], the
    * reconstructed planes re-interleaved and re-encoded as PCM-16 WAV
    * by [[MediaCodecs.buildWav]], and the RESULT re-parsed — the
    * [[decodeWav]] row over the transcoded container, so the two audio
    * byte layouts meet end-to-end in one op (the decimateWav/trimWav
    * transform-family contract: the edit and its decoded outcome are
    * verified together). Invalid FLAC drops; narrow map; blobs never
    * shuffle. */
  def transcodeFlacToWav(media: DataFrame, idCol: String,
                         bytesCol: String): Dataset[WavRow] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        FlacCodec.decodeFlac(bytes).flatMap { case (info, planes) =>
          val n = planes(0).length
          val inter = new Array[Short](n * info.channels)
          var i = 0
          while (i < n) {
            var c = 0
            while (c < info.channels) {
              inter(i * info.channels + c) = planes(c)(i).toShort
              c += 1
            }
            i += 1
          }
          val wav = MediaCodecs.buildWav(info.sampleRate, info.channels,
            inter)
          MediaCodecs.parseWav(wav).map(m =>
            WavRow(id, m.sampleRate, m.channels, m.nSamples, m.sumSquares))
        }
      })
  }

  /** REAL image decode (no stub): 24-bit uncompressed BMP parsed by
    * [[MediaCodecs.parseBmp]] — header navigation via the pixel-array
    * offset, per-row padding arithmetic, exact per-channel sums. Same
    * narrow-map / drop-invalid shape as [[decodeWav]]. */
  def decodeBmp(media: DataFrame, idCol: String,
                bytesCol: String): Dataset[BmpRow] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        MediaCodecs.parseBmp(bytes).map(m =>
          BmpRow(id, m.width, m.height, m.bitsPerPixel, m.sumR, m.sumG, m.sumB))
      })
  }

  case class TrimRow(docId: Long, nBefore: Long, leadTrimmed: Int,
                     tailTrimmed: Int, nAfter: Long, sumSquaresAfter: Long)

  /** REAL silence trim (no stub): [[MediaCodecs.trimWavSilence]] then a
    * re-parse of the trimmed container in the same narrow map — the
    * bytes→bytes edit and its decoded outcome verified together. Same
    * drop-invalid contract as [[decodeWav]]. */
  def trimWav(media: DataFrame, idCol: String, bytesCol: String,
              threshold: Int): Dataset[TrimRow] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        for {
          before <- MediaCodecs.parseWav(bytes)
          (out, lead, tail) <- MediaCodecs.trimWavSilence(bytes, threshold)
          after <- MediaCodecs.parseWav(out)
        } yield TrimRow(id, before.nSamples, lead, tail,
          after.nSamples, after.sumSquares)
      })
  }

  case class PngRow(docId: Long, width: Int, height: Int, bitDepth: Int,
                    colorType: Int, sumR: Long, sumG: Long, sumB: Long)

  /** REAL compressed-image decode (no stub): 8-bit truecolor PNG via
    * [[MediaCodecs.parsePng]] — CRC-verified chunk walk, zlib INFLATE,
    * full five-filter scanline reconstruction, exact channel sums. Same
    * narrow-map / drop-invalid shape as [[decodeBmp]]. */
  def decodePng(media: DataFrame, idCol: String,
                bytesCol: String): Dataset[PngRow] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        MediaCodecs.parsePng(bytes).map(m =>
          PngRow(id, m.width, m.height, m.bitDepth, m.colorType,
            m.sumR, m.sumG, m.sumB))
      })
  }

  case class HaarRow(docId: Long, level: Int, energy: Long)

  /** REAL multi-resolution audio analysis over REAL decoded samples:
    * parse the PCM-16 WAV, run the integer-exact Haar transform
    * ([[MediaCodecs.haarBandEnergies]]), emit one row per detail band
    * (level 1..maxLevels) plus the residual approximation energy as
    * level 0. Narrow map, rows-per-blob bounded by maxLevels+1. */
  def wavHaarBands(media: DataFrame, idCol: String, bytesCol: String,
                   maxLevels: Int): Dataset[HaarRow] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        MediaCodecs.wavSamples(bytes).toSeq.flatMap { samples =>
          val (bands, res) =
            MediaCodecs.haarBandEnergies(samples, maxLevels)
          HaarRow(id, 0, res) +:
            bands.zipWithIndex.map { case (e, i) => HaarRow(id, i + 1, e) }
              .toSeq
        }
      })
  }

  case class GifRow(docId: Long, width: Int, height: Int, paletteSize: Int,
                    nPixels: Long, sumIdx: Long, sumR: Long, sumG: Long,
                    sumB: Long)

  /** REAL LZW-compressed-image decode (no stub): GIF87a/89a via
    * [[MediaCodecs.parseGif]] — variable 9→12-bit LZW with CLEAR
    * resets and the KwKwK case, palette lookup, exact index/channel
    * sums. Same narrow-map / drop-invalid shape as [[decodePng]]. */
  def decodeGif(media: DataFrame, idCol: String,
                bytesCol: String): Dataset[GifRow] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        MediaCodecs.parseGif(bytes).map(m =>
          GifRow(id, m.width, m.height, m.paletteSize, m.nPixels,
            m.sumIdx, m.sumR, m.sumG, m.sumB))
      })
  }

  case class GifFrameRow(docId: Long, sampleIdx: Int, frameIdx: Int,
                         width: Int, height: Int, nPixels: Long,
                         sumIdx: Long)

  /** REAL frame sampling over a REAL multi-frame container (no stub):
    * every k-th frame of an animated GIF, each frame actually
    * LZW-decoded via [[MediaCodecs.gifFrameSums]] with exact per-frame
    * index sums — the video-pipeline "decode container → sample frames
    * → per-frame features" stage, real end to end (MP4 remains the one
    * declared stub; the GIF container exercises the identical Spark
    * shape: narrow flatMap, one row per sampled frame, blobs never
    * shuffled). */
  def gifFrameSample(media: DataFrame, idCol: String, bytesCol: String,
                     everyK: Int): Dataset[GifFrameRow] = {
    require(everyK >= 1, s"gifFrameSample needs everyK >= 1 (got $everyK)")
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        MediaCodecs.gifFrameSums(bytes).toSeq.flatMap { frames =>
          frames.zipWithIndex
            .filter { case (_, fi) => fi % everyK == 0 }
            .zipWithIndex
            .map { case ((f, fi), si) =>
              GifFrameRow(id, si, fi, f.width, f.height, f.nPixels,
                f.sumIdx)
            }
        }
      })
  }

  case class BmpPatchRow(docId: Long, px: Int, py: Int, pw: Int, ph: Int,
                         sumR: Long)

  /** REAL patch extraction (no stub): the p×p ViT patch lattice over the
    * actual BMP bytes via [[MediaCodecs.bmpPatchSums]] — edge patches
    * carry their true (pw, ph), sums read through the bottom-up flip and
    * row padding. Narrow flatMap (one row per patch); invalid blobs
    * drop. */
  def bmpPatches(media: DataFrame, idCol: String, bytesCol: String,
                 p: Int): Dataset[BmpPatchRow] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        MediaCodecs.bmpPatchSums(bytes, p).toSeq.flatten.map {
          case (px, py, pw, ph, s) => BmpPatchRow(id, px, py, pw, ph, s)
        }
      })
  }

  /** REAL image resize (no stub): bytes → bytes nearest-neighbor
    * resample via [[MediaCodecs.resizeBmpNearest]] — source parse,
    * coordinate mapping with the bottom-up row flip, padded re-encode.
    * Narrow map; invalid blobs drop. */
  def resizeBmp(media: DataFrame, idCol: String, bytesCol: String,
                newWidth: Int, newHeight: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        MediaCodecs.resizeBmpNearest(bytes, newWidth, newHeight)
          .map(out => (id, out))
      })
      .toDF(idCol, bytesCol)
  }

  /** REAL anti-aliased resize (no stub): bytes → bytes area-average
    * downsample via [[MediaCodecs.resizeBmpBox]] — every source pixel
    * folds into its block's exact integer mean. Narrow map; invalid or
    * non-divisible geometry drops. */
  def resizeBmpBoxOp(media: DataFrame, idCol: String, bytesCol: String,
                     factor: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        MediaCodecs.resizeBmpBox(bytes, factor).map(out => (id, out))
      })
      .toDF(idCol, bytesCol)
  }

  /** Pointer layout for blobs too large to keep inline: the table keeps
    * (uri, offset, length) and metadata; bytes live in object storage. */
  def withPointerLayout(media: DataFrame, idCol: String, bytesCol: String,
                        bucketUri: String): DataFrame =
    media.select(
      col(idCol),
      concat(lit(bucketUri + "/"), col(idCol)).as("blob_uri"),
      lit(0L).as("blob_offset"),
      length(col(bytesCol)).cast("long").as("blob_length"))
}
