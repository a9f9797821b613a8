package graft.multimodal

/** REAL FLAC (Free Lossless Audio Codec, RFC 9639) encoder + decoder —
  * the compressed-audio member of the codec family (round-11 verdict
  * gap: a real media crawl is overwhelmingly COMPRESSED audio, and
  * until now only RIFF/PCM WAV decoded, with the gap undocumented).
  * Pure JVM, no native library:
  *
  *  - '''decoder''': "fLaC" magic + metadata-block walk (STREAMINFO
  *    parsed, others skipped via the is-last flag), frame sync
  *    (0x3FFE) + header with every block-size code (192, 576·2ⁿ,
  *    8/16-bit-follows, 256·2ⁿ), sample-rate codes (STREAMINFO-
  *    deferred, the fixed table, 8/16-bit-follows), UTF-8-coded frame
  *    numbers, CRC-8 (poly 0x07) over the header; subframes CONSTANT /
  *    VERBATIM / FIXED(0–4) / LPC(1–32) with wasted-bits unary,
  *    Rice-coded residuals (both the 4-bit and 5-bit parameter
  *    widths, any partition order, the raw-bits escape), all four
  *    stereo decorrelations — independent, left/side, right/side,
  *    mid/side — including the side channel's +1 bit depth; CRC-16
  *    (poly 0x8005) over the whole frame. Any CRC or structure
  *    violation rejects (None) — never a silent wrong decode.
  *    totalSamples = 0 (unknown length per RFC 9639) decodes frames to
  *    EOF and reports the actual count. Effective bit depths past 31
  *    (32-bit streams / their 33-bit side channels) reject rather than
  *    wrap the Int sample planes — all 8/16/24-bit material decodes.
  *
  *  - '''encoder''' (for the synthesis-then-decode gates, the
  *    PNG/JPEG closure pattern): fixed-blocksize streams, short last
  *    frame, per-stream channel assignment, CONSTANT detection,
  *    FIXED 0–2 with a deterministic Rice-parameter search, optional
  *    VERBATIM / LPC subframes and wasted-bits extraction for the
  *    spec drives.
  *
  * No JDK FLAC decoder exists for independent cross-validation
  * (PNG/JPEG had ImageIO): the honest evidence is exhaustive spec
  * round-trips (every subframe type, every stereo mode, Rice escape,
  * wasted bits, multi-frame, hand-built malformed rejects) plus the
  * analytic gate oracles — a parser bug cannot reproduce the
  * synthesis formula. Documented in COVERAGE.md beside the MP4 note.
  */
object FlacCodec {

  // ---- MSB-first bit IO --------------------------------------------------

  private final class BitW {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nb = 0
    def put(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nb += 1
        if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
        i -= 1
      }
    }
    /** FLAC unary: q zero bits then a one. */
    def putUnary(q: Int): Unit = { var i = 0; while (i < q) { put(0, 1); i += 1 }; put(1, 1) }
    def align(): Unit = while (nb != 0) put(0, 1)
    def size: Int = buf.size
    def bytes: Array[Byte] = buf.toArray
  }

  // private[graft] so the spec can drive decodeSubframe's bit-depth
  // guard directly (a full 32-bit stream can't be synthesized: our
  // encoder and the Int planes both top out below it by design).
  private[graft] final class BitR(data: Array[Byte], startByte: Int) {
    var pos: Long = startByte.toLong * 8
    def ok(n: Int): Boolean = pos + n <= data.length.toLong * 8
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        val b = (data((pos >> 3).toInt) >> (7 - (pos & 7)).toInt) & 1
        v = (v << 1) | b
        pos += 1
        i += 1
      }
      v
    }
    def sbits(n: Int): Long = {
      val v = bits(n)
      if (n == 0) 0L else (v << (64 - n)) >> (64 - n) // sign extend
    }
    /** Unary: count zeros up to the terminating one; −1 on overrun. */
    def unary(maxBits: Int = 1 << 20): Int = {
      var q = 0
      while (q < maxBits) {
        if (!ok(1)) return -1
        if (bits(1) == 1L) return q
        q += 1
      }
      -1
    }
    def alignByte(): Unit = pos = (pos + 7) & ~7L
    def bytePos: Int = (pos >> 3).toInt
  }

  // ---- CRCs (FLAC polynomials) ------------------------------------------

  private[multimodal] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var j = 0
      while (j < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        j += 1
      }
      i += 1
    }
    crc
  }

  private[multimodal] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var j = 0
      while (j < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        j += 1
      }
      i += 1
    }
    crc
  }

  // ---- UTF-8-style coded number (frame index) ---------------------------

  private def putUtf8Num(w: BitW, n: Long): Unit = {
    if (n < 0x80) w.put(n, 8)
    else if (n < 0x800) { w.put(0xC0 | (n >> 6), 8); w.put(0x80 | (n & 0x3f), 8) }
    else if (n < 0x10000) {
      w.put(0xE0 | (n >> 12), 8); w.put(0x80 | ((n >> 6) & 0x3f), 8)
      w.put(0x80 | (n & 0x3f), 8)
    } else {
      w.put(0xF0 | (n >> 18), 8); w.put(0x80 | ((n >> 12) & 0x3f), 8)
      w.put(0x80 | ((n >> 6) & 0x3f), 8); w.put(0x80 | (n & 0x3f), 8)
    }
  }

  private def readUtf8Num(r: BitR): Long = {
    if (!r.ok(8)) return -1L
    val b0 = r.bits(8).toInt
    val extra =
      if ((b0 & 0x80) == 0) return b0.toLong
      else if ((b0 & 0xE0) == 0xC0) 1
      else if ((b0 & 0xF0) == 0xE0) 2
      else if ((b0 & 0xF8) == 0xF0) 3
      else if ((b0 & 0xFC) == 0xF8) 4
      else if ((b0 & 0xFE) == 0xFC) 5
      else if (b0 == 0xFE) 6
      else return -1L
    var v: Long = b0 & (0x7f >> extra)
    var i = 0
    while (i < extra) {
      if (!r.ok(8)) return -1L
      val c = r.bits(8).toInt
      if ((c & 0xC0) != 0x80) return -1L
      v = (v << 6) | (c & 0x3f)
      i += 1
    }
    v
  }

  // ---- model -------------------------------------------------------------

  final case class FlacStreamInfo(minBlock: Int, maxBlock: Int,
                                  sampleRate: Int, channels: Int,
                                  bps: Int, totalSamples: Long)

  /** Channel-assignment constants (frame-header codes). */
  val ChIndep = 0 // +channels-1
  val ChLeftSide = 8
  val ChRightSide = 9
  val ChMidSide = 10

  // ---- encoder -----------------------------------------------------------

  private val FixedCoefs: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  private def fixedResidual(s: Array[Int], order: Int): Array[Int] = {
    val out = new Array[Int](s.length - order)
    var i = order
    while (i < s.length) {
      var pred = 0L
      var j = 0
      while (j < order) { pred += FixedCoefs(order)(j).toLong * s(i - 1 - j); j += 1 }
      out(i - order) = (s(i) - pred).toInt
      i += 1
    }
    out
  }

  private def riceCost(res: Array[Int], k: Int): Long = {
    var c = 0L
    var i = 0
    while (i < res.length) {
      val u = zigzag(res(i))
      c += (u >>> k) + 1 + k
      i += 1
    }
    c
  }

  private def zigzag(r: Int): Long = {
    val l = r.toLong
    if (l >= 0) l << 1 else ((-l) << 1) - 1
  }

  private def bestRiceK(res: Array[Int]): Int =
    (0 to 14).minBy(k => riceCost(res, k))

  private def writeRice(w: BitW, res: Array[Int], k: Int): Unit = {
    var i = 0
    while (i < res.length) {
      val u = zigzag(res(i))
      w.putUnary((u >>> k).toInt)
      if (k > 0) w.put(u & ((1L << k) - 1), k)
      i += 1
    }
  }

  /** One subframe. `mode`: "auto" (constant detection + best fixed
    * order 0–2), "verbatim", "lpc" (order-2 coefficients [2,−1],
    * shift 0 — residuals identical to fixed-2 but through the LPC
    * header/coefficient path), "fixedN" (forced order). `wasted`:
    * every sample must be divisible by 2^wasted; the subframe stores
    * samples >> wasted with the unary wasted-bits flag. `po`: Rice
    * partition order (block size must divide by 2^po with the first
    * partition keeping ≥ 0 residuals). `riceMethod`: 0 = 4-bit
    * parameters, 1 = the 5-bit RICE2 width. `escapeBits`: ≥ 0 forces
    * every partition onto the raw-bits ESCAPE path with that width
    * (the caller guarantees all residuals fit) — these knobs exist so
    * the spec can drive every decoder branch with real streams. */
  private def writeSubframe(w: BitW, samples0: Array[Int], bps: Int,
                            mode: String, wasted: Int,
                            po: Int = 0, riceMethod: Int = 0,
                            escapeBits: Int = -1): Unit = {
    require(wasted == 0 || samples0.forall(s => (s & ((1 << wasted) - 1)) == 0),
      "wasted bits not actually zero")
    val samples = if (wasted == 0) samples0 else samples0.map(_ >> wasted)
    val ebps = bps - wasted
    w.put(0, 1) // reserved
    def wastedFlag(): Unit =
      if (wasted == 0) w.put(0, 1)
      else { w.put(1, 1); w.putUnary(wasted - 1) }
    val allEqual = samples.forall(_ == samples(0))
    if (mode == "auto" && allEqual) {
      w.put(0, 6); wastedFlag()
      w.put(samples(0).toLong & ((1L << ebps) - 1), ebps)
    } else if (mode == "verbatim") {
      w.put(1, 6); wastedFlag()
      samples.foreach(s => w.put(s.toLong & ((1L << ebps) - 1), ebps))
    } else if (mode == "lpc") {
      val order = 2
      require(samples.length > order, "lpc needs > order samples")
      w.put(0x20 | (order - 1), 6); wastedFlag()
      samples.take(order).foreach(s =>
        w.put(s.toLong & ((1L << ebps) - 1), ebps))
      val precision = 5 // coeff bits; [2, -1] fits 5-bit signed
      w.put(precision - 1, 4)
      w.put(0, 5) // shift 0
      Seq(2, -1).foreach(c =>
        w.put(c.toLong & ((1L << precision) - 1), precision))
      writeResidual(w, fixedResidual(samples, order), samples.length,
        order, po, riceMethod, escapeBits)
    } else {
      val order =
        if (mode.startsWith("fixed")) mode.stripPrefix("fixed").toInt
        else (0 to math.min(2, samples.length - 1)).minBy { o =>
          fixedResidual(samples, o).map(r => math.abs(r.toLong)).sum
        }
      w.put(8 + order, 6); wastedFlag()
      samples.take(order).foreach(s =>
        w.put(s.toLong & ((1L << ebps) - 1), ebps))
      writeResidual(w, fixedResidual(samples, order), samples.length,
        order, po, riceMethod, escapeBits)
    }
  }

  /** Partitioned residual block: 2^po partitions, the first short by
    * `order`; per partition either a searched Rice parameter (4- or
    * 5-bit width by `method`) or, when `escapeBits` >= 0, the raw-bits
    * ESCAPE (parameter all-ones, 5-bit width, unencoded signed
    * residuals — the caller guarantees they fit). */
  private def writeResidual(w: BitW, res: Array[Int], n: Int, order: Int,
                            po: Int, method: Int, escapeBits: Int): Unit = {
    require(method == 0 || method == 1, "bad rice method")
    val nPart = 1 << po
    require(n % nPart == 0 && (n >> po) >= order,
      s"bad partition order $po for n=$n order=$order")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    w.put(method, 2)
    w.put(po, 4)
    var idx = 0
    var part = 0
    while (part < nPart) {
      val cnt = (n >> po) - (if (part == 0) order else 0)
      val slice = res.slice(idx, idx + cnt)
      if (escapeBits >= 0) {
        w.put(escape, pBits)
        w.put(escapeBits, 5)
        slice.foreach(r =>
          if (escapeBits > 0)
            w.put(r.toLong & ((1L << escapeBits) - 1), escapeBits))
      } else {
        val k = math.min(bestRiceK(slice), escape - 1)
        w.put(k, pBits)
        writeRice(w, slice, k)
      }
      idx += cnt
      part += 1
    }
  }

  /** Encode 16-bit PCM to a FLAC stream. `samples` is interleaved when
    * channels == 2. `assignment`: ChIndep / ChLeftSide / ChRightSide /
    * ChMidSide (stereo only). */
  def buildFlac(sampleRate: Int, channels: Int, samples: Array[Short],
                blockSize: Int = 256, assignment: Int = ChIndep,
                mode: String = "auto", wasted: Int = 0,
                po: Int = 0, riceMethod: Int = 0,
                escapeBits: Int = -1): Array[Byte] = {
    require(channels == 1 || channels == 2, "1 or 2 channels")
    require(samples.length % channels == 0, "ragged interleave")
    require(samples.nonEmpty, "empty stream")
    require(assignment == ChIndep || channels == 2, "stereo modes need 2ch")
    val bps = 16
    val n = samples.length / channels
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO, is-last
    val si = new BitW
    si.put(1, 1); si.put(0, 7) // last block, type 0
    si.put(34, 24)
    si.put(blockSize, 16); si.put(blockSize, 16)
    si.put(0, 24); si.put(0, 24) // min/max frame size unknown
    si.put(sampleRate, 20)
    si.put(channels - 1, 3)
    si.put(bps - 1, 5)
    si.put(n, 36)
    (0 until 16).foreach(_ => si.put(0, 8)) // md5 unknown (all zero)
    out.write(si.bytes)
    var frameIdx = 0L
    var off = 0
    while (off < n) {
      val bs = math.min(blockSize, n - off)
      val w = new BitW
      w.put(0x3FFE, 14)
      w.put(0, 1) // reserved
      w.put(0, 1) // fixed blocksize strategy
      w.put(7, 4) // block size: 16-bit value follows
      w.put(0, 4) // sample rate: from STREAMINFO
      val chCode = if (assignment == ChIndep) channels - 1 else assignment
      w.put(chCode, 4)
      w.put(4, 3) // 16-bit samples (code 100)
      w.put(0, 1) // reserved
      putUtf8Num(w, frameIdx)
      w.put(bs - 1, 16)
      val headerBytes = w.bytes
      w.put(crc8(headerBytes, 0, headerBytes.length), 8)
      // channel planes
      val planes: Array[(Array[Int], Int)] =
        if (channels == 1)
          Array((Array.tabulate(bs)(i => samples(off + i).toInt), bps))
        else {
          val l = Array.tabulate(bs)(i => samples(2 * (off + i)).toInt)
          val r = Array.tabulate(bs)(i => samples(2 * (off + i) + 1).toInt)
          assignment match {
            case ChIndep => Array((l, bps), (r, bps))
            case ChLeftSide =>
              Array((l, bps), (Array.tabulate(bs)(i => l(i) - r(i)), bps + 1))
            case ChRightSide =>
              Array((Array.tabulate(bs)(i => l(i) - r(i)), bps + 1), (r, bps))
            case ChMidSide =>
              Array((Array.tabulate(bs)(i => (l(i) + r(i)) >> 1), bps),
                (Array.tabulate(bs)(i => l(i) - r(i)), bps + 1))
          }
        }
      planes.foreach { case (plane, pbps) =>
        writeSubframe(w, plane, pbps, mode, wasted, po, riceMethod,
          escapeBits)
      }
      w.align()
      val frameNoCrc = w.bytes
      w.put(crc16(frameNoCrc, 0, frameNoCrc.length), 16)
      out.write(w.bytes)
      off += bs
      frameIdx += 1
    }
    out.toByteArray
  }

  // ---- decoder -----------------------------------------------------------

  /** Full decode: STREAMINFO + every frame, CRC-verified. Returns
    * per-channel sample planes (after stereo reconstruction), or None
    * on ANY structural/CRC violation. The catch-all is defense in
    * depth for untrusted crawl bytes: every known reject path returns
    * None explicitly (and the specs drive them), but a crafted stream
    * hitting an unforeseen parser edge must drop the blob, not kill
    * the Spark job that flatMapped it. */
  def decodeFlac(bytes: Array[Byte]): Option[(FlacStreamInfo, Array[Array[Int]])] =
    try decodeFlacImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeFlacImpl(bytes: Array[Byte]): Option[(FlacStreamInfo, Array[Array[Int]])] = {
    if (bytes.length < 4 + 4 + 34) return None
    if (!(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C'))
      return None
    var p = 4
    var info: FlacStreamInfo = null
    var last = false
    while (!last) {
      if (p + 4 > bytes.length) return None
      val h = bytes(p) & 0xff
      last = (h & 0x80) != 0
      val btype = h & 0x7f
      val len = ((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) |
        (bytes(p + 3) & 0xff)
      if (p + 4 + len > bytes.length) return None
      if (btype == 0) {
        // A lying short declared length would let the 34-byte fixed
        // STREAMINFO read run past the block (and, near the buffer
        // tail, past the array): reject, mirroring sniffFlac. RFC 9639
        // fixes the STREAMINFO body at exactly 34 bytes.
        if (len < 34) return None
        val r = new BitR(bytes, p + 4)
        val minB = r.bits(16).toInt; val maxB = r.bits(16).toInt
        r.bits(24); r.bits(24)
        val rate = r.bits(20).toInt
        val ch = r.bits(3).toInt + 1
        val bps = r.bits(5).toInt + 1
        val tot = r.bits(36)
        info = FlacStreamInfo(minB, maxB, rate, ch, bps, tot)
      } else if (btype == 127) return None // invalid block type
      p += 4 + len
    }
    if (info == null) return None
    val planes = Array.fill(info.channels)(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    // totalSamples == 0 means UNKNOWN in RFC 9639 (a streamed encode
    // that never patched the header), not "empty": decode frames until
    // EOF and report the actual count, so a spec-legal unknown-length
    // stream is a real decode, never a silent empty one. Known-length
    // streams keep the exact-count check (trailing garbage after the
    // declared samples still rejects via the frame-sync parse below).
    val unknownLen = info.totalSamples == 0L
    var total = 0L
    while (p < bytes.length && (unknownLen || total < info.totalSamples)) {
      val fr = decodeFrame(bytes, p, info) match {
        case Some(x) => x
        case None => return None
      }
      val (chans, nextP) = fr
      if (chans.length != info.channels) return None
      var c = 0
      while (c < chans.length) { planes(c) ++= chans(c); c += 1 }
      total += chans(0).length
      p = nextP
    }
    if (!unknownLen && total != info.totalSamples) return None
    Some((if (unknownLen) info.copy(totalSamples = total) else info,
      planes.map(_.toArray)))
  }

  /** One frame starting at byte `p`; returns (channel planes, next byte
    * offset). */
  private def decodeFrame(bytes: Array[Byte], p: Int,
                          info: FlacStreamInfo)
  : Option[(Array[Array[Int]], Int)] = {
    val r = new BitR(bytes, p)
    if (!r.ok(32)) return None
    if (r.bits(14) != 0x3FFE) return None
    if (r.bits(1) != 0) return None
    r.bits(1) // blocking strategy (frame- vs sample-number; both via utf8)
    val bsCode = r.bits(4).toInt
    val srCode = r.bits(4).toInt
    val chCode = r.bits(4).toInt
    val ssCode = r.bits(3).toInt
    if (r.bits(1) != 0) return None
    if (readUtf8Num(r) < 0) return None
    val blockSize = bsCode match {
      case 0 => return None
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => if (!r.ok(8)) return None else r.bits(8).toInt + 1
      case 7 => if (!r.ok(16)) return None else r.bits(16).toInt + 1
      case c => 256 << (c - 8)
    }
    srCode match {
      case 0 => ()
      case c if c >= 1 && c <= 11 => ()
      case 12 => if (!r.ok(8)) return None else r.bits(8)
      case 13 | 14 => if (!r.ok(16)) return None else r.bits(16)
      case _ => return None
    }
    val bps = ssCode match {
      case 0 => info.bps
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => return None
    }
    val headerEnd = r.bytePos
    if (!r.ok(8)) return None
    if (r.bits(8).toInt != crc8(bytes, p, headerEnd)) return None
    val (nCh, sideCh) = chCode match {
      case c if c <= 7 => (c + 1, -1)
      case 8 => (2, 1)  // left/side
      case 9 => (2, 0)  // side/right
      case 10 => (2, 1) // mid/side
      case _ => return None
    }
    val raw = new Array[Array[Int]](nCh)
    var c = 0
    while (c < nCh) {
      val chBps = if (c == sideCh) bps + 1 else bps
      raw(c) = decodeSubframe(r, blockSize, chBps) match {
        case Some(x) => x
        case None => return None
      }
      c += 1
    }
    r.alignByte()
    val frameEnd = r.bytePos
    if (!r.ok(16)) return None
    if (r.bits(16).toInt != crc16(bytes, p, frameEnd)) return None
    val chans: Array[Array[Int]] = chCode match {
      case 8 => // left/side: R = L - side
        Array(raw(0), Array.tabulate(blockSize)(i => raw(0)(i) - raw(1)(i)))
      case 9 => // side/right: L = side + R
        Array(Array.tabulate(blockSize)(i => raw(0)(i) + raw(1)(i)), raw(1))
      case 10 => // mid/side
        val l = new Array[Int](blockSize)
        val rr = new Array[Int](blockSize)
        var i = 0
        while (i < blockSize) {
          var mid = raw(0)(i).toLong << 1
          val side = raw(1)(i).toLong
          mid |= (side & 1L)
          l(i) = ((mid + side) >> 1).toInt
          rr(i) = ((mid - side) >> 1).toInt
          i += 1
        }
        Array(l, rr)
      case _ => raw
    }
    Some((chans, r.bytePos))
  }

  private[graft] def decodeSubframe(r: BitR, n: Int, bps: Int): Option[Array[Int]] = {
    if (!r.ok(8)) return None
    if (r.bits(1) != 0) return None
    val tpe = r.bits(6).toInt
    val wasted =
      if (r.bits(1) == 0) 0
      else {
        val q = r.unary()
        if (q < 0) return None
        q + 1
      }
    val ebps = bps - wasted
    // Planes are Int: an effective depth past 31 bits (a 32-bit stream,
    // or its side channel at 33) would silently wrap in sbits(ebps)
    // .toInt — wrong samples under passing CRCs. Reject instead of
    // mis-decoding; ≤31 covers every 8/16/24-bit stream including the
    // +1-bit side channels (25 bits), i.e. all real crawl audio.
    if (ebps <= 0 || ebps > 31) return None
    val out: Array[Int] =
      if (tpe == 0) {
        if (!r.ok(ebps)) return None
        val v = r.sbits(ebps).toInt
        Array.fill(n)(v)
      } else if (tpe == 1) {
        val a = new Array[Int](n)
        var i = 0
        while (i < n) {
          if (!r.ok(ebps)) return None
          a(i) = r.sbits(ebps).toInt
          i += 1
        }
        a
      } else if (tpe >= 8 && tpe <= 12) {
        val order = tpe - 8
        if (order > n) return None
        val a = new Array[Int](n)
        var i = 0
        while (i < order) {
          if (!r.ok(ebps)) return None
          a(i) = r.sbits(ebps).toInt
          i += 1
        }
        decodeResidual(r, n, order) match {
          case None => return None
          case Some(res) =>
            var j = order
            while (j < n) {
              var pred = 0L
              var t = 0
              while (t < order) { pred += FixedCoefs(order)(t).toLong * a(j - 1 - t); t += 1 }
              a(j) = (pred + res(j - order)).toInt
              j += 1
            }
        }
        a
      } else if (tpe >= 32) {
        val order = (tpe & 0x1f) + 1
        if (order > n) return None
        val a = new Array[Int](n)
        var i = 0
        while (i < order) {
          if (!r.ok(ebps)) return None
          a(i) = r.sbits(ebps).toInt
          i += 1
        }
        if (!r.ok(4)) return None
        val prec = r.bits(4).toInt + 1
        if (prec == 16) return None // 0b1111 is invalid
        if (!r.ok(5)) return None
        val shift = r.sbits(5).toInt
        if (shift < 0) return None
        val coefs = new Array[Long](order)
        var t = 0
        while (t < order) {
          if (!r.ok(prec)) return None
          coefs(t) = r.sbits(prec)
          t += 1
        }
        decodeResidual(r, n, order) match {
          case None => return None
          case Some(res) =>
            var j = order
            while (j < n) {
              var pred = 0L
              var u = 0
              while (u < order) { pred += coefs(u) * a(j - 1 - u); u += 1 }
              a(j) = ((pred >> shift) + res(j - order)).toInt
              j += 1
            }
        }
        a
      } else return None
    Some(if (wasted == 0) out else out.map(_ << wasted))
  }

  private def decodeResidual(r: BitR, n: Int, order: Int): Option[Array[Int]] = {
    if (!r.ok(6)) return None
    val method = r.bits(2).toInt
    if (method > 1) return None
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = r.bits(4).toInt
    val nPart = 1 << po
    if ((n % nPart) != 0) return None
    val out = new Array[Int](n - order)
    var idx = 0
    var part = 0
    while (part < nPart) {
      val cnt = (n >> po) - (if (part == 0) order else 0)
      if (cnt < 0) return None
      if (!r.ok(pBits)) return None
      val k = r.bits(pBits).toInt
      if (k == escape) {
        if (!r.ok(5)) return None
        val rawBits = r.bits(5).toInt
        var i = 0
        while (i < cnt) {
          if (rawBits == 0) out(idx) = 0
          else {
            if (!r.ok(rawBits)) return None
            out(idx) = r.sbits(rawBits).toInt
          }
          idx += 1
          i += 1
        }
      } else {
        var i = 0
        while (i < cnt) {
          val q = r.unary()
          if (q < 0) return None
          if (!r.ok(k)) return None
          val u = (q.toLong << k) | (if (k > 0) r.bits(k) else 0L)
          out(idx) = ((u >>> 1) ^ -(u & 1L)).toInt // un-zigzag
          idx += 1
          i += 1
        }
      }
      part += 1
    }
    Some(out)
  }
}
