package graft.multimodal

/** MPEG audio (MP3) FRAME WALK — the container/metadata member of the
  * lossy-audio family, closing the round-12 verdict #6 gap the same
  * way the MP4 box walk did for video: the byte-exact, cross-engine-
  * gateable surface of an MP3 file is its frame structure (ISO/IEC
  * 11172-3 §2.4 header syntax, extended by 13818-3 for MPEG-2 and the
  * de-facto MPEG-2.5 rate extension), not its decoded samples — full
  * Layer III audio decode ends in a floating-point IMDCT + synthesis
  * filterbank with no exact oracle in any second engine (the dated
  * refusal note sits in COVERAGE.md beside the MP4 pixel-decode one).
  *
  * The walk parses, per frame: 11-bit sync, version (MPEG-1/2/2.5;
  * reserved rejects), layer (I/II/III; reserved rejects), bitrate
  * index (0b1111 rejects; 0b0000 "free format" rejects — frame length
  * is undefined without it), sample-rate index (0b11 rejects),
  * padding bit, channel mode; hops by the exact frame-length formula
  * (Layer I: (12·kbps·1000/sr + pad)·4; Layer II/III MPEG-1:
  * 144·kbps·1000/sr + pad; Layer III MPEG-2/2.5: 72·kbps·1000/sr +
  * pad). A leading ID3v2 tag (syncsafe length) is skipped; a trailing
  * 128-byte ID3v1 "TAG" block is accepted; ANY other structural
  * violation — truncated frame, sync loss mid-file, version/layer/
  * rate/mode changing between frames — returns None, never a guess.
  * The Xing/Info VBR header is detected at its spec offset (4 +
  * side-info length: MPEG-1 mono 17 / stereo 32; MPEG-2/2.5 mono 9 /
  * stereo 17) in the first frame.
  *
  * The builder synthesizes spec-valid streams (deterministic payload
  * fill) for the gate's synthesis-then-parse closure: the Spark side
  * only ever sees bytes, while the DuckDB oracle recomputes the
  * expected metadata from the generation formula — a parser bug
  * cannot reproduce the closed form.
  */
object Mp3Codec {

  final case class Mp3Meta(version: String, layer: Int, channels: Int,
                           sampleRate: Int, nFrames: Long,
                           durationMs: Long, avgKbps: Long, vbr: Boolean,
                           hasId3: Boolean, hasXing: Boolean, nBytes: Long)

  // index 0 unused (free format), 15 invalid — per ISO 11172-3 Layer
  // III and 13818-3's LSF table.
  private val KbpsV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val KbpsV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val KbpsV1L2 =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val KbpsV1L1 =
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val KbpsV2L2 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  // 13818-3 gives LSF Layer I its OWN table (it is NOT the Layer
  // II/III one): a Layer-I MPEG-2 stream read through the L2/L3 table
  // would compute 4x-short frame hops and reject valid files.
  private val KbpsV2L1 =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)

  private val SrV1 = Array(44100, 48000, 32000)
  private val SrV2 = Array(22050, 24000, 16000)
  private val SrV25 = Array(11025, 12000, 8000)

  private def kbpsTable(verBits: Int, layer: Int): Array[Int] =
    (verBits, layer) match {
      case (3, 3) => KbpsV1L3
      case (3, 2) => KbpsV1L2
      case (3, 1) => KbpsV1L1
      case (_, 1) => KbpsV2L1
      case (_, 2) => KbpsV2L2
      case _ => KbpsV2L3
    }

  private def srTable(verBits: Int): Array[Int] = verBits match {
    case 3 => SrV1
    case 2 => SrV2
    case _ => SrV25
  }

  /** Samples per frame: the duration quantum of the walk. */
  def samplesPerFrame(verBits: Int, layer: Int): Int = (verBits, layer) match {
    case (_, 1) => 384
    case (_, 2) => 1152
    case (3, 3) => 1152
    case (_, 3) => 576 // MPEG-2 / 2.5 Layer III (LSF)
  }

  /** Exact frame length in bytes (integer math, both engines). */
  def frameLen(verBits: Int, layer: Int, kbps: Int, sr: Int,
               pad: Int): Int = layer match {
    case 1 => (12 * kbps * 1000 / sr + pad) * 4
    case 2 => 144 * kbps * 1000 / sr + pad
    case 3 =>
      if (verBits == 3) 144 * kbps * 1000 / sr + pad
      else 72 * kbps * 1000 / sr + pad
  }

  private def sideInfoLen(verBits: Int, mono: Boolean): Int =
    if (verBits == 3) { if (mono) 17 else 32 }
    else { if (mono) 9 else 17 }

  /** Synthesize a spec-valid stream. `kbpsIdx(i)` picks the bitrate
    * index per frame (VBR when it varies), `pad(i)` the padding bit.
    * `verBits`: 3 = MPEG-1, 2 = MPEG-2, 0 = MPEG-2.5. */
  def buildMp3(verBits: Int, layer: Int, srIdx: Int, mono: Boolean,
               nFrames: Int, kbpsIdx: Int => Int, pad: Int => Int,
               withId3: Boolean = false, withXing: Boolean = false,
               withTag: Boolean = false): Array[Byte] = {
    require(verBits == 3 || verBits == 2 || verBits == 0, "bad version")
    val out = new java.io.ByteArrayOutputStream()
    if (withId3) {
      // ID3v2.3, 64-byte body, syncsafe length
      out.write(Array[Byte]('I', 'D', '3', 3, 0, 0))
      out.write(Array[Byte](0, 0, 0, 64))
      out.write(Array.tabulate(64)(i => (i % 7).toByte))
    }
    val sr = srTable(verBits)(srIdx)
    val tbl = kbpsTable(verBits, layer)
    val layerBits = 4 - layer // L1=11, L2=10, L3=01
    var i = 0
    while (i < nFrames) {
      val bi = kbpsIdx(i)
      val p = pad(i) & 1
      val len = frameLen(verBits, layer, tbl(bi), sr, p)
      val b = new Array[Byte](len)
      b(0) = 0xFF.toByte
      b(1) = (0xE0 | (verBits << 3) | (layerBits << 1) | 1).toByte
      b(2) = ((bi << 4) | (srIdx << 2) | (p << 1)).toByte
      b(3) = (if (mono) 0xC0 else 0x00).toByte
      var j = 4
      while (j < len) { b(j) = ((i * 31 + j) % 251).toByte; j += 1 }
      if (i == 0 && withXing) {
        val off = 4 + sideInfoLen(verBits, mono)
        // zeroed side info, then the bare tag + zero flags
        java.util.Arrays.fill(b, 4, off, 0.toByte)
        b(off) = 'X'.toByte; b(off + 1) = 'i'.toByte
        b(off + 2) = 'n'.toByte; b(off + 3) = 'g'.toByte
        b(off + 4) = 0; b(off + 5) = 0; b(off + 6) = 0; b(off + 7) = 0
      }
      out.write(b)
      i += 1
    }
    if (withTag) {
      val t = new Array[Byte](128)
      t(0) = 'T'.toByte; t(1) = 'A'.toByte; t(2) = 'G'.toByte
      out.write(t)
    }
    out.toByteArray
  }

  /** Strict frame walk; None on any structural violation. */
  def parseMp3(bytes: Array[Byte]): Option[Mp3Meta] =
    try parseImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def parseImpl(bytes: Array[Byte]): Option[Mp3Meta] = {
    var p = 0
    var hasId3 = false
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      // syncsafe 28-bit length EXCLUDES the 10-byte header and, when
      // the ID3v2.4 footer flag (bit 4 of the flags byte) is set, the
      // 10-byte footer too — a footered tag needs 20 bytes of framing
      // skipped or the walk lands on '3DI' and rejects a legal file.
      val len = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      val footer = (bytes(5) & 0x10) != 0
      p = 10 + len + (if (footer) 10 else 0)
      hasId3 = true
      if (p >= bytes.length) return None
    }
    val end0 = bytes.length
    val end =
      if (end0 - p >= 128 && bytes(end0 - 128) == 'T' &&
          bytes(end0 - 127) == 'A' && bytes(end0 - 126) == 'G')
        end0 - 128
      else end0
    var verBits = -1; var layer = -1; var srIdx = -1; var mono = false
    var nFrames = 0L; var kbpsSum = 0L
    var kbpsFirst = -1; var vbr = false; var hasXing = false
    while (p < end) {
      if (p + 4 > end) return None
      if ((bytes(p) & 0xff) != 0xFF || (bytes(p + 1) & 0xE0) != 0xE0)
        return None
      val vb = (bytes(p + 1) >> 3) & 0x3
      if (vb == 1) return None // reserved version
      val lb = (bytes(p + 1) >> 1) & 0x3
      if (lb == 0) return None // reserved layer
      val ly = 4 - lb
      val bi = (bytes(p + 2) >> 4) & 0xf
      if (bi == 0 || bi == 15) return None // free format / invalid
      val si = (bytes(p + 2) >> 2) & 0x3
      if (si == 3) return None // reserved rate
      val pad = (bytes(p + 2) >> 1) & 0x1
      val mn = ((bytes(p + 3) >> 6) & 0x3) == 3
      if (nFrames == 0L) {
        verBits = vb; layer = ly; srIdx = si; mono = mn
      } else if (vb != verBits || ly != layer || si != srIdx ||
          mn != mono) return None // stream must be self-consistent
      val kbps = kbpsTable(vb, ly)(bi)
      val sr = srTable(vb)(si)
      val len = frameLen(vb, ly, kbps, sr, pad)
      if (p + len > end) return None // truncated frame
      if (nFrames == 0L) {
        kbpsFirst = kbps
        val off = p + 4 + sideInfoLen(vb, mn)
        if (off + 4 <= p + len) {
          val tag = new String(bytes, off, 4, "US-ASCII")
          if (tag == "Xing" || tag == "Info") hasXing = true
        }
      } else if (kbps != kbpsFirst) vbr = true
      kbpsSum += kbps
      nFrames += 1
      p += len
    }
    if (nFrames == 0L) return None
    val sr = srTable(verBits)(srIdx)
    val spf = samplesPerFrame(verBits, layer)
    Some(Mp3Meta(
      version = verBits match {
        case 3 => "1"
        case 2 => "2"
        case _ => "2.5"
      },
      layer = layer,
      channels = if (mono) 1 else 2,
      sampleRate = sr,
      nFrames = nFrames,
      durationMs = nFrames * spf * 1000L / sr,
      avgKbps = kbpsSum / nFrames,
      vbr = vbr,
      hasId3 = hasId3,
      hasXing = hasXing,
      nBytes = bytes.length.toLong))
  }
}
