package graft.multimodal

/** REAL media codecs for the two container formats that are pure byte
  * layouts and need no native library: RIFF/WAVE PCM audio and BMP
  * (BITMAPINFOHEADER, uncompressed 24-bit) images. These replace two of
  * the four declared-fake codecs in [[MultimodalOps]]: the byte-level
  * parsing — little-endian field extraction, chunk walking, row padding
  * arithmetic — is the genuine article, exercised end to end by the
  * `mm_wav_decode` / `mm_bmp_decode` gates (synthesis parameters are
  * formula-derived per doc, the SPARK side decodes the actual bytes, and
  * the oracle recomputes the expectation analytically — a wrong parser
  * turns the gate red).
  *
  * Builders emit the canonical minimal containers (44-byte WAV header;
  * 54-byte BMP header, bottom-up rows, 4-byte row padding) so parser and
  * builder cannot drift: the spec round-trips both and cross-checks
  * hand-assembled byte fixtures.
  */
object MediaCodecs {

  // ---- little-endian primitives -----------------------------------------

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def readLe16s(b: Array[Byte], off: Int): Short =
    ((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)).toShort
  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], off: Int, s: String): Boolean =
    b.length >= off + 4 && (0 until 4).forall(i => b(off + i) == s.charAt(i).toByte)

  // ---- WAV (RIFF/WAVE, PCM 16-bit) --------------------------------------

  final case class WavMeta(sampleRate: Int, channels: Int,
                           bitsPerSample: Int, nSamples: Long,
                           sumSquares: Long, peak: Int = 0,
                           zeroCrossings: Long = 0L)

  /** Canonical 44-byte-header PCM WAV: RIFF size, fmt chunk (PCM, LE
    * fields), data chunk with 16-bit LE samples. */
  def buildWav(sampleRate: Int, channels: Int,
               samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val byteRate = sampleRate * channels * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
    out.put("RIFF".getBytes("US-ASCII")).put(le32(36 + dataLen))
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).put(le32(16))
      .put(le16(1))                       // PCM
      .put(le16(channels))
      .put(le32(sampleRate))
      .put(le32(byteRate))
      .put(le16(channels * 2))            // block align
      .put(le16(16))                      // bits per sample
      .put("data".getBytes("US-ASCII")).put(le32(dataLen))
    samples.foreach(s => out.put(le16(s & 0xffff)))
    out.array()
  }

  /** Walks the RIFF chunk list (not a fixed-offset read: a real-world
    * WAV may carry LIST/fact chunks before data), parses the PCM format
    * fields, and folds the 16-bit LE samples into an exact integer
    * sum-of-squares. Returns None for anything that is not a PCM-16
    * RIFF/WAVE — truncated, wrong magic, compressed, or odd-sized data. */
  def parseWav(bytes: Array[Byte]): Option[WavMeta] = {
    if (bytes == null || bytes.length < 44) return None
    if (!tag(bytes, 0, "RIFF") || !tag(bytes, 8, "WAVE")) return None
    var off = 12
    var meta: Option[(Int, Int, Int)] = None // (rate, channels, bits)
    while (off + 8 <= bytes.length) {
      val size = readLe32(bytes, off + 4)
      if (size < 0 || off + 8 + size > bytes.length) return None
      if (tag(bytes, off, "fmt ")) {
        if (size < 16) return None
        val fmt = readLe16(bytes, off + 8)
        val ch = readLe16(bytes, off + 10)
        val rate = readLe32(bytes, off + 12)
        val bits = readLe16(bytes, off + 22)
        if (fmt != 1 || ch <= 0 || rate <= 0) return None
        meta = Some((rate, ch, bits))
      } else if (tag(bytes, off, "data")) {
        val (rate, ch, bits) = meta.getOrElse(return None)
        if (bits != 16 || size % 2 != 0) return None
        var i = off + 8
        val end = off + 8 + size
        var sumSq = 0L
        var peak = 0
        var crossings = 0L
        var prev = 0 // sign of the previous sample; 0 until first nonzero
        while (i < end) { // exact: 2^31 samples × (2^15)² < 2^63
          val s = readLe16s(bytes, i).toInt
          sumSq += s.toLong * s
          val a = math.abs(s)
          if (a > peak) peak = a
          val sign = Integer.signum(s)
          if (sign != 0) {
            if (prev != 0 && sign != prev) crossings += 1
            prev = sign
          }
          i += 2
        }
        return Some(WavMeta(rate, ch, bits, size / 2, sumSq, peak, crossings))
      }
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    None
  }

  /** The raw PCM-16 sample stream of a parseable WAV (channels
    * interleaved), for feature extractors that need the samples
    * themselves rather than [[parseWav]]'s folded features. Same
    * validation as [[parseWav]] (None on any non-PCM-16 RIFF). */
  def wavSamples(bytes: Array[Byte]): Option[Array[Short]] = {
    parseWav(bytes).map { m =>
      // parseWav validated the layout; re-walk to the data chunk.
      var off = 12
      while (!tag(bytes, off, "data"))
        off += 8 + readLe32(bytes, off + 4) + (readLe32(bytes, off + 4) & 1)
      val n = readLe32(bytes, off + 4) / 2
      Array.tabulate(n)(i => readLe16s(bytes, off + 8 + 2 * i))
    }
  }

  /** Per-channel features of a (possibly multi-channel) PCM-16 WAV —
    * the stereo de-interleave [[decimateWav]]/[[trimWavSilence]]
    * declare out of scope (round-11): channel c's samples sit at
    * interleaved positions c, c+ch, c+2ch… (the RIFF frame layout),
    * and each channel folds its own (nSamples, sumSquares, peak,
    * zeroCrossings). Crossings are counted WITHIN the channel — the
    * interleaved fold [[parseWav]] runs is correct only for mono; on
    * stereo, L/R alternation fabricates crossings no channel
    * contains, which is exactly the bug this function exists to
    * avoid. None on anything [[parseWav]] rejects, or a data chunk
    * that is not a whole number of frames. */
  def wavChannelFeatures(bytes: Array[Byte])
  : Option[Seq[(Int, Long, Long, Int, Long)]] = {
    parseWav(bytes).flatMap { m =>
      var off = 12
      var dataOff = -1
      var dataSize = 0
      while (dataOff < 0 && off + 8 <= bytes.length) {
        val size = readLe32(bytes, off + 4)
        if (tag(bytes, off, "data")) { dataOff = off + 8; dataSize = size }
        else off += 8 + size + (size & 1)
      }
      val ch = m.channels
      val n = dataSize / 2
      if (n % ch != 0) None
      else {
        val frames = n / ch
        Some((0 until ch).map { c =>
          var sumSq = 0L
          var peak = 0
          var crossings = 0L
          var prev = 0
          var f = 0
          while (f < frames) {
            val s = readLe16s(bytes, dataOff + 2 * (f * ch + c)).toInt
            sumSq += s.toLong * s
            val a = math.abs(s)
            if (a > peak) peak = a
            val sign = Integer.signum(s)
            if (sign != 0) {
              if (prev != 0 && sign != prev) crossings += 1
              prev = sign
            }
            f += 1
          }
          (c, frames.toLong, sumSq, peak, crossings)
        })
      }
    }
  }

  /** REAL sample-rate decimation, bytes → bytes: parse the PCM-16 WAV,
    * keep every k-th sample (no anti-alias filter — plain decimation,
    * documented as such), re-encode at rate/k. Interleaved channels are
    * out of scope here (mono contract, rejected otherwise); rate must
    * divide evenly by k. */
  def decimateWav(bytes: Array[Byte], k: Int): Option[Array[Byte]] = {
    if (k <= 0) return None
    parseWav(bytes).flatMap { m =>
      if (m.channels != 1 || m.sampleRate % k != 0) None
      else {
        // Relocate the data chunk (parseWav validated it exists).
        var off = 12
        var dataOff = -1
        while (dataOff < 0 && off + 8 <= bytes.length) {
          val size = readLe32(bytes, off + 4)
          if (tag(bytes, off, "data")) dataOff = off + 8
          else off += 8 + size + (size & 1)
        }
        val n = m.nSamples.toInt
        val kept = Array.tabulate((n + k - 1) / k)(i =>
          readLe16s(bytes, dataOff + 2 * i * k))
        Some(buildWav(m.sampleRate / k, 1, kept))
      }
    }
  }

  /** REAL silence trim, bytes → bytes: parse the mono PCM-16 WAV, drop
    * leading and trailing samples with |s| ≤ `threshold`, re-encode the
    * kept span at the same rate. Returns the trimmed container plus how
    * many samples each edge lost. An all-silent signal trims to zero
    * samples (still a valid, empty WAV). None on anything [[parseWav]]
    * rejects, plus stereo (channel de-interleaving is out of scope, as
    * in [[decimateWav]]). */
  def trimWavSilence(bytes: Array[Byte],
                     threshold: Int): Option[(Array[Byte], Int, Int)] = {
    if (threshold < 0) return None
    parseWav(bytes).flatMap { m =>
      if (m.channels != 1) None
      else {
        var off = 12
        var dataOff = -1
        while (dataOff < 0 && off + 8 <= bytes.length) {
          val size = readLe32(bytes, off + 4)
          if (tag(bytes, off, "data")) dataOff = off + 8
          else off += 8 + size + (size & 1)
        }
        val n = m.nSamples.toInt
        def amp(i: Int): Int = math.abs(readLe16s(bytes, dataOff + 2 * i).toInt)
        var lo = 0
        while (lo < n && amp(lo) <= threshold) lo += 1
        var hi = n - 1
        while (hi >= lo && amp(hi) <= threshold) hi -= 1
        val kept = Array.tabulate(hi - lo + 1)(i =>
          readLe16s(bytes, dataOff + 2 * (lo + i)))
        Some((buildWav(m.sampleRate, 1, kept), lo, n - 1 - hi))
      }
    }
  }

  // ---- BMP (BITMAPINFOHEADER, 24-bit uncompressed) ----------------------

  final case class BmpMeta(width: Int, height: Int, bitsPerPixel: Int,
                           sumB: Long, sumG: Long, sumR: Long)

  /** Minimal 24-bit BMP: 14-byte file header + 40-byte info header +
    * bottom-up BGR rows, each padded to a 4-byte boundary. */
  def buildBmp(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val rowSize = ((3 * width + 3) / 4) * 4
    val dataLen = rowSize * height
    val out = java.nio.ByteBuffer.allocate(54 + dataLen)
    out.put('B'.toByte).put('M'.toByte).put(le32(54 + dataLen))
      .put(le32(0)).put(le32(54))
      .put(le32(40)).put(le32(width)).put(le32(height))
      .put(le16(1)).put(le16(24))
      .put(le32(0))                        // BI_RGB, uncompressed
      .put(le32(dataLen)).put(le32(2835)).put(le32(2835))
      .put(le32(0)).put(le32(0))
    val row = new Array[Byte](rowSize)
    var x = 0
    while (x < width) {
      row(3 * x) = b.toByte; row(3 * x + 1) = g.toByte; row(3 * x + 2) = r.toByte
      x += 1
    }
    (0 until height).foreach(_ => out.put(row))
    out.array()
  }

  /** Gradient variant of [[buildBmp]]: pixel (x, y) in IMAGE coordinates
    * (y = 0 at the top) takes `f(x, y) = (r, g, b)`. By default file
    * rows are written bottom-up (positive height); `topDown = true`
    * writes the other REAL-WORLD layout (negative biHeight, file rows
    * in image order — BITMAPINFOHEADER §biHeight), so builder and any
    * consumer must agree on reading the sign — which is exactly what
    * the position-sensitive gates exercise. */
  def buildBmpGradient(width: Int, height: Int,
                       f: (Int, Int) => (Int, Int, Int),
                       topDown: Boolean = false): Array[Byte] = {
    val rowSize = ((3 * width + 3) / 4) * 4
    val out = java.nio.ByteBuffer.allocate(54 + rowSize * height)
    val header = buildBmp(width, height, 0, 0, 0).take(54)
    if (topDown) System.arraycopy(le32(-height), 0, header, 22, 4)
    out.put(header, 0, 54)
    var fileRow = 0
    while (fileRow < height) {
      val y = if (topDown) fileRow else height - 1 - fileRow
      val row = new Array[Byte](rowSize)
      var x = 0
      while (x < width) {
        val (r, g, b) = f(x, y)
        row(3 * x) = b.toByte; row(3 * x + 1) = g.toByte
        row(3 * x + 2) = r.toByte
        x += 1
      }
      out.put(row)
      fileRow += 1
    }
    out.array()
  }

  /** REAL nearest-neighbor resize, bytes → bytes: parses the source BMP
    * (same validity checks as [[parseBmp]]), maps every target pixel
    * (x2, y2) to source pixel (x2·w div w2, y2·h div h2) in IMAGE
    * coordinates — handling the row flip (both biHeight orders, as in
    * [[bmpGrayR]]) and the row padding of BOTH images — and re-encodes
    * a canonical bottom-up 24-bit BMP. None on any input [[parseBmp]]
    * would reject. */
  def resizeBmpNearest(bytes: Array[Byte], w2: Int, h2: Int): Option[Array[Byte]] = {
    if (bytes == null || bytes.length < 54 || w2 <= 0 || h2 <= 0) return None
    if (bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return None
    val pixOff = readLe32(bytes, 10)
    val w = readLe32(bytes, 18)
    val hRaw = readLe32(bytes, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bpp = readLe16(bytes, 28)
    val compression = readLe32(bytes, 30)
    if (w <= 0 || h <= 0 || bpp != 24 || compression != 0) return None
    val srcRowSize = ((3 * w + 3) / 4) * 4
    if (pixOff < 54 || pixOff.toLong + srcRowSize.toLong * h > bytes.length)
      return None
    val dstRowSize = ((3 * w2 + 3) / 4) * 4
    val out = java.nio.ByteBuffer.allocate(54 + dstRowSize * h2)
    out.put(buildBmp(w2, h2, 0, 0, 0), 0, 54)
    var dstFileRow = 0
    while (dstFileRow < h2) {
      val y2 = h2 - 1 - dstFileRow          // image row of this file row
      val sy = y2 * h / h2                  // nearest-neighbor source row
      val srcFileRow = if (topDown) sy else h - 1 - sy
      val row = new Array[Byte](dstRowSize)
      var x2 = 0
      while (x2 < w2) {
        val sx = x2 * w / w2
        val src = pixOff + srcFileRow * srcRowSize + 3 * sx
        row(3 * x2) = bytes(src)
        row(3 * x2 + 1) = bytes(src + 1)
        row(3 * x2 + 2) = bytes(src + 2)
        x2 += 1
      }
      out.put(row)
      dstFileRow += 1
    }
    Some(out.array())
  }

  /** REAL area-average (box) downsample, bytes → bytes: each f×f source
    * block becomes one output pixel whose channel value is the exact
    * integer mean (block sum div f²) — the anti-aliased resize
    * [[resizeBmpNearest]] is not (NN drops 15/16 of the signal at f=4;
    * box folds every pixel in). Integer-exact, so the synthesis gate's
    * oracle can reproduce it analytically. Requires f | width and
    * f | height (no partial edge blocks — exactness contract); None on
    * that, or anything [[parseBmp]] rejects. Both biHeight row orders
    * handled, as in [[bmpGrayR]]. */
  def resizeBmpBox(bytes: Array[Byte], f: Int): Option[Array[Byte]] = {
    if (f <= 0 || bytes == null || bytes.length < 54) return None
    if (bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return None
    val pixOff = readLe32(bytes, 10)
    val w = readLe32(bytes, 18)
    val hRaw = readLe32(bytes, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bpp = readLe16(bytes, 28)
    val compression = readLe32(bytes, 30)
    if (w <= 0 || h <= 0 || bpp != 24 || compression != 0) return None
    if (w % f != 0 || h % f != 0) return None
    val rowSize = ((3 * w + 3) / 4) * 4
    if (pixOff < 54 || pixOff.toLong + rowSize.toLong * h > bytes.length)
      return None
    val (w2, h2) = (w / f, h / f)
    val sums = Array.ofDim[Long](3, w2 * h2) // B, G, R block sums
    var fileRow = 0
    while (fileRow < h) {
      val y = if (topDown) fileRow else h - 1 - fileRow // image row
      val base = pixOff + fileRow * rowSize
      var x = 0
      while (x < w) {
        val cell = (y / f) * w2 + (x / f)
        sums(0)(cell) += bytes(base + 3 * x) & 0xff
        sums(1)(cell) += bytes(base + 3 * x + 1) & 0xff
        sums(2)(cell) += bytes(base + 3 * x + 2) & 0xff
        x += 1
      }
      fileRow += 1
    }
    val area = f.toLong * f
    Some(buildBmpGradient(w2, h2, (x2, y2) => {
      val cell = y2 * w2 + x2
      ((sums(2)(cell) / area).toInt, (sums(1)(cell) / area).toInt,
        (sums(0)(cell) / area).toInt)
    }))
  }

  /** Parses the two headers (pixel-array offset read from the file
    * header — not assumed 54) and folds the BGR pixel grid into exact
    * per-channel sums, skipping each row's padding bytes. None for
    * non-BMP magic, compressed, non-24-bit, or truncated input.
    * Negative height (top-down rows) is accepted — row order does not
    * change channel sums. */
  def parseBmp(bytes: Array[Byte]): Option[BmpMeta] = {
    if (bytes == null || bytes.length < 54) return None
    if (bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return None
    val pixOff = readLe32(bytes, 10)
    val width = readLe32(bytes, 18)
    val heightRaw = readLe32(bytes, 22)
    val height = math.abs(heightRaw)
    val bpp = readLe16(bytes, 28)
    val compression = readLe32(bytes, 30)
    if (width <= 0 || height <= 0 || bpp != 24 || compression != 0) return None
    val rowSize = ((3 * width + 3) / 4) * 4
    if (pixOff < 54 || pixOff.toLong + rowSize.toLong * height > bytes.length)
      return None
    var (sumB, sumG, sumR) = (0L, 0L, 0L)
    var y = 0
    while (y < height) {
      var x = 0
      val base = pixOff + y * rowSize
      while (x < width) {
        sumB += bytes(base + 3 * x) & 0xff
        sumG += bytes(base + 3 * x + 1) & 0xff
        sumR += bytes(base + 3 * x + 2) & 0xff
        x += 1
      }
      y += 1
    }
    Some(BmpMeta(width, height, bpp, sumB, sumG, sumR))
  }

  /** REAL pixel read: the R channel of a 24-bit BMP in IMAGE order
    * (index y·w + x, y = 0 the TOP row) — the flip and padding
    * handled the same way as [[resizeBmpNearest]]. Both real-world
    * row orders are modeled (round-11): positive biHeight = bottom-up
    * (file rows flipped), negative = top-down (file rows already in
    * image order). None on anything [[parseBmp]] rejects. */
  def bmpGrayR(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes == null || bytes.length < 54) return None
    if (bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return None
    val pixOff = readLe32(bytes, 10)
    val w = readLe32(bytes, 18)
    val hRaw = readLe32(bytes, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bpp = readLe16(bytes, 28)
    val compression = readLe32(bytes, 30)
    if (w <= 0 || h <= 0 || bpp != 24 || compression != 0) return None
    val rowSize = ((3 * w + 3) / 4) * 4
    if (pixOff < 54 || pixOff.toLong + rowSize.toLong * h > bytes.length)
      return None
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val base = pixOff + (if (topDown) y else h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        out(y * w + x) = bytes(base + 3 * x + 2) & 0xff
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  /** REAL patch grid (the ViT-preprocessing shape): the image cut into
    * a p×p patch lattice — edge patches smaller, image-order (px, py)
    * with py = 0 the TOP row band — and the R-channel sum of each
    * patch's ACTUAL bytes (same bottom-up flip + row padding arithmetic
    * as [[bmpGrayR]]). One linear pass over the pixel array; patch
    * geometry (pw, ph) travels with each sum so a consumer can
    * normalize without re-deriving the lattice. Both biHeight row
    * orders handled, as in [[bmpGrayR]]. None on anything
    * [[bmpGrayR]] rejects. */
  def bmpPatchSums(bytes: Array[Byte],
                   p: Int): Option[Seq[(Int, Int, Int, Int, Long)]] = {
    if (p <= 0 || bytes == null || bytes.length < 54) return None
    if (bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return None
    val pixOff = readLe32(bytes, 10)
    val w = readLe32(bytes, 18)
    val hRaw = readLe32(bytes, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bpp = readLe16(bytes, 28)
    val compression = readLe32(bytes, 30)
    if (w <= 0 || h <= 0 || bpp != 24 || compression != 0) return None
    val rowSize = ((3 * w + 3) / 4) * 4
    if (pixOff < 54 || pixOff.toLong + rowSize.toLong * h > bytes.length)
      return None
    val nx = (w + p - 1) / p
    val ny = (h + p - 1) / p
    val sums = new Array[Long](nx * ny)
    var fileRow = 0
    while (fileRow < h) {
      val y = if (topDown) fileRow else h - 1 - fileRow
      val base = pixOff + fileRow * rowSize
      var x = 0
      while (x < w) {
        sums((y / p) * nx + (x / p)) += bytes(base + 3 * x + 2) & 0xff
        x += 1
      }
      fileRow += 1
    }
    Some(for (py <- 0 until ny; px <- 0 until nx) yield
      (px, py, math.min(p, w - px * p), math.min(p, h - py * p),
        sums(py * nx + px)))
  }

  // ---- PNG (8-bit truecolor, zlib DEFLATE, full filter set) -------------

  final case class PngMeta(width: Int, height: Int, bitDepth: Int,
                           colorType: Int, sumR: Long, sumG: Long, sumB: Long)

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update(t); crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  /** The Paeth predictor (PNG spec §9): nearest of left/up/up-left to
    * the linear estimate a + b − c, ties broken a, then b, then c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Adam7 pass lattice (PNG spec §8.2): (xStart, yStart, xStep,
    * yStep) per pass; a pass whose sub-grid is empty for the image's
    * geometry contributes NO bytes (spec: empty passes are wholly
    * absent from the stream). */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** REAL PNG encoder for 8-bit truecolor (color type 2): pixel (x, y)
    * takes `f(x, y) = (r, g, b)` in image coordinates (top-down — PNG's
    * native row order, no BMP-style flip). Rows are filtered with the
    * full spec filter set CYCLING per row (row % 5 → None/Sub/Up/
    * Average/Paeth) so a decoder that skips filter reconstruction
    * cannot round-trip the bytes, then zlib-DEFLATEd into one IDAT.
    * Each chunk carries its real CRC-32.
    *
    * `interlaced = true` writes the Adam7 seven-pass layout (spec
    * §8.2): each pass is its own reduced image — per-pass stride,
    * filter state (prior row and the row % 5 cycle) resetting at
    * every pass boundary, empty passes absent — exactly the layout
    * [[parsePng]] reconstructs. */
  def buildPng(width: Int, height: Int,
               f: (Int, Int) => (Int, Int, Int),
               interlaced: Boolean = false): Array[Byte] = {
    val bpp = 3
    val rawOut = new java.io.ByteArrayOutputStream
    def writePass(xs: IndexedSeq[Int], ys: IndexedSeq[Int]): Unit = {
      if (xs.isEmpty || ys.isEmpty) return
      val stride = bpp * xs.length
      var prior = new Array[Byte](stride)
      var py = 0
      while (py < ys.length) {
        val row = new Array[Byte](stride)
        var ix = 0
        while (ix < xs.length) {
          val (r, g, b) = f(xs(ix), ys(py))
          row(bpp * ix) = r.toByte; row(bpp * ix + 1) = g.toByte
          row(bpp * ix + 2) = b.toByte
          ix += 1
        }
        val ft = py % 5
        rawOut.write(ft)
        var i = 0
        while (i < stride) {
          val cur = row(i) & 0xff
          val left = if (i >= bpp) row(i - bpp) & 0xff else 0
          val up = prior(i) & 0xff
          val ul = if (i >= bpp) prior(i - bpp) & 0xff else 0
          val filt = ft match {
            case 0 => cur
            case 1 => cur - left
            case 2 => cur - up
            case 3 => cur - (left + up) / 2
            case 4 => cur - paeth(left, up, ul)
          }
          rawOut.write(filt & 0xff)
          i += 1
        }
        prior = row
        py += 1
      }
    }
    if (!interlaced) writePass(0 until width, 0 until height)
    else Adam7.foreach { case (x0, y0, dx, dy) =>
      writePass(x0 until width by dx, y0 until height by dy)
    }
    val raw = rawOut.toByteArray
    val deflater = new java.util.zip.Deflater
    deflater.setInput(raw); deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream
    val buf = new Array[Byte](8192)
    while (!deflater.finished())
      zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = be32(width) ++ be32(height) ++
      Array[Byte](8, 2, 0, 0, // depth 8, truecolor, deflate, adaptive
        if (interlaced) 1 else 0)
    PngSig ++ pngChunk("IHDR", ihdr) ++
      pngChunk("IDAT", zOut.toByteArray) ++
      pngChunk("IEND", Array.empty[Byte])
  }

  /** REAL PNG decoder: verifies the signature, walks the chunk list
    * CHECKING every CRC-32, parses IHDR (8-bit truecolor; sequential
    * AND Adam7-interlaced), concatenates the IDAT stream, INFLATEs it,
    * reconstructs all five spec filters row by row, and folds the RGB
    * grid into exact per-channel sums. Adam7 (round-11, the way
    * progressive JPEG was closed in round 10): the seven reduced
    * images are unfiltered independently — per-pass stride, prior row
    * resetting at each pass boundary, empty passes absent — and since
    * every image pixel belongs to exactly one pass, the channel sums
    * fold per pass without materializing the de-interlaced grid
    * (column i of a pass row is channel i mod 3 regardless of pass).
    * None on anything malformed: bad magic, a chunk that lies about
    * its length, a corrupted CRC, an unsupported color/depth/interlace
    * combination, undecodable zlib data, or an inflated length that
    * disagrees with the pass geometry. */
  def parsePng(bytes: Array[Byte]): Option[PngMeta] = {
    if (bytes == null || bytes.length < PngSig.length + 12) return None
    if (!PngSig.indices.forall(i => bytes(i) == PngSig(i))) return None
    var off = PngSig.length
    var ihdr: Option[(Int, Int, Int, Int, Int)] = None
    val idat = new java.io.ByteArrayOutputStream
    var ended = false
    while (!ended && off + 12 <= bytes.length) {
      val len = readBe32(bytes, off)
      if (len < 0 || off + 12 + len > bytes.length) return None
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(bytes, off + 4, 4 + len)
      if (crc.getValue.toInt != readBe32(bytes, off + 8 + len)) return None
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          val w = readBe32(bytes, off + 8)
          val h = readBe32(bytes, off + 12)
          val depth = bytes(off + 16) & 0xff
          val ct = bytes(off + 17) & 0xff
          val interlace = bytes(off + 20) & 0xff
          if (w <= 0 || h <= 0 || depth != 8 || ct != 2 ||
            (interlace != 0 && interlace != 1)) return None
          ihdr = Some((w, h, depth, ct, interlace))
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => ended = true
        case _ => () // ancillary chunks pass (CRC already verified)
      }
      off += 12 + len
    }
    val (w, h, depth, ct, interlace) = ihdr.getOrElse(return None)
    if (!ended || idat.size == 0) return None
    val bpp = 3
    // Pass geometry: one (width, height) per reduced image — the
    // sequential layout is the single full-size pass.
    val passes: Seq[(Int, Int)] =
      if (interlace == 0) Seq((w, h))
      else Adam7.toSeq.map { case (x0, y0, dx, dy) =>
        (((w - x0 + dx - 1) / dx), ((h - y0 + dy - 1) / dy))
      }.filter { case (pw, ph) => pw > 0 && ph > 0 }
    val rawLen = passes.map { case (pw, ph) =>
      ph.toLong * (1 + bpp * pw)
    }.sum
    if (rawLen > Int.MaxValue) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inflater = new java.util.zip.Inflater
    inflater.setInput(idat.toByteArray)
    try {
      var got = 0
      var step = -1
      while (got < raw.length && !inflater.finished() && step != 0) {
        step = inflater.inflate(raw, got, raw.length - got)
        got += step
      }
      // Exact geometry: short zlib data AND extra pixel rows both reject.
      if (got != raw.length || !inflater.finished()) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    var (sumR, sumG, sumB) = (0L, 0L, 0L)
    var base = 0
    var pi = 0
    while (pi < passes.length) {
      val (pw, ph) = passes(pi)
      val stride = bpp * pw
      var prior = new Array[Byte](stride)
      var y = 0
      while (y < ph) {
        val ft = raw(base + y * (1 + stride)) & 0xff
        if (ft > 4) return None
        val row = new Array[Byte](stride)
        var i = 0
        while (i < stride) {
          val filt = raw(base + y * (1 + stride) + 1 + i) & 0xff
          val left = if (i >= bpp) row(i - bpp) & 0xff else 0
          val up = prior(i) & 0xff
          val ul = if (i >= bpp) prior(i - bpp) & 0xff else 0
          val recon = ft match {
            case 0 => filt
            case 1 => filt + left
            case 2 => filt + up
            case 3 => filt + (left + up) / 2
            case 4 => filt + paeth(left, up, ul)
          }
          row(i) = recon.toByte
          i += 1
        }
        i = 0
        while (i < stride) {
          (i % bpp: @annotation.switch) match {
            case 0 => sumR += row(i) & 0xff
            case 1 => sumG += row(i) & 0xff
            case 2 => sumB += row(i) & 0xff
          }
          i += 1
        }
        prior = row
        y += 1
      }
      base += ph * (1 + stride)
      pi += 1
    }
    Some(PngMeta(w, h, depth, ct, sumR, sumG, sumB))
  }

  /** Unnormalized Haar multi-resolution band energies of a PCM signal —
    * the integer-exact "spectrogram" this container can gate (a DFT
    * needs irrational twiddle factors; the Haar basis needs only ±1):
    * level ℓ halves the signal via a[i] = x[2i]+x[2i+1] (approximation)
    * and d[i] = x[2i]−x[2i+1] (detail), and the band energy is Σd² —
    * the signal's texture at scale 2^ℓ. Returns (energies for levels
    * 1..maxLevels, residual approximation energy Σa² after the last
    * computed level). The transform runs over the first 2^⌊log2 n⌋
    * samples (Haar needs a dyadic length); fewer than 2 samples →
    * no bands, residual = Σx². */
  def haarBandEnergies(samples: Array[Short],
                       maxLevels: Int): (Array[Long], Long) = {
    val n0 = Integer.highestOneBit(math.max(samples.length, 1))
    var cur = Array.tabulate(math.min(n0, samples.length))(i =>
      samples(i).toLong)
    val energies = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lvl = 0
    while (lvl < maxLevels && cur.length >= 2) {
      val half = cur.length / 2
      val a = new Array[Long](half)
      var e = 0L
      var i = 0
      while (i < half) {
        a(i) = cur(2 * i) + cur(2 * i + 1)
        val dd = cur(2 * i) - cur(2 * i + 1)
        e += dd * dd
        i += 1
      }
      energies += e
      cur = a
      lvl += 1
    }
    var res = 0L
    var i = 0
    while (i < cur.length) { res += cur(i) * cur(i); i += 1 }
    (energies.toArray, res)
  }

  // ---------------------------------------------------------------- GIF

  final case class GifMeta(width: Int, height: Int, paletteSize: Int,
                           nPixels: Long, sumIdx: Long,
                           sumR: Long, sumG: Long, sumB: Long)

  /** The fixed 256-entry palette both GIF helpers share: index i maps
    * to (i, (2i) mod 256, 255−i) — channel sums are then three DIFFERENT
    * analytic functions of the index stream, so a decoder that skips the
    * palette lookup (or transposes channels) cannot match the oracle. */
  private def gifPalette: Array[Byte] = {
    val p = new Array[Byte](256 * 3)
    var i = 0
    while (i < 256) {
      p(3 * i) = i.toByte
      p(3 * i + 1) = ((2 * i) % 256).toByte
      p(3 * i + 2) = (255 - i).toByte
      i += 1
    }
    p
  }

  /** LSB-first bit packer for the GIF LZW code stream. */
  private final class LzwBitWriter {
    private val out = new java.io.ByteArrayOutputStream
    private var acc = 0
    private var nBits = 0
    def write(code: Int, width: Int): Unit = {
      acc |= code << nBits
      nBits += width
      while (nBits >= 8) {
        out.write(acc & 0xff); acc >>>= 8; nBits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nBits > 0) out.write(acc & 0xff)
      out.toByteArray
    }
  }

  /** REAL GIF87a encoder: logical screen + 256-entry global color
    * table + one image rendered through a REAL variable-width LZW
    * compressor (9→12-bit codes LSB-first, CLEAR emitted on dictionary
    * overflow at 4096, EOI terminator, 255-byte sub-block framing).
    * `f(x, y)` gives the palette index of pixel (x, y) in row-major
    * image coordinates. */
  def buildGif(width: Int, height: Int, f: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    out.write("GIF87a".getBytes("US-ASCII"))
    out.write(le16(width)); out.write(le16(height))
    out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0); out.write(0) // background index, aspect ratio
    out.write(gifPalette)
    writeGifImage(out, width, height, f)
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** REAL animated-GIF encoder — the multi-frame sibling of [[buildGif]]:
    * GIF89a logical screen + global color table + `nFrames` full-size
    * image descriptors back to back (each its own variable-width LZW
    * stream), trailer. `f(t, x, y)` gives frame t's palette index at
    * (x, y). Cross-validated against the JDK's independent ImageIO GIF
    * reader in MultimodalSpec. */
  def buildGifAnimated(width: Int, height: Int, nFrames: Int,
                       f: (Int, Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(le16(width)); out.write(le16(height))
    out.write(0xf7)
    out.write(0); out.write(0)
    out.write(gifPalette)
    var t = 0
    while (t < nFrames) {
      val tt = t
      writeGifImage(out, width, height, (x, y) => f(tt, x, y))
      t += 1
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** One image: descriptor + min-code byte + LZW sub-blocks + block
    * terminator (shared by [[buildGif]] and [[buildGifAnimated]]). */
  private def writeGifImage(out: java.io.ByteArrayOutputStream,
                            width: Int, height: Int,
                            f: (Int, Int) => Int): Unit = {
    val m = 8 // min LZW code size for a 256-color image
    val clear = 1 << m
    val eoi = clear + 1
    val bw = new LzwBitWriter
    var codeSize = m + 1
    var next = eoi + 1
    val dict = new scala.collection.mutable.HashMap[Long, Int]
    def key(prev: Int, k: Int): Long = (prev.toLong << 8) | k
    bw.write(clear, codeSize)
    var cur = -1
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val k = f(x, y) & 0xff
        if (cur < 0) cur = k
        else dict.get(key(cur, k)) match {
          case Some(c) => cur = c
          case None =>
            bw.write(cur, codeSize)
            dict(key(cur, k)) = next
            next += 1
            // compress-style late change: the entry just added carries
            // value next−1; once that value needs an extra bit, every
            // SUBSEQUENT code is written one bit wider.
            if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
            if (next == 4096) { // dictionary full: reset both sides
              bw.write(clear, codeSize)
              dict.clear()
              codeSize = m + 1
              next = eoi + 1
            }
            cur = k
        }
        x += 1
      }
      y += 1
    }
    if (cur >= 0) bw.write(cur, codeSize)
    bw.write(eoi, codeSize)
    val lzw = bw.finish()
    out.write(0x2c) // image descriptor
    out.write(le16(0)); out.write(le16(0))
    out.write(le16(width)); out.write(le16(height))
    out.write(0) // no local color table, not interlaced
    out.write(m)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n)
      off += n
    }
    out.write(0) // block terminator
  }

  /** REAL GIF decoder: verifies the 87a/89a signature, reads the
    * logical screen descriptor and global color table, skips 89a
    * extension blocks, and LZW-DECOMPRESSES the first image (variable
    * 9→12-bit codes LSB-first, CLEAR resets, the KwKwK
    * code==next special case, EOI) through the palette into exact
    * index/channel sums. None on anything malformed: bad magic, a
    * truncated table or sub-block, a code beyond the dictionary, pixel
    * count disagreeing with the image descriptor geometry, or a
    * missing trailer. */
  def parseGif(bytes: Array[Byte]): Option[GifMeta] = {
    if (bytes == null || bytes.length < 14) return None
    val magic = new String(bytes, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    var off = 6
    if (off + 7 > bytes.length) return None
    val packed = bytes(off + 4) & 0xff
    off += 7
    var palette: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 7) + 1)
      if (off + 3 * n > bytes.length) return None
      palette = java.util.Arrays.copyOfRange(bytes, off, off + 3 * n)
      off += 3 * n
    }
    // Walk blocks to the first image descriptor.
    while (off < bytes.length && (bytes(off) & 0xff) == 0x21) {
      off += 2 // extension introducer + label
      var bl = if (off < bytes.length) bytes(off) & 0xff else return None
      while (bl != 0) {
        off += 1 + bl
        if (off >= bytes.length) return None
        bl = bytes(off) & 0xff
      }
      off += 1 // terminator
    }
    decodeGifImage(bytes, off, palette) match {
      case Some((fr, off2))
          if off2 < bytes.length && (bytes(off2) & 0xff) == 0x3b =>
        Some(GifMeta(fr.width, fr.height, fr.palN, fr.nPixels, fr.sumIdx,
          fr.sumR, fr.sumG, fr.sumB))
      case _ => None
    }
  }

  /** Per-frame decode stats for multi-frame streams (palette-size field
    * omitted: it is a property of the table in use, already surfaced by
    * [[parseGif]]/[[sniffMeta]]). */
  final case class GifFrame(width: Int, height: Int, palN: Int,
                            nPixels: Long, sumIdx: Long, sumR: Long,
                            sumG: Long, sumB: Long)

  /** REAL multi-frame GIF decode — walks EVERY image descriptor
    * (skipping 89a extensions between frames), LZW-decodes each frame
    * through the active palette, and returns per-frame exact sums in
    * stream order. None on any malformed frame or a missing trailer.
    * This is the real "video" frame-extraction stage: one container,
    * n frames, each decoded independently. */
  def gifFrameSums(bytes: Array[Byte]): Option[Vector[GifFrame]] = {
    if (bytes == null || bytes.length < 14) return None
    val magic = new String(bytes, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    var off = 6
    if (off + 7 > bytes.length) return None
    val packed = bytes(off + 4) & 0xff
    off += 7
    var palette: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 7) + 1)
      if (off + 3 * n > bytes.length) return None
      palette = java.util.Arrays.copyOfRange(bytes, off, off + 3 * n)
      off += 3 * n
    }
    val frames = Vector.newBuilder[GifFrame]
    var done = false
    while (!done) {
      // Skip any extension blocks before the next image/trailer.
      while (off < bytes.length && (bytes(off) & 0xff) == 0x21) {
        off += 2
        var bl = if (off < bytes.length) bytes(off) & 0xff else return None
        while (bl != 0) {
          off += 1 + bl
          if (off >= bytes.length) return None
          bl = bytes(off) & 0xff
        }
        off += 1
      }
      if (off >= bytes.length) return None
      if ((bytes(off) & 0xff) == 0x3b) done = true
      else decodeGifImage(bytes, off, palette) match {
        case Some((fr, off2)) => frames += fr; off = off2
        case None => return None
      }
    }
    val v = frames.result()
    if (v.isEmpty) None else Some(v)
  }

  /** Decodes ONE image (descriptor at `off0`) through `globalPal` (or
    * its local color table); returns the frame stats and the offset
    * just past the image's sub-blocks. Shared by [[parseGif]] and
    * [[gifFrameSums]]. */
  private def decodeGifImage(bytes: Array[Byte], off0: Int,
                             globalPal: Array[Byte])
      : Option[(GifFrame, Int)] = {
    var off = off0
    var palette = globalPal
    if (off >= bytes.length || (bytes(off) & 0xff) != 0x2c) return None
    if (off + 10 > bytes.length) return None
    val w = readLe16(bytes, off + 5)
    val h = readLe16(bytes, off + 7)
    val idPacked = bytes(off + 9) & 0xff
    off += 10
    // Interlace (bit 0x40) only PERMUTES row order; every output here is
    // an order-invariant sum, so interlaced streams decode identically
    // (the JDK's ImageIO writer emits interlaced GIFs by default).
    if ((idPacked & 0x80) != 0) { // local color table overrides global
      val n = 1 << ((idPacked & 7) + 1)
      if (off + 3 * n > bytes.length) return None
      palette = java.util.Arrays.copyOfRange(bytes, off, off + 3 * n)
      off += 3 * n
    }
    if (palette == null || w <= 0 || h <= 0) return None
    val palN = palette.length / 3
    val minCode = bytes.lift(off).map(_ & 0xff).getOrElse(return None)
    if (minCode < 2 || minCode > 8) return None
    off += 1
    // Concatenate the image's sub-blocks.
    val lzwBuf = new java.io.ByteArrayOutputStream
    var bl = bytes.lift(off).map(_ & 0xff).getOrElse(return None)
    while (bl != 0) {
      if (off + 1 + bl > bytes.length) return None
      lzwBuf.write(bytes, off + 1, bl)
      off += 1 + bl
      bl = bytes.lift(off).map(_ & 0xff).getOrElse(return None)
    }
    off += 1
    // --- LZW decode ---
    val data = lzwBuf.toByteArray
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var codeSize = minCode + 1
    var next = eoi + 1
    var prev = -1
    var bitPos = 0
    val total = w.toLong * h
    var produced = 0L
    var (sumIdx, sumR, sumG, sumB) = (0L, 0L, 0L, 0L)
    val stack = new Array[Byte](4096)
    def emit(idx: Int): Boolean = {
      if (produced >= total || idx >= palN) return false
      produced += 1
      sumIdx += idx
      sumR += palette(3 * idx) & 0xff
      sumG += palette(3 * idx + 1) & 0xff
      sumB += palette(3 * idx + 2) & 0xff
      true
    }
    // Expands `code` onto the stack and emits it root-first; returns the
    // root (first) index, or -1 on structural failure.
    def emitString(code: Int, extra: Int): Int = {
      var sp = 0
      if (extra >= 0) { stack(sp) = extra.toByte; sp += 1 }
      var c = code
      while (c >= clear + 2) {
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
        if (sp >= stack.length) return -1
      }
      if (c >= clear) return -1 // dangling reference
      val root = c
      if (!emit(root)) return -1
      while (sp > 0) { sp -= 1; if (!emit(stack(sp) & 0xff)) return -1 }
      root
    }
    var done = false
    while (!done) {
      if (bitPos + codeSize > data.length * 8) return None
      var code = 0
      var got = 0
      while (got < codeSize) {
        val bit = (data(bitPos >> 3) >> (bitPos & 7)) & 1
        code |= bit << got
        bitPos += 1; got += 1
      }
      if (code == clear) {
        codeSize = minCode + 1; next = eoi + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev == -1) {
        if (code >= clear) return None
        if (!emit(code)) return None
        prev = code
      } else {
        var root = 0
        if (code < next) {
          root = emitString(code, -1)
          if (root < 0) return None
        } else if (code == next) { // KwKwK: prev's string + its root
          var c = prev
          while (c >= clear + 2) c = prefix(c)
          root = emitString(prev, c)
          if (root < 0) return None
        } else return None // code beyond the dictionary
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = root.toByte
          next += 1
          // decoder is one entry behind the encoder: widen as soon as
          // the NEXT slot no longer fits the current width.
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    if (produced != total) return None
    Some((GifFrame(w, h, palN, total, sumIdx, sumR, sumG, sumB), off))
  }

  // ---- Header-only metadata sniff (the "decode metadata" stage) ---------

  /** Container-level metadata: what an ingest catalog records per blob
    * before any pixel/sample decode. Image fields are None for audio and
    * vice versa; `nFrames` is populated only for containers that carry a
    * frame count in their structure (GIF image descriptors, MP4 stsz);
    * `progressive` only for JPEG (a real web crawl is full of SOF2
    * streams — the catalog must report their geometry and flag them,
    * not count them as decode failures); `durationMs`/`codec` only for
    * timed containers (MP4 mvhd/stsd). */
  final case class ContainerMeta(kind: String,
                                 width: Option[Int], height: Option[Int],
                                 channels: Option[Int],
                                 sampleRate: Option[Int],
                                 nFrames: Option[Int],
                                 progressive: Option[Boolean] = None,
                                 durationMs: Option[Int] = None,
                                 codec: Option[String] = None)

  /** REAL header-only metadata decode: dispatches on the container magic
    * and parses exactly the header structures that carry the metadata —
    * PNG IHDR (CRC-verified), GIF logical screen descriptor plus a
    * sub-block walk counting image descriptors (no LZW decode), BMP
    * BITMAPINFOHEADER, WAV RIFF chunk walk to `fmt `. Never touches
    * pixel/sample payloads, so cost is O(header) per blob regardless of
    * blob size — the shape a catalog pass over 100 TB of media needs.
    * Returns None for unrecognized magic or a structurally invalid
    * header (truncated, bad CRC, non-PCM, unsupported depth). */
  def sniffMeta(bytes: Array[Byte]): Option[ContainerMeta] = {
    if (bytes == null || bytes.length < 12) return None
    if (PngSig.indices.forall(i => bytes(i) == PngSig(i))) sniffPng(bytes)
    else if (bytes(0) == 'G'.toByte && bytes(1) == 'I'.toByte &&
      bytes(2) == 'F'.toByte && bytes(3) == '8'.toByte) sniffGif(bytes)
    else if (bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
      sniffBmp(bytes)
    else if (tag(bytes, 0, "RIFF") && tag(bytes, 8, "WAVE")) sniffWav(bytes)
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
      sniffJpeg(bytes)
    else if (tag(bytes, 4, "ftyp")) sniffMp4(bytes)
    else if (tag(bytes, 0, "fLaC")) sniffFlac(bytes)
    else None
  }

  /** FLAC STREAMINFO header-only sniff (RFC 9639 §8.2): the magic plus
    * the MANDATORY first metadata block — rate (20 bits), channels−1
    * (3), bps−1 (5), total samples (36) unpacked straight from the
    * fixed byte layout; frames are never visited, so the catalog pass
    * stays O(header) on compressed audio exactly as on WAV/MP4. */
  private def sniffFlac(bytes: Array[Byte]): Option[ContainerMeta] = {
    if (bytes.length < 4 + 4 + 34) return None
    if ((bytes(4) & 0x7f) != 0) return None // first block must be STREAMINFO
    val len = ((bytes(5) & 0xff) << 16) | ((bytes(6) & 0xff) << 8) |
      (bytes(7) & 0xff)
    if (len < 34 || 8 + len > bytes.length) return None
    def b(i: Int): Int = bytes(8 + i) & 0xff
    val rate = (b(10) << 12) | (b(11) << 4) | (b(12) >> 4)
    val ch = ((b(12) >> 1) & 0x7) + 1
    val total = ((b(13) & 0xf).toLong << 32) | (b(14).toLong << 24) |
      (b(15).toLong << 16) | (b(16).toLong << 8) | b(17).toLong
    if (rate <= 0) return None
    Some(ContainerMeta("audio", None, None, Some(ch), Some(rate), None,
      durationMs = Some((total * 1000L / rate).toInt),
      codec = Some("flac")))
  }

  /** JPEG marker walk to the first SOFn (any DCT process — frame
    * geometry is defined identically for baseline and progressive):
    * height/width/component count from the frame header, plus a
    * `progressive` flag for the SOF2/6/10/14 processes (spectral
    * selection): [[jpegRgb]] rightly rejects those at decode, but the
    * catalog pass must still report their geometry — progressive is a
    * large share of real web-crawl JPEGs. Payload entropy data is
    * never visited. */
  private def sniffJpeg(bytes: Array[Byte]): Option[ContainerMeta] = {
    var off = 2
    while (off + 4 <= bytes.length) {
      if ((bytes(off) & 0xff) != 0xff) return None
      val marker = bytes(off + 1) & 0xff
      if (marker == 0xff) off += 1 // T.81 B.1.1.2 fill byte before marker
      else if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS first
      else {
        val len = ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
        if (len < 2 || off + 2 + len > bytes.length) return None
        val isSof = (marker >= 0xc0 && marker <= 0xcf) &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (len < 8) return None
          val h = ((bytes(off + 5) & 0xff) << 8) | (bytes(off + 6) & 0xff)
          val w = ((bytes(off + 7) & 0xff) << 8) | (bytes(off + 8) & 0xff)
          val n = bytes(off + 9) & 0xff
          if (w <= 0 || h <= 0 || n < 1 || n > 4) return None
          val prog = marker == 0xc2 || marker == 0xc6 ||
            marker == 0xca || marker == 0xce
          return Some(ContainerMeta("image", Some(w), Some(h), Some(n),
            None, None, progressive = Some(prog)))
        }
        off += 2 + len
      }
    }
    None
  }

  /** Fixture helper producing a FORGED progressive stream: rewrites
    * the first SOF0 marker of a baseline stream to SOF2. [[sniffMeta]]
    * reports it progressive (headers only), while [[jpegRgb]]'s real
    * progressive decoder must REJECT it — the baseline full-band
    * Ss=0/Se=63 scan is illegal under SOF2 (since round 10 genuine
    * progressive streams decode; this helper pins the
    * malformed-rejects contract). Walks markers exactly like
    * [[sniffJpeg]], so a table byte that happens to read 0xFFC0
    * cannot be clobbered. */
  def withProgressiveSofHeader(bytes: Array[Byte]): Array[Byte] = {
    val out = bytes.clone()
    var off = 2
    while (off + 4 <= out.length) {
      if ((out(off) & 0xff) != 0xff) return out
      val marker = out(off + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return out
      if (marker == 0xc0) { out(off + 1) = 0xc2.toByte; return out }
      val len = ((out(off + 2) & 0xff) << 8) | (out(off + 3) & 0xff)
      if (len < 2) return out
      off += 2 + len
    }
    out
  }

  /** Fixture helper: inserts T.81-legal 0xFF fill bytes (B.1.1.2 —
    * any marker may be preceded by any number of 0xFF bytes) before
    * the first marker segment and, when the stream ends with EOI,
    * before the EOI. A correct decoder treats them as padding; one
    * that reads FF FF as "marker 0xFF" misparses the following bytes
    * as a segment length and rejects a legal stream. */
  def withJpegFillBytes(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null || bytes.length < 4) return bytes
    val endsWithEoi = (bytes(bytes.length - 2) & 0xff) == 0xff &&
      (bytes(bytes.length - 1) & 0xff) == 0xd9
    val out = new java.io.ByteArrayOutputStream
    out.write(bytes, 0, 2) // SOI
    out.write(0xff)        // fill before the first segment
    if (endsWithEoi) {
      out.write(bytes, 2, bytes.length - 4)
      out.write(0xff)      // fill before EOI
      out.write(bytes, bytes.length - 2, 2)
    } else out.write(bytes, 2, bytes.length - 2)
    out.toByteArray
  }

  /** PNG spec: IHDR must be the FIRST chunk after the signature. CRC is
    * verified (a flipped header byte must reject, not misreport). */
  private def sniffPng(bytes: Array[Byte]): Option[ContainerMeta] = {
    val off = PngSig.length
    if (off + 12 + 13 > bytes.length) return None
    if (readBe32(bytes, off) != 13) return None
    if (new String(bytes, off + 4, 4, "US-ASCII") != "IHDR") return None
    val crc = new java.util.zip.CRC32
    crc.update(bytes, off + 4, 4 + 13)
    if (crc.getValue.toInt != readBe32(bytes, off + 8 + 13)) return None
    val w = readBe32(bytes, off + 8)
    val h = readBe32(bytes, off + 12)
    val depth = bytes(off + 16) & 0xff
    val colorType = bytes(off + 17) & 0xff
    if (w <= 0 || h <= 0) return None
    if (depth != 1 && depth != 2 && depth != 4 && depth != 8 &&
      depth != 16) return None
    val channels = colorType match {
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette index
      case 4 => 2 // gray + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return None
    }
    Some(ContainerMeta("image", Some(w), Some(h), Some(channels),
      None, None))
  }

  /** GIF logical screen descriptor for dimensions, then a structural
    * walk over extensions/image blocks — skipping sub-blocks by their
    * length prefixes, no LZW decode — counting image descriptors as the
    * frame count. A walk that runs off the end (missing trailer) is a
    * truncated file and rejects. */
  private def sniffGif(bytes: Array[Byte]): Option[ContainerMeta] = {
    if (bytes.length < 14) return None
    val magic = new String(bytes, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    val w = readLe16(bytes, 6)
    val h = readLe16(bytes, 8)
    if (w <= 0 || h <= 0) return None
    val packed = bytes(10) & 0xff
    var off = 13
    if ((packed & 0x80) != 0) off += 3 * (1 << ((packed & 7) + 1))
    var frames = 0
    // Skips a length-prefixed sub-block chain (incl. the 0 terminator);
    // -1 on truncation.
    def skipSubBlocks(start: Int): Int = {
      var o = start
      while (o < bytes.length && (bytes(o) & 0xff) != 0) {
        o += 1 + (bytes(o) & 0xff)
      }
      if (o >= bytes.length) -1 else o + 1
    }
    var done = false
    while (!done) {
      if (off >= bytes.length) return None // missing trailer
      (bytes(off) & 0xff) match {
        case 0x3b => done = true // trailer
        case 0x21 => // extension: introducer + label + sub-blocks
          off = skipSubBlocks(off + 2)
          if (off < 0) return None
        case 0x2c => // image descriptor
          if (off + 10 > bytes.length) return None
          val idPacked = bytes(off + 9) & 0xff
          off += 10
          if ((idPacked & 0x80) != 0) off += 3 * (1 << ((idPacked & 7) + 1))
          off += 1 // LZW minimum code size
          off = skipSubBlocks(off)
          if (off < 0) return None
          frames += 1
        case _ => return None
      }
    }
    if (frames == 0) return None
    Some(ContainerMeta("image", Some(w), Some(h), Some(3), None,
      Some(frames)))
  }

  /** BMP BITMAPINFOHEADER: dimensions + bit depth; uncompressed 8/24/32
    * bpp only (channels = bpp/8). */
  private def sniffBmp(bytes: Array[Byte]): Option[ContainerMeta] = {
    if (bytes.length < 54) return None
    if (readLe32(bytes, 14) < 40) return None // info-header size
    val w = readLe32(bytes, 18)
    val h = readLe32(bytes, 22)
    val planes = readLe16(bytes, 26)
    val bpp = readLe16(bytes, 28)
    val compression = readLe32(bytes, 30)
    if (w <= 0 || h <= 0 || planes != 1 || compression != 0) return None
    if (bpp != 8 && bpp != 24 && bpp != 32) return None
    Some(ContainerMeta("image", Some(w), Some(h), Some(bpp / 8),
      None, None))
  }

  // ---- JPEG (baseline sequential DCT, ITU T.81) -------------------------

  final case class JpegMeta(width: Int, height: Int, nComp: Int,
                            sumR: Long, sumG: Long, sumB: Long)

  /** Canonical Huffman table (T.81 annex C): symbols assigned
    * consecutive codes per length, shorter lengths first. Decoding
    * walks bit-by-bit tracking the running code against each length's
    * first-code/count (the classic serial decoder — fine for this
    * codec's test-scale use). */
  private final class JpegHuff(counts: Array[Int], symbols: Array[Int]) {
    // firstCode(l), firstIndex(l) for code lengths 1..16
    private val firstCode = new Array[Int](17)
    private val firstIdx = new Array[Int](17)
    locally {
      var code = 0
      var idx = 0
      var l = 1
      while (l <= 16) {
        firstCode(l) = code
        firstIdx(l) = idx
        code += counts(l - 1)
        idx += counts(l - 1)
        code <<= 1
        l += 1
      }
    }
    /** Decodes one symbol from the bit reader; -1 on invalid code. */
    def decode(br: JpegBits): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        val b = br.bit()
        if (b < 0) return -1
        code = (code << 1) | b
        val n = counts(l - 1)
        if (n > 0 && code - firstCode(l) < n)
          return symbols(firstIdx(l) + (code - firstCode(l)))
        l += 1
      }
      -1
    }
  }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * byte-stuffing removal; restart markers are consumed by `restart()`
    * (byte-align + skip FFD0–FFD7). */
  private final class JpegBits(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= data.length) return -1
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= data.length) return -1
          val m = data(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed FF
          else return -1 // marker inside entropy data (handled via restart())
          b = 0xff
        }
        acc = b
        nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = bit()
        if (b < 0) return Int.MinValue
        v = (v << 1) | b
        i += 1
      }
      v
    }
    /** T.81 F.2.2.1 EXTEND: maps a received magnitude to its signed
      * value. */
    def extend(v: Int, n: Int): Int =
      if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v
    /** Byte-aligns and consumes an expected RSTn marker. False if the
      * next marker is not FFD0–FFD7. */
    def restart(): Boolean = {
      nBits = 0
      if (pos + 2 > data.length) return false
      if ((data(pos) & 0xff) != 0xff) return false
      val m = data(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2
      true
    }
  }

  /** T.81 zigzag order: zigzagOrder(i) = raster index of the i-th
    * zigzag coefficient. */
  private val zigzagOrder: Array[Int] = {
    val z = new Array[Int](64)
    var (x, y, i) = (0, 0, 0)
    var up = true
    while (i < 64) {
      z(i) = y * 8 + x
      i += 1
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
    }
    z
  }

  /** Separable 2-D inverse DCT (T.81 A.3.3) in double precision with a
    * StrictMath-built basis table — bit-deterministic across JVMs and
    * well inside the T.83 accuracy bound (reference decoders agree to
    * ±1 per sample). `in` is the dequantized raster-order block; output
    * is level-shifted (+128) clamped samples. */
  private val idctBasis: Array[Double] = {
    val t = new Array[Double](64) // t(u*8+x) = c(u)/2 · cos((2x+1)uπ/16)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = cu / 2.0 *
          StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }
  private def idct8x8(in: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: 1-D IDCT over u for each row y of coeffs
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += idctBasis(u * 8 + x) * in(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    val out = new Array[Int](64)
    var x = 0
    while (x < 8) { // columns
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += idctBasis(v * 8 + yy) * tmp(v * 8 + x); v += 1 }
        val px = StrictMath.round(s).toInt + 128
        out(yy * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        yy += 1
      }
      x += 1
    }
    out
  }

  /** REAL baseline-JPEG decode to packed RGB (grayscale replicated):
    * marker walk (DQT/SOF0/DHT/DRI/SOS, APPn/COM skipped), canonical
    * Huffman entropy decode with byte-stuffing and restart handling,
    * dequantization in zigzag order, exact separable IDCT, nearest-
    * neighbor chroma upsampling, integer JFIF YCbCr→RGB. Returns
    * (width, height, nComp, rgb) with rgb(y·w+x) = 0xRRGGBB; None for
    * anything that is not a well-formed 8-bit baseline sequential scan
    * (progressive SOF2, arithmetic coding, 12-bit, truncation, bad
    * codes all reject). Cross-validated both directions against the
    * JDK's independent ImageIO codec in MultimodalSpec. */
  def jpegRgb(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    val qt = new Array[Array[Int]](4) // quant tables, raster order
    val dcT = new Array[JpegHuff](4)
    val acT = new Array[JpegHuff](4)
    var width = 0
    var height = 0
    var nComp = 0
    // per component: id, h, v, tq; scan: dcSel, acSel
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var compId: Array[Int] = null
    var restartInterval = 0
    var off = 2
    var sosAt = -1
    var dcSel: Array[Int] = null
    var acSel: Array[Int] = null
    while (sosAt < 0) {
      if (off + 4 > bytes.length) return None
      if ((bytes(off) & 0xff) != 0xff) return None
      // T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes.
      while (off + 2 <= bytes.length && (bytes(off + 1) & 0xff) == 0xff)
        off += 1
      if (off + 4 > bytes.length) return None
      val marker = bytes(off + 1) & 0xff
      val len = ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      if (off + 2 + len > bytes.length || len < 2) return None
      val seg = off + 4
      val segLen = len - 2
      marker match {
        case 0xdb => // DQT
          var p = seg
          while (p < seg + segLen) {
            val pq = (bytes(p) & 0xf0) >> 4
            val tq = bytes(p) & 0x0f
            if (tq > 3) return None
            p += 1
            val t = new Array[Int](64)
            if (pq == 0) {
              if (p + 64 > seg + segLen) return None
              var i = 0
              while (i < 64) { t(zigzagOrder(i)) = bytes(p + i) & 0xff; i += 1 }
              p += 64
            } else if (pq == 1) {
              if (p + 128 > seg + segLen) return None
              var i = 0
              while (i < 64) {
                t(zigzagOrder(i)) = ((bytes(p + 2 * i) & 0xff) << 8) |
                  (bytes(p + 2 * i + 1) & 0xff)
                i += 1
              }
              p += 128
            } else return None
            qt(tq) = t
          }
        case 0xc0 => // SOF0 baseline
          if (segLen < 6) return None
          val prec = bytes(seg) & 0xff
          if (prec != 8) return None
          height = ((bytes(seg + 1) & 0xff) << 8) | (bytes(seg + 2) & 0xff)
          width = ((bytes(seg + 3) & 0xff) << 8) | (bytes(seg + 4) & 0xff)
          nComp = bytes(seg + 5) & 0xff
          if (width <= 0 || height <= 0) return None
          if (nComp != 1 && nComp != 3) return None
          if (segLen < 6 + 3 * nComp) return None
          compId = new Array[Int](nComp)
          compH = new Array[Int](nComp)
          compV = new Array[Int](nComp)
          compQ = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            compId(c) = bytes(seg + 6 + 3 * c) & 0xff
            val hv = bytes(seg + 7 + 3 * c) & 0xff
            compH(c) = (hv >> 4) & 0xf
            compV(c) = hv & 0xf
            compQ(c) = bytes(seg + 8 + 3 * c) & 0xff
            if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 ||
              compV(c) > 4 || compQ(c) > 3) return None
            c += 1
          }
        case 0xc2 => // SOF2 progressive huffman: the multi-scan decoder
          return jpegRgbProgressive(bytes)
        case m if m == 0xc1 || m == 0xc3 || m == 0xc5 ||
          m == 0xc6 || m == 0xc7 || (m >= 0xc9 && m <= 0xcb) ||
          (m >= 0xcd && m <= 0xcf) =>
          return None // non-baseline SOF (arithmetic, lossless, 12-bit …)
        case 0xc4 => // DHT
          var p = seg
          while (p < seg + segLen) {
            val tc = (bytes(p) & 0xf0) >> 4
            val th = bytes(p) & 0x0f
            if (tc > 1 || th > 3) return None
            p += 1
            if (p + 16 > seg + segLen) return None
            val counts = Array.tabulate(16)(i => bytes(p + i) & 0xff)
            p += 16
            val total = counts.sum
            if (p + total > seg + segLen) return None
            val syms = Array.tabulate(total)(i => bytes(p + i) & 0xff)
            p += total
            val h = new JpegHuff(counts, syms)
            if (tc == 0) dcT(th) = h else acT(th) = h
          }
        case 0xdd => // DRI
          if (segLen < 4) return None
          restartInterval = ((bytes(seg) & 0xff) << 8) | (bytes(seg + 1) & 0xff)
        case 0xda => // SOS
          if (compId == null) return None
          val ns = bytes(seg) & 0xff
          if (ns != nComp || segLen < 1 + 2 * ns + 3) return None
          dcSel = new Array[Int](nComp)
          acSel = new Array[Int](nComp)
          var c = 0
          while (c < ns) {
            val id = bytes(seg + 1 + 2 * c) & 0xff
            val ci = compId.indexOf(id)
            if (ci < 0) return None
            dcSel(ci) = (bytes(seg + 2 + 2 * c) & 0xf0) >> 4
            acSel(ci) = bytes(seg + 2 + 2 * c) & 0x0f
            c += 1
          }
          // baseline scan must be Ss=0, Se=63, AhAl=0
          if ((bytes(seg + 1 + 2 * ns) & 0xff) != 0 ||
            (bytes(seg + 2 + 2 * ns) & 0xff) != 63 ||
            (bytes(seg + 3 + 2 * ns) & 0xff) != 0) return None
          sosAt = off + 2 + len
        case _ => // APPn / COM / others: skip
      }
      off += 2 + len
    }
    if (width == 0 || compId == null) return None
    val hMax = compH.max
    val vMax = compV.max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // Per-component sample planes at the component's own resolution.
    val planeW = Array.tabulate(nComp)(c => mcusX * 8 * compH(c))
    val planeH = Array.tabulate(nComp)(c => mcusY * 8 * compV(c))
    val planes = Array.tabulate(nComp)(c => new Array[Int](planeW(c) * planeH(c)))
    val br = new JpegBits(bytes, sosAt)
    val dcPred = new Array[Int](nComp)
    val coeffs = new Array[Int](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return None
        java.util.Arrays.fill(dcPred, 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      var c = 0
      while (c < nComp) {
        val q = qt(compQ(c))
        val dh = dcT(dcSel(c))
        val ah = acT(acSel(c))
        if (q == null || dh == null || ah == null) return None
        var by = 0
        while (by < compV(c)) {
          var bx = 0
          while (bx < compH(c)) {
            java.util.Arrays.fill(coeffs, 0)
            val s = dh.decode(br)
            if (s < 0 || s > 15) return None
            val diffRaw = br.receive(s)
            if (diffRaw == Int.MinValue) return None
            dcPred(c) += br.extend(diffRaw, s)
            coeffs(0) = dcPred(c) * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = ah.decode(br)
              if (rs < 0) return None
              val r = (rs >> 4) & 0xf
              val sz = rs & 0xf
              if (sz == 0) {
                if (r == 15) k += 16 else eob = true
              } else {
                k += r
                if (k > 63) return None
                val vRaw = br.receive(sz)
                if (vRaw == Int.MinValue) return None
                coeffs(zigzagOrder(k)) = br.extend(vRaw, sz) * q(zigzagOrder(k))
                k += 1
              }
            }
            val px = idct8x8(coeffs)
            // place block into the component plane
            val ox = (mx * compH(c) + bx) * 8
            val oy = (my * compV(c) + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(c)((oy + yy) * planeW(c) + ox + xx) = px(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }
    // Upsample (nearest) + color-convert to packed RGB, cropped to w×h.
    val rgb = new Array[Int](width * height)
    var yy = 0
    while (yy < height) {
      var xx = 0
      while (xx < width) {
        if (nComp == 1) {
          val v = planes(0)(yy * planeW(0) + xx)
          rgb(yy * width + xx) = (v << 16) | (v << 8) | v
        } else {
          def samp(c: Int): Int = {
            val sx = xx * compH(c) / hMax
            val sy = yy * compV(c) / vMax
            planes(c)(sy * planeW(c) + sx)
          }
          val y0 = samp(0)
          val cb = samp(1) - 128
          val cr = samp(2) - 128
          // JFIF fixed-point conversion (16-bit scaled, round-half-up)
          def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
          val r = clamp(y0 + ((91881 * cr + 32768) >> 16))
          val g = clamp(y0 - ((22554 * cb + 46802 * cr + 32768) >> 16))
          val b = clamp(y0 + ((116130 * cb + 32768) >> 16))
          rgb(yy * width + xx) = (r << 16) | (g << 8) | b
        }
        xx += 1
      }
      yy += 1
    }
    Some((width, height, nComp, rgb))
  }

  /** Progressive (SOF2) huffman JPEG decoder — T.81 Annex G: the
    * multi-scan path a real web crawl's MAJORITY of images needs.
    * Coefficients accumulate across scans in zigzag order:
    *
    *  - DC first scans (Ss=0, Ah=0): baseline DC differencing, values
    *    scaled by 2^Al; interleaved over the MCU grid when ns > 1,
    *    raster over the component's own blocks when ns = 1.
    *  - DC refinement (Ah>0): one correction bit per block → bit Al.
    *  - AC first scans (Ss>0, Ah=0): single-component spectral band
    *    [Ss..Se] with EOB-run coding (G.1.2.2).
    *  - AC refinement (Ah>0): the G.1.2.3 successive-approximation
    *    algorithm — new ±2^Al coefficients interleaved with
    *    correction bits for every nonzero-history coefficient,
    *    including inside EOB runs.
    *
    * Scans decode strictly in stream order (tables may be redefined
    * between scans); after the last scan the accumulated coefficients
    * dequantize and ride the SAME IDCT/upsample/color tail as the
    * baseline path — progressive is a lossless reordering of the same
    * data, so the ImageIO cross-validation bound (±1/sample) applies
    * unchanged. Malformed scans (a full-band Ss=0/Se=63 "progressive"
    * scan, overrunning bands, truncation, bad codes) reject with
    * None. */
  private def jpegRgbProgressive(bytes: Array[Byte])
  : Option[(Int, Int, Int, Array[Int])] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[JpegHuff](4)
    val acT = new Array[JpegHuff](4)
    var width = 0
    var height = 0
    var nComp = 0
    var compId: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var restartInterval = 0
    var hMax = 0
    var vMax = 0
    var mcusX = 0
    var mcusY = 0
    var bW: Array[Int] = null // padded block grid (MCU-aligned)
    var bH: Array[Int] = null
    var nbW: Array[Int] = null // the component's own coded block counts
    var nbH: Array[Int] = null
    var coef: Array[Array[Int]] = null // per comp, blockIdx*64 + zigzag k
    var sawEoi = false
    var off = 2
    while (!sawEoi) {
      if (off + 2 > bytes.length) return None
      if ((bytes(off) & 0xff) != 0xff) return None
      // T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes.
      while (off + 2 <= bytes.length && (bytes(off + 1) & 0xff) == 0xff)
        off += 1
      if (off + 2 > bytes.length) return None
      val marker = bytes(off + 1) & 0xff
      if (marker == 0xd9) { sawEoi = true }
      else {
        if (off + 4 > bytes.length) return None
        val len = ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
        if (off + 2 + len > bytes.length || len < 2) return None
        val seg = off + 4
        val segLen = len - 2
        marker match {
          case 0xdb =>
            var p = seg
            while (p < seg + segLen) {
              val pq = (bytes(p) & 0xf0) >> 4
              val tq = bytes(p) & 0x0f
              if (tq > 3) return None
              p += 1
              val t = new Array[Int](64)
              if (pq == 0) {
                if (p + 64 > seg + segLen) return None
                var i = 0
                while (i < 64) { t(i) = bytes(p + i) & 0xff; i += 1 }
                p += 64
              } else if (pq == 1) {
                if (p + 128 > seg + segLen) return None
                var i = 0
                while (i < 64) {
                  t(i) = ((bytes(p + 2 * i) & 0xff) << 8) |
                    (bytes(p + 2 * i + 1) & 0xff)
                  i += 1
                }
                p += 128
              } else return None
              qt(tq) = t // zigzag order — coefficients are stored zigzag
            }
          case 0xc2 =>
            if (coef != null) return None // one frame only
            if (segLen < 6) return None
            if ((bytes(seg) & 0xff) != 8) return None
            height = ((bytes(seg + 1) & 0xff) << 8) | (bytes(seg + 2) & 0xff)
            width = ((bytes(seg + 3) & 0xff) << 8) | (bytes(seg + 4) & 0xff)
            nComp = bytes(seg + 5) & 0xff
            if (width <= 0 || height <= 0) return None
            if (nComp != 1 && nComp != 3) return None
            if (segLen < 6 + 3 * nComp) return None
            compId = new Array[Int](nComp)
            compH = new Array[Int](nComp)
            compV = new Array[Int](nComp)
            compQ = new Array[Int](nComp)
            var c = 0
            while (c < nComp) {
              compId(c) = bytes(seg + 6 + 3 * c) & 0xff
              val hv = bytes(seg + 7 + 3 * c) & 0xff
              compH(c) = (hv >> 4) & 0xf
              compV(c) = hv & 0xf
              compQ(c) = bytes(seg + 8 + 3 * c) & 0xff
              if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 ||
                compV(c) > 4 || compQ(c) > 3) return None
              c += 1
            }
            hMax = compH.max
            vMax = compV.max
            mcusX = (width + 8 * hMax - 1) / (8 * hMax)
            mcusY = (height + 8 * vMax - 1) / (8 * vMax)
            bW = Array.tabulate(nComp)(c0 => mcusX * compH(c0))
            bH = Array.tabulate(nComp)(c0 => mcusY * compV(c0))
            nbW = Array.tabulate(nComp) { c0 =>
              val xc = (width * compH(c0) + hMax - 1) / hMax
              (xc + 7) / 8
            }
            nbH = Array.tabulate(nComp) { c0 =>
              val yc = (height * compV(c0) + vMax - 1) / vMax
              (yc + 7) / 8
            }
            coef = Array.tabulate(nComp)(c0 =>
              new Array[Int](bW(c0) * bH(c0) * 64))
          case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 =>
            return None // a second, non-SOF2 frame header
          case m if (m >= 0xc9 && m <= 0xcb) || (m >= 0xcd && m <= 0xcf) =>
            return None
          case 0xc4 =>
            var p = seg
            while (p < seg + segLen) {
              val tc = (bytes(p) & 0xf0) >> 4
              val th = bytes(p) & 0x0f
              if (tc > 1 || th > 3) return None
              p += 1
              if (p + 16 > seg + segLen) return None
              val counts = Array.tabulate(16)(i => bytes(p + i) & 0xff)
              p += 16
              val total = counts.sum
              if (p + total > seg + segLen) return None
              val syms = Array.tabulate(total)(i => bytes(p + i) & 0xff)
              p += total
              val h = new JpegHuff(counts, syms)
              if (tc == 0) dcT(th) = h else acT(th) = h
            }
          case 0xdd =>
            if (segLen < 4) return None
            restartInterval =
              ((bytes(seg) & 0xff) << 8) | (bytes(seg + 1) & 0xff)
          case 0xda =>
            if (coef == null) return None
            val ns = bytes(seg) & 0xff
            if (ns < 1 || ns > nComp || segLen < 1 + 2 * ns + 3) return None
            val scanComp = new Array[Int](ns)
            val scanDc = new Array[Int](ns)
            val scanAc = new Array[Int](ns)
            var c = 0
            while (c < ns) {
              val id = bytes(seg + 1 + 2 * c) & 0xff
              val ci = compId.indexOf(id)
              if (ci < 0) return None
              scanComp(c) = ci
              scanDc(c) = (bytes(seg + 2 + 2 * c) & 0xf0) >> 4
              scanAc(c) = bytes(seg + 2 + 2 * c) & 0x0f
              c += 1
            }
            val ss = bytes(seg + 1 + 2 * ns) & 0xff
            val se = bytes(seg + 2 + 2 * ns) & 0xff
            val ahAl = bytes(seg + 3 + 2 * ns) & 0xff
            val ah = (ahAl >> 4) & 0xf
            val al = ahAl & 0xf
            // Progressive scan-header legality (T.81 G.1): DC scans
            // are exactly the 0..0 band; AC scans are a single
            // component over 1..63; refinement drops one bit.
            if (ss == 0 && se != 0) return None
            if (ss > 0 && (ns != 1 || se < ss || se > 63)) return None
            if (ah != 0 && ah != al + 1) return None
            val entStart = off + 2 + len
            val br = new JpegBits(bytes, entStart)
            if (!decodeProgressiveScan(br, coef, scanComp, scanDc, scanAc,
              ss, se, ah, al, dcT, acT, compH, compV, mcusX, mcusY,
              bW, nbW, nbH, restartInterval, ns)) return None
            // Resume the marker walk at the next true marker after the
            // entropy-coded data (skipping stuffed FF00, RSTn, and
            // T.81-legal 0xFF fill bytes before a marker — an FF FF
            // pair is a fill byte + marker start, never marker 0xFF).
            var p = br.pos
            var found = -1
            while (found < 0 && p + 1 < bytes.length) {
              if ((bytes(p) & 0xff) == 0xff) {
                val m2 = bytes(p + 1) & 0xff
                if (m2 == 0xff) p += 1
                else if (m2 != 0x00 && !(m2 >= 0xd0 && m2 <= 0xd7))
                  found = p
                else p += 2
              } else p += 1
            }
            if (found < 0) return None
            off = found - 2 - len // compensate the shared advance below
          case _ => ()
        }
        off += 2 + len
      }
    }
    if (coef == null) return None
    // Dequantize + IDCT every block of the padded grid into planes,
    // then the baseline upsample/color tail.
    val planeW = Array.tabulate(nComp)(c => bW(c) * 8)
    val planeH = Array.tabulate(nComp)(c => bH(c) * 8)
    val planes = Array.tabulate(nComp)(c =>
      new Array[Int](planeW(c) * planeH(c)))
    val blk = new Array[Int](64)
    var c = 0
    while (c < nComp) {
      val q = qt(compQ(c))
      if (q == null) return None
      var b = 0
      val nb = bW(c) * bH(c)
      while (b < nb) {
        java.util.Arrays.fill(blk, 0)
        var k = 0
        while (k < 64) {
          val v = coef(c)(b * 64 + k)
          if (v != 0) blk(zigzagOrder(k)) = v * q(k)
          k += 1
        }
        val px = idct8x8(blk)
        val ox = (b % bW(c)) * 8
        val oy = (b / bW(c)) * 8
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            planes(c)((oy + yy) * planeW(c) + ox + xx) = px(yy * 8 + xx)
            xx += 1
          }
          yy += 1
        }
        b += 1
      }
      c += 1
    }
    val rgb = new Array[Int](width * height)
    var yy = 0
    while (yy < height) {
      var xx = 0
      while (xx < width) {
        if (nComp == 1) {
          val v = planes(0)(yy * planeW(0) + xx)
          rgb(yy * width + xx) = (v << 16) | (v << 8) | v
        } else {
          def samp(c0: Int): Int = {
            val sx = xx * compH(c0) / hMax
            val sy = yy * compV(c0) / vMax
            planes(c0)(sy * planeW(c0) + sx)
          }
          val y0 = samp(0)
          val cb = samp(1) - 128
          val cr = samp(2) - 128
          def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
          val r = clamp(y0 + ((91881 * cr + 32768) >> 16))
          val g = clamp(y0 - ((22554 * cb + 46802 * cr + 32768) >> 16))
          val b = clamp(y0 + ((116130 * cb + 32768) >> 16))
          rgb(yy * width + xx) = (r << 16) | (g << 8) | b
        }
        xx += 1
      }
      yy += 1
    }
    Some((width, height, nComp, rgb))
  }

  /** One progressive entropy-coded scan over the shared coefficient
    * store — false on any malformed code/band/truncation. */
  private def decodeProgressiveScan(br: JpegBits, coef: Array[Array[Int]],
      scanComp: Array[Int], scanDc: Array[Int], scanAc: Array[Int],
      ss: Int, se: Int, ah: Int, al: Int,
      dcT: Array[JpegHuff], acT: Array[JpegHuff],
      compH: Array[Int], compV: Array[Int], mcusX: Int, mcusY: Int,
      bW: Array[Int], nbW: Array[Int], nbH: Array[Int],
      restartInterval: Int, ns: Int): Boolean = {
    val dcPred = new Array[Int](scanComp.length)
    var eobrun = 0
    def restartIfDue(unit: Int): Boolean = {
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        if (!br.restart()) return false
        java.util.Arrays.fill(dcPred, 0)
        eobrun = 0
      }
      true
    }
    def dcFirst(si: Int, blockIdx: Int): Boolean = {
      val h = dcT(scanDc(si))
      if (h == null) return false
      val s = h.decode(br)
      if (s < 0 || s > 15) return false
      val raw = br.receive(s)
      if (raw == Int.MinValue) return false
      dcPred(si) += br.extend(raw, s)
      coef(scanComp(si))(blockIdx * 64) = dcPred(si) << al
      true
    }
    def dcRefine(si: Int, blockIdx: Int): Boolean = {
      val b = br.bit()
      if (b < 0) return false
      if (b == 1) coef(scanComp(si))(blockIdx * 64) |= (1 << al)
      true
    }
    def acFirst(ci: Int, blockIdx: Int): Boolean = {
      val h = acT(scanAc(0))
      if (h == null) return false
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      while (k <= se) {
        val rs = h.decode(br)
        if (rs < 0) return false
        val r = (rs >> 4) & 0xf
        val s = rs & 0xf
        if (s == 0) {
          if (r == 15) k += 16
          else {
            eobrun = (1 << r) - 1
            if (r > 0) {
              val x = br.receive(r)
              if (x == Int.MinValue) return false
              eobrun += x
            }
            return true
          }
        } else {
          k += r
          if (k > se) return false
          val raw = br.receive(s)
          if (raw == Int.MinValue) return false
          coef(ci)(blockIdx * 64 + k) = br.extend(raw, s) << al
          k += 1
        }
      }
      true
    }
    // G.1.2.3: refinement of an AC band — new ±2^al coefficients
    // interleaved with correction bits on every nonzero-history
    // coefficient, EOB runs included.
    def acRefine(ci: Int, blockIdx: Int): Boolean = {
      val h = acT(scanAc(0))
      if (h == null) return false
      val p1 = 1 << al
      val m1 = -1 << al
      val base = blockIdx * 64
      var k = ss
      if (eobrun == 0) {
        var break = false
        while (k <= se && !break) {
          val rs = h.decode(br)
          if (rs < 0) return false
          var r = (rs >> 4) & 0xf
          val s = rs & 0xf
          var newVal = 0
          if (s == 0) {
            if (r != 15) {
              // NOTE: no −1 here (unlike the first-scan EOB): the
              // correction sweep below still reads this block's
              // refinement bits, and ITS eobrun -= 1 consumes the
              // block — an off-by-one here desyncs every later scan.
              eobrun = 1 << r
              if (r > 0) {
                val x = br.receive(r)
                if (x == Int.MinValue) return false
                eobrun += x
              }
              break = true // fall through to the EOB correction sweep
            }
            // r == 15: skip 16 zero-history coefficients below
          } else {
            if (s != 1) return false // refinement codes only ±1
            val b = br.bit()
            if (b < 0) return false
            newVal = if (b == 1) p1 else m1
          }
          if (!break) {
            var placed = false
            while (k <= se && !placed) {
              val cv = coef(ci)(base + k)
              if (cv != 0) {
                val b = br.bit()
                if (b < 0) return false
                if (b == 1 && (cv & p1) == 0)
                  coef(ci)(base + k) = cv + (if (cv >= 0) p1 else m1)
                k += 1
              } else {
                if (r == 0) {
                  // the run-terminating zero-history slot: write the
                  // new ±2^al value (or, for ZRL, just consume it)
                  if (newVal != 0) coef(ci)(base + k) = newVal
                  k += 1
                  placed = true
                } else { r -= 1; k += 1 }
              }
            }
            if (!placed && newVal != 0) return false // band overrun
          }
        }
      }
      if (eobrun > 0) {
        // Correction bits for the remaining nonzero coefficients.
        while (k <= se) {
          val cv = coef(ci)(base + k)
          if (cv != 0) {
            val b = br.bit()
            if (b < 0) return false
            if (b == 1 && (cv & p1) == 0)
              coef(ci)(base + k) = cv + (if (cv >= 0) p1 else m1)
          }
          k += 1
        }
        eobrun -= 1
      }
      true
    }
    if (ss == 0 && ns > 1) {
      // Interleaved DC scan over the MCU grid.
      var mcu = 0
      val total = mcusX * mcusY
      while (mcu < total) {
        if (!restartIfDue(mcu)) return false
        val my = mcu / mcusX
        val mx = mcu % mcusX
        var si = 0
        while (si < ns) {
          val ci = scanComp(si)
          var by = 0
          while (by < compV(ci)) {
            var bx = 0
            while (bx < compH(ci)) {
              val blockIdx = (my * compV(ci) + by) * bW(ci) +
                (mx * compH(ci) + bx)
              val ok = if (ah == 0) dcFirst(si, blockIdx)
                else dcRefine(si, blockIdx)
              if (!ok) return false
              bx += 1
            }
            by += 1
          }
          si += 1
        }
        mcu += 1
      }
    } else {
      // Non-interleaved: raster over the single component's own blocks.
      val ci = scanComp(0)
      val w = nbW(ci)
      val hgt = nbH(ci)
      var b = 0
      val total = w * hgt
      while (b < total) {
        if (!restartIfDue(b)) return false
        val blockIdx = (b / w) * bW(ci) + (b % w)
        val ok =
          if (ss == 0) {
            if (ah == 0) dcFirst(0, blockIdx) else dcRefine(0, blockIdx)
          } else {
            if (ah == 0) acFirst(ci, blockIdx) else acRefine(ci, blockIdx)
          }
        if (!ok) return false
        b += 1
      }
    }
    true
  }

  /** Grayscale JPEG synthesis via the JDK's own ImageIO encoder (part
    * of every JRE — no external library): the blob generator for
    * [[jpegRgb]]'s gate and specs, deliberately an INDEPENDENT codec so
    * the decoder under test shares nothing with the encoder (the GIF
    * cross-validation pattern). */
  def buildJpegGray(width: Int, height: Int, f: (Int, Int) => Int,
                    quality: Float = 0.8f,
                    progressive: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0, f(x, y) & 0xff)
        x += 1
      }
      y += 1
    }
    encodeJpeg(img, quality, progressive)
  }

  /** Color JPEG synthesis (TYPE_INT_RGB → ImageIO's 4:2:0 YCbCr
    * encode): the blob generator that exercises the interleaved-DC +
    * per-component-AC progressive paths and chroma subsampling. */
  def buildJpegColor(width: Int, height: Int,
                     f: (Int, Int) => (Int, Int, Int),
                     quality: Float = 0.8f,
                     progressive: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = f(x, y)
        img.setRGB(x, y,
          ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    encodeJpeg(img, quality, progressive)
  }

  private def encodeJpeg(img: java.awt.image.BufferedImage,
                         quality: Float,
                         progressive: Boolean): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    // MODE_DEFAULT = the encoder's own multi-scan progressive script
    // (spectral selection + successive approximation) — the
    // independent-codec source of real SOF2 streams for the gate.
    p.setProgressiveMode(
      if (progressive) javax.imageio.ImageWriteParam.MODE_DEFAULT
      else javax.imageio.ImageWriteParam.MODE_DISABLED)
    val bos = new java.io.ByteArrayOutputStream
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close()
    w.dispose()
    bos.toByteArray
  }

  /** Max per-sample deviation of [[jpegRgb]]'s decode against the JDK
    * ImageIO decoder's on the same bytes (raw raster samples for
    * grayscale — getRGB would gamma-convert gray to sRGB and fake a
    * mismatch). None if either decoder rejects or geometry disagrees.
    * The T.83 accuracy bound puts conforming decoders within ±1 per
    * sample on luma; the gate pins that. */
  def jpegMaxDevVsImageIO(bytes: Array[Byte]): Option[Int] = {
    val ours = jpegRgb(bytes)
    val ref =
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }
    (ours, ref) match {
      case (Some((w, h, _, rgb)), Some(img))
        if img.getWidth == w && img.getHeight == h =>
        val gray = img.getColorModel.getNumComponents == 1
        var maxD = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val a = rgb(y * w + x)
            if (gray) {
              val d = math.abs((a & 0xff) - img.getRaster.getSample(x, y, 0))
              if (d > maxD) maxD = d
            } else {
              val b = img.getRGB(x, y)
              var sh = 0
              while (sh <= 16) {
                val d = math.abs(((a >> sh) & 0xff) - ((b >> sh) & 0xff))
                if (d > maxD) maxD = d
                sh += 8
              }
            }
            x += 1
          }
          y += 1
        }
        Some(maxD)
      case _ => None
    }
  }

  /** [[jpegRgb]] folded to per-channel sums (the decode-verification
    * shape the BMP/PNG/GIF gates use). */
  def parseJpeg(bytes: Array[Byte]): Option[JpegMeta] =
    jpegRgb(bytes).map { case (w, h, n, rgb) =>
      var (sr, sg, sb) = (0L, 0L, 0L)
      var i = 0
      while (i < rgb.length) {
        sr += (rgb(i) >> 16) & 0xff
        sg += (rgb(i) >> 8) & 0xff
        sb += rgb(i) & 0xff
        i += 1
      }
      JpegMeta(w, h, n, sr, sg, sb)
    }

  /** WAV RIFF chunk walk to `fmt `: PCM only; channels + sample rate
    * from the format fields. Stops at the fmt chunk — the data payload
    * is never visited. */
  private def sniffWav(bytes: Array[Byte]): Option[ContainerMeta] = {
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val len = readLe32(bytes, off + 4)
      if (len < 0 || off + 8 + len > bytes.length) return None
      if (id == "fmt ") {
        if (len < 16) return None
        if (readLe16(bytes, off + 8) != 1) return None // PCM only
        val channels = readLe16(bytes, off + 10)
        val rate = readLe32(bytes, off + 12)
        if (channels < 1 || rate <= 0) return None
        return Some(ContainerMeta("audio", None, None, Some(channels),
          Some(rate), None))
      }
      off += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    None
  }

  // ---- ISO-BMFF (MP4) box walk — metadata only, no codec ----------------

  /** Finds the first `boxType` box inside [start, end): returns its
    * (payloadStart, payloadEnd). Handles size==1 (64-bit largesize).
    * size==0 ("box extends to end of file") is legal ONLY for the
    * final top-level box per ISO/IEC 14496-12 §4.2 — a nested
    * zero-size box would silently swallow its following siblings, so
    * it aborts the walk instead. Any malformed size (negative,
    * overflowing, past `end`) also aborts. */
  private def findBox(bytes: Array[Byte], start: Int, end: Int,
                      boxType: String,
                      topLevel: Boolean = false): Option[(Int, Int)] = {
    var off = start
    while (off + 8 <= end) {
      val size32 = readBe32(bytes, off)
      val t = new String(bytes, off + 4, 4, "US-ASCII")
      var payload = off + 8
      val boxEnd: Long =
        if (size32 == 1) {
          if (off + 16 > end) return None
          payload = off + 16
          (readBe32(bytes, off + 8).toLong << 32) |
            (readBe32(bytes, off + 12).toLong & 0xffffffffL)
        } else if (size32 == 0) {
          if (!topLevel) return None // legal only for the last top-level box
          end.toLong // box extends to container end
        }
        else off.toLong + (size32.toLong & 0xffffffffL)
      if (size32 == 1) {
        // largesize counts from the box start
        val bs = boxEnd + off
        if (bs < payload || bs > end) return None
        if (t == boxType) return Some((payload, bs.toInt))
        off = bs.toInt
      } else {
        if (boxEnd < payload || boxEnd > end) return None
        if (t == boxType) return Some((payload, boxEnd.toInt))
        off = boxEnd.toInt
      }
    }
    None
  }

  /** ISO-BMFF metadata sniff (the pattern that decided JPEG: the box
    * LAYOUT is public byte structure — ftyp/moov/mvhd/trak/tkhd/mdia/
    * minf/stbl/stsd/stsz — while the codec payload inside mdat needs a
    * video decoder this environment rightly does not ship). Reports
    * what a media catalog records per clip: presentation duration
    * (mvhd duration/timescale → ms, floored), track geometry (tkhd
    * 16.16 fixed-point width/height), frame count (stsz sample_count),
    * and the sample-entry codec fourcc (stsd). O(header) — mdat is
    * skipped by its size field, payload bytes never visited. */
  private def sniffMp4(bytes: Array[Byte]): Option[ContainerMeta] =
    // Try: a malformed header must yield None (the sniffer contract),
    // never an exception out of a whole ingest task.
    scala.util.Try(sniffMp4Walk(bytes)).toOption.flatten

  private def sniffMp4Walk(bytes: Array[Byte]): Option[ContainerMeta] = {
    val n = bytes.length
    for {
      (mvS, mvE) <- findBox(bytes, 0, n, "moov", topLevel = true)
      (mhS, mhE) <- findBox(bytes, mvS, mvE, "mvhd")
      (tkS, tkE) <- findBox(bytes, mvS, mvE, "trak")
      (thS, thE) <- findBox(bytes, tkS, tkE, "tkhd")
      (mdS, mdE) <- findBox(bytes, tkS, tkE, "mdia")
      (mnS, mnE) <- findBox(bytes, mdS, mdE, "minf")
      (sbS, sbE) <- findBox(bytes, mnS, mnE, "stbl")
      (sdS, sdE) <- findBox(bytes, sbS, sbE, "stsd")
      (szS, szE) <- findBox(bytes, sbS, sbE, "stsz")
      meta <- {
        // mvhd: version(1) flags(3), then v0 c4 m4 ts4 dur4 / v1 c8 m8 ts4 dur8
        val v = if (mhS < mhE) bytes(mhS) & 0xff else -1
        val (ts, dur) =
          // v1: c8 m8 ts4 dur8 after the 4-byte fullbox header — the
          // dur read at mhS+24 spans 8 bytes, so needs mhS+32 <= mhE.
          if (v == 1 && mhS + 32 <= mhE)
            (readBe32(bytes, mhS + 20),
              (readBe32(bytes, mhS + 24).toLong << 32) |
                (readBe32(bytes, mhS + 28).toLong & 0xffffffffL))
          else if (v == 0 && mhS + 20 <= mhE)
            (readBe32(bytes, mhS + 12),
              readBe32(bytes, mhS + 16).toLong & 0xffffffffL)
          else (0, -1L)
        // tkhd: width/height are the LAST 8 payload bytes (16.16 fixed)
        val tv = bytes(thS) & 0xff
        val geomOk = thE - thS >= (if (tv == 1) 4 + 32 + 60 else 4 + 20 + 60)
        val w = if (geomOk) readBe32(bytes, thE - 8) >>> 16 else 0
        val h = if (geomOk) readBe32(bytes, thE - 4) >>> 16 else 0
        // stsd: fullbox(4) entry_count(4) entry[size(4) format(4) ...]
        val codec =
          if (sdE - sdS >= 16 && readBe32(bytes, sdS + 4) >= 1)
            Some(new String(bytes, sdS + 12, 4, "US-ASCII"))
          else None
        // stsz: fullbox(4) sample_size(4) sample_count(4)
        val frames = if (szE - szS >= 12) readBe32(bytes, szS + 8) else -1
        if (ts <= 0 || dur < 0 || w <= 0 || h <= 0 || frames < 0 ||
            codec.isEmpty) None
        else {
          val ms = dur * 1000L / ts
          if (ms > Int.MaxValue) None
          else Some(ContainerMeta("video", Some(w), Some(h), None, None,
            Some(frames), durationMs = Some(ms.toInt), codec = codec))
        }
      }
    } yield meta
  }

  private def mp4Box(boxType: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8 + body.length) ++ boxType.getBytes("US-ASCII") ++ body
  }

  /** Minimal-but-structurally-faithful ISO-BMFF writer for the
    * [[sniffMp4]] gate: ftyp + moov(mvhd v0, trak(tkhd v0 with 16.16
    * geometry, mdia(minf(stbl(stsd with one `codec` sample entry,
    * stsz with `nFrames` entries))))) + an mdat the sniff must SKIP by
    * its size field. Same synthesis-then-decode discipline as
    * buildWav/buildPng: header fields derive from per-doc formulas and
    * the oracle recomputes them analytically. */
  def buildMp4(width: Int, height: Int, timescale: Int, duration: Int,
               nFrames: Int, codec: String): Array[Byte] = {
    require(codec.length == 4, s"fourcc must be 4 chars: $codec")
    val ftyp = mp4Box("ftyp", "isom".getBytes("US-ASCII"), be32(0),
      "isom".getBytes("US-ASCII"))
    val mvhd = mp4Box("mvhd", be32(0), // version 0 + flags
      be32(0), be32(0), be32(timescale), be32(duration),
      be32(0x00010000), Array[Byte](0, 0), Array.fill[Byte](10)(0),
      Array.fill[Byte](36)(0), Array.fill[Byte](24)(0), be32(2))
    val tkhd = mp4Box("tkhd", be32(7), // version 0 + enabled flags
      be32(0), be32(0), be32(1), be32(0), be32(duration),
      Array.fill[Byte](8)(0), Array[Byte](0, 0), Array[Byte](0, 0),
      Array[Byte](0, 0), Array[Byte](0, 0), Array.fill[Byte](36)(0),
      be32(width << 16), be32(height << 16))
    val entry = mp4Box(codec, Array.fill[Byte](8)(0))
    val stsd = mp4Box("stsd", be32(0), be32(1), entry)
    val stsz = mp4Box("stsz", be32(0), be32(0), be32(nFrames),
      Array.tabulate(nFrames * 4)(i => ((i * 7 + 1) & 0x7f).toByte))
    val stbl = mp4Box("stbl", stsd, stsz)
    val minf = mp4Box("minf", stbl)
    val mdia = mp4Box("mdia", minf)
    val trak = mp4Box("trak", tkhd, mdia)
    val moov = mp4Box("moov", mvhd, trak)
    val mdat = mp4Box("mdat",
      Array.tabulate(32)(i => ((i * 13 + 5) & 0xff).toByte))
    ftyp ++ mdat ++ moov // mdat BEFORE moov: the walk must skip it
  }
}
