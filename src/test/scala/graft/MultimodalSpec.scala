package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaCodecs, MultimodalOps}

class MultimodalSpec extends SparkSpec {

  private def media = {
    import spark.implicits._
    Seq(
      (1L, "x" * 100),   // 100-byte blob
      (2L, "y" * 1000),  // 1000-byte blob
      (3L, "")           // empty blob
    ).toDF("media_id", "payload")
      .withColumn("bytes", col("payload").cast("binary"))
  }

  test("sniffMeta: real headers across all four containers; payload-" +
    "independent fields") {
    val bmp = MediaCodecs.buildBmp(7, 5, 10, 20, 30)
    val png = MediaCodecs.buildPng(6, 4, (x, y) => (x, y, 0))
    val gif = MediaCodecs.buildGif(5, 3, (x, y) => (x + y) % 256)
    val wav = MediaCodecs.buildWav(12000, 2, Array[Short](1, -1, 2, -2))
    assert(MediaCodecs.sniffMeta(bmp) ===
      Some(MediaCodecs.ContainerMeta("image", Some(7), Some(5), Some(3),
        None, None)))
    assert(MediaCodecs.sniffMeta(png) ===
      Some(MediaCodecs.ContainerMeta("image", Some(6), Some(4), Some(3),
        None, None)))
    assert(MediaCodecs.sniffMeta(gif) ===
      Some(MediaCodecs.ContainerMeta("image", Some(5), Some(3), Some(3),
        None, Some(1))))
    assert(MediaCodecs.sniffMeta(wav) ===
      Some(MediaCodecs.ContainerMeta("audio", None, None, Some(2),
        Some(12000), None)))
    val jpg = MediaCodecs.buildJpegGray(19, 7, (x, y) => x * y)
    assert(MediaCodecs.sniffMeta(jpg) ===
      Some(MediaCodecs.ContainerMeta("image", Some(19), Some(7), Some(1),
        None, None, progressive = Some(false))))
  }

  test("sniffMeta: progressive JPEG reports geometry + flag; a LYING " +
    "SOF2 header over baseline entropy data rejects as malformed") {
    val base = MediaCodecs.buildJpegGray(19, 7, (x, y) => x * y)
    val lie = MediaCodecs.withProgressiveSofHeader(base)
    assert(!java.util.Arrays.equals(base, lie)) // SOF0 -> SOF2 applied
    assert(MediaCodecs.sniffMeta(lie) ===
      Some(MediaCodecs.ContainerMeta("image", Some(19), Some(7), Some(1),
        None, None, progressive = Some(true))))
    // the full-band Ss=0/Se=63 scan is illegal under SOF2 — the
    // progressive decoder must reject the forged stream, not misread it
    assert(MediaCodecs.jpegRgb(lie).isEmpty)
    assert(MediaCodecs.jpegRgb(base).nonEmpty)
    // REAL progressive bytes sniff the same flag
    val prog = MediaCodecs.buildJpegGray(19, 7, (x, y) => x * y,
      progressive = true)
    assert(MediaCodecs.sniffMeta(prog) ===
      Some(MediaCodecs.ContainerMeta("image", Some(19), Some(7), Some(1),
        None, None, progressive = Some(true))))
  }

  test("progressive JPEG decode (T.81 Annex G): grayscale multi-scan " +
    "streams decode within the ±1 ImageIO bound across geometries; " +
    "color progressive is pixel-identical to the baseline path; " +
    "truncation rejects") {
    // The JDK encoder's standard 6-scan script exercises DC first +
    // refinement, spectral bands, and TWO successive-approximation AC
    // refinement passes (Ah=2→1→0) — multi-block-row geometries pin
    // the cross-block EOB-run correction sweep.
    for ((w, h) <- Seq((8, 8), (19, 7), (24, 17), (9, 21), (64, 48))) {
      val prog = MediaCodecs.buildJpegGray(w, h,
        (x, y) => (x * 5 + y * 9) % 256, progressive = true)
      val m = MediaCodecs.jpegRgb(prog)
      assert(m.nonEmpty && m.get._1 === w && m.get._2 === h &&
        m.get._3 === 1, s"${w}x$h geometry")
      val dev = MediaCodecs.jpegMaxDevVsImageIO(prog)
      assert(dev.exists(_ <= 1), s"${w}x$h dev=$dev")
    }
    // Color (4:2:0 subsampled): interleaved DC scans + per-component
    // AC bands. The chroma upsample gap vs ImageIO's triangle filter
    // is a property of OUR upsampler, not of the progressive path —
    // pin that progressive and baseline decode the same content to
    // the same deviation (value-consistency of the two paths).
    for ((w, h) <- Seq((16, 16), (21, 13), (40, 30))) {
      def px(x: Int, y: Int) = ((x * 7) % 256, (y * 11) % 256, (x + y) % 256)
      val base = MediaCodecs.buildJpegColor(w, h, px)
      val prog = MediaCodecs.buildJpegColor(w, h, px, progressive = true)
      val mB = MediaCodecs.jpegRgb(base)
      val mP = MediaCodecs.jpegRgb(prog)
      assert(mB.nonEmpty && mP.nonEmpty)
      assert(mP.get._1 === w && mP.get._2 === h && mP.get._3 === 3)
      assert(MediaCodecs.jpegMaxDevVsImageIO(prog) ===
        MediaCodecs.jpegMaxDevVsImageIO(base), s"${w}x$h path parity")
    }
    // Truncated mid-scan: reject, never throw.
    val prog = MediaCodecs.buildJpegGray(24, 17, (x, y) => (x * 3 + y) % 256,
      progressive = true)
    assert(MediaCodecs.jpegRgb(prog.dropRight(20)).isEmpty)
    assert(MediaCodecs.jpegRgb(prog.take(30)).isEmpty)
  }

  test("sniffMeta: MP4 box walk — hand-built fixture fields exact, mdat " +
    "skipped by size, malformed boxes reject") {
    val mp4 = MediaCodecs.buildMp4(width = 640, height = 360,
      timescale = 600, duration = 1234, nFrames = 25, codec = "avc1")
    assert(MediaCodecs.sniffMeta(mp4) ===
      Some(MediaCodecs.ContainerMeta("video", Some(640), Some(360), None,
        None, Some(25), durationMs = Some(1234 * 1000 / 600),
        codec = Some("avc1"))))
    // floor, not round: 1234*1000/600 = 2056.66… -> 2056
    assert(MediaCodecs.sniffMeta(mp4).get.durationMs === Some(2056))
    // Truncated before moov completes: reject.
    assert(MediaCodecs.sniffMeta(mp4.dropRight(40)).isEmpty)
    // A lying box size (moov size points past the file): reject.
    val idx = {
      var i = -1
      var o = 0
      while (i < 0 && o + 8 <= mp4.length) {
        if (new String(mp4, o + 4, 4, "US-ASCII") == "moov") i = o
        else o += ((mp4(o) & 0xff) << 24 | (mp4(o + 1) & 0xff) << 16 |
          (mp4(o + 2) & 0xff) << 8 | (mp4(o + 3) & 0xff))
      }
      i
    }
    assert(idx > 0)
    val bad = mp4.clone(); bad(idx) = 0x7f.toByte // giant moov size
    assert(MediaCodecs.sniffMeta(bad).isEmpty)
    // Zero timescale: reject rather than divide.
    val mp40 = MediaCodecs.buildMp4(8, 8, timescale = 600, duration = 0,
      nFrames = 1, codec = "mp4v")
    assert(MediaCodecs.sniffMeta(mp40).get.durationMs === Some(0))
  }

  test("sniffMeta: MP4 hardening — truncated v1 mvhd yields None (not " +
    "a throw / neighbor-byte read); nested zero-size boxes reject; " +
    "top-level zero-size final box still sniffs") {
    def be32(v: Int): Array[Byte] = Array(((v >>> 24) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      (v & 0xff).toByte)
    def box(t: String, body: Array[Byte]*): Array[Byte] = {
      val b = body.flatten.toArray
      be32(8 + b.length) ++ t.getBytes("US-ASCII") ++ b
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0),
      "isom".getBytes("US-ASCII"))
    // A v1 mvhd whose payload stops 4 bytes short of the 8-byte
    // duration: fullbox(4) + created(8) + modified(8) + timescale(4)
    // + only the HIGH half of duration = 28 bytes. The old guard
    // (mhS+28 <= mhE) accepted it and read 4 bytes past the payload —
    // an AIOOBE when the box ends the buffer.
    val mvhdShortV1 = box("mvhd", Array[Byte](1, 0, 0, 0),
      Array.fill[Byte](16)(0), be32(600), be32(0))
    val full = MediaCodecs.buildMp4(8, 8, 600, 100, 1, "avc1")
    def boxOffset(bs: Array[Byte], t: String, from: Int, to: Int): Int = {
      var o = from
      while (o + 8 <= to) {
        if (new String(bs, o + 4, 4, "US-ASCII") == t) return o
        o += ((bs(o) & 0xff) << 24 | (bs(o + 1) & 0xff) << 16 |
          (bs(o + 2) & 0xff) << 8 | (bs(o + 3) & 0xff))
      }
      -1
    }
    val moovOff = boxOffset(full, "moov", 0, full.length)
    val trak = {
      val tOff = boxOffset(full, "trak", moovOff + 8, full.length)
      val tLen = (full(tOff) & 0xff) << 24 | (full(tOff + 1) & 0xff) << 16 |
        (full(tOff + 2) & 0xff) << 8 | (full(tOff + 3) & 0xff)
      full.slice(tOff, tOff + tLen)
    }
    // mvhd LAST in the file so an over-read is past the array end.
    val truncated = ftyp ++ box("moov", trak, mvhdShortV1)
    assert(MediaCodecs.sniffMeta(truncated).isEmpty) // no throw
    // Nested zero-size tkhd: must reject, not swallow its siblings.
    val tkhdOff = boxOffset(full,
      "tkhd", boxOffset(full, "trak", moovOff + 8, full.length) + 8,
      full.length)
    val zeroNested = full.clone()
    (0 until 4).foreach(i => zeroNested(tkhdOff + i) = 0)
    assert(MediaCodecs.sniffMeta(zeroNested).isEmpty)
    // Zero-size FINAL TOP-LEVEL box (the one legal case): moov is last
    // in buildMp4's layout, so zeroing its size must still sniff.
    val zeroTop = full.clone()
    (0 until 4).foreach(i => zeroTop(moovOff + i) = 0)
    assert(MediaCodecs.sniffMeta(zeroTop) === MediaCodecs.sniffMeta(full))
    assert(MediaCodecs.sniffMeta(zeroTop).nonEmpty)
  }

  test("sniffMeta: malformed headers REJECT — wrong magic, truncation, " +
    "flipped IHDR byte (CRC), non-PCM WAV, unsupported BMP depth") {
    assert(MediaCodecs.sniffMeta(null).isEmpty)
    assert(MediaCodecs.sniffMeta("not a container".getBytes).isEmpty)
    val png = MediaCodecs.buildPng(6, 4, (x, y) => (x, y, 0))
    // Truncated mid-IHDR.
    assert(MediaCodecs.sniffMeta(png.take(20)).isEmpty)
    // Flip a width byte inside IHDR: CRC must catch it — a sniffer
    // that skips CRC would happily misreport the width.
    val bad = png.clone(); bad(19) = (bad(19) ^ 0x01).toByte
    assert(MediaCodecs.sniffMeta(bad).isEmpty)
    // GIF missing its trailer is a truncated file.
    val gif = MediaCodecs.buildGif(5, 3, (x, y) => x % 256)
    assert(MediaCodecs.sniffMeta(gif.dropRight(1)).isEmpty)
    // WAV with a non-PCM format code.
    val wav = MediaCodecs.buildWav(8000, 1, Array[Short](0, 1))
    val comp = wav.clone(); comp(20) = 2 // fmt audioFormat = ADPCM
    assert(MediaCodecs.sniffMeta(comp).isEmpty)
    // BMP with 16 bpp (unsupported depth).
    val bmp = MediaCodecs.buildBmp(4, 3, 1, 2, 3)
    val b16 = bmp.clone(); b16(28) = 16
    assert(MediaCodecs.sniffMeta(b16).isEmpty)
  }

  test("JPEG decoder: cross-validated against the JDK's independent " +
    "ImageIO codec — gray within ±1, solid color exact, smooth color " +
    "within chroma-upsampling tolerance") {
    // Grayscale sawtooth (high-frequency content) across geometries
    // incl. non-multiples of 8 (partial edge MCUs) and qualities
    // (different quant tables): conforming decoders agree within ±1
    // per sample (T.83 accuracy class).
    for ((w, h) <- Seq((16, 16), (20, 13), (8, 8), (33, 9));
         q <- Seq(0.9f, 0.7f, 0.5f)) {
      val bytes = MediaCodecs.buildJpegGray(w, h,
        (x, y) => (x * 7 + y * 11) % 256, q)
      val dev = MediaCodecs.jpegMaxDevVsImageIO(bytes)
      assert(dev.isDefined && dev.get <= 1, s"gray ${w}x$h q=$q dev=$dev")
      val meta = MediaCodecs.parseJpeg(bytes).get
      assert((meta.width, meta.height, meta.nComp) === ((w, h, 1)))
    }
    // Solid-color RGB (4:2:0 chroma at lower quality is upsampling-
    // invariant): decoders agree exactly.
    for (q <- Seq(0.9f, 0.5f)) {
      val img = new java.awt.image.BufferedImage(24, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 24)
        img.setRGB(x, y, (180 << 16) | (90 << 8) | 40)
      val wtr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val p = wtr.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(q)
      val bos = new java.io.ByteArrayOutputStream
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      wtr.setOutput(ios)
      wtr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); wtr.dispose()
      val dev = MediaCodecs.jpegMaxDevVsImageIO(bos.toByteArray)
      assert(dev.contains(0), s"solid q=$q dev=$dev")
      assert(MediaCodecs.parseJpeg(bos.toByteArray).get.nComp === 3)
    }
  }

  test("JPEG decoder: malformed inputs reject — truncation, wrong " +
    "magic; progressive SOF2 now DECODES (round 10)") {
    // What used to be the rejection case is the round-10 feature: a
    // real SOF2 multi-scan stream decodes within the ImageIO bound.
    val prog = MediaCodecs.buildJpegGray(16, 16, (x, y) => x + y,
      progressive = true)
    assert(MediaCodecs.jpegRgb(prog).nonEmpty)
    assert(MediaCodecs.jpegMaxDevVsImageIO(prog).exists(_ <= 1))
    val ok = MediaCodecs.buildJpegGray(16, 16, (x, y) => x + y)
    assert(MediaCodecs.jpegRgb(ok.take(ok.length / 2)).isEmpty)
    assert(MediaCodecs.jpegRgb("not a jpeg".getBytes).isEmpty)
    assert(MediaCodecs.jpegRgb(null).isEmpty)
  }

  test("decodeMeta drops undecodable blobs, keeps real ones") {
    import spark.implicits._
    val rows = Seq(
      (1L, MediaCodecs.buildBmp(7, 5, 10, 20, 30)),
      (2L, "garbage bytes here".getBytes),
      (3L, MediaCodecs.buildWav(8000, 1, Array[Short](5, -5))))
      .toDF("media_id", "bytes")
    val out = MultimodalOps.decodeMeta(rows, "media_id", "bytes")
      .collect().map(m => m.docId -> m.kind).toMap
    assert(out === Map(1L -> "image", 3L -> "audio"))
  }

  test("extractFeatures: real pixel features — batch-size invariant, " +
    "one flipped pixel moves its block's feature") {
    import spark.implicits._
    val w = 4; val h = 3 // 12 pixels -> 8 blocks of 1-2 pixels
    val base = MediaCodecs.buildBmpGradient(w, h,
      (x, y) => { val v = (x * 7 + y * 13) % 256; (v, v, v) })
    // Flip pixel (0, 0)'s R channel to 255: bmpGrayR index 0 -> block 0.
    val flipped = MediaCodecs.buildBmpGradient(w, h,
      (x, y) => {
        val v = if (x == 0 && y == 0) 255 else (x * 7 + y * 13) % 256
        (v, v, v)
      })
    val df = Seq((1L, base), (2L, flipped), (3L, "junk".getBytes))
      .toDF("media_id", "bytes")
    val a = MultimodalOps.extractFeatures(df, "media_id", "bytes",
        dim = 8, batchSize = 2)
      .collect().map(f => f.mediaId -> f).toMap
    val b = MultimodalOps.extractFeatures(df, "media_id", "bytes",
        dim = 8, batchSize = 64)
      .collect().map(f => f.mediaId -> f).toMap
    assert(a.keySet === Set(1L, 2L)) // junk dropped
    for (id <- a.keySet) {
      assert(a(id).feature.toSeq === b(id).feature.toSeq)
      assert(a(id).feature.length === 8)
    }
    // Pixels drive the features: the flipped pixel lives in block 0 and
    // only blocks containing it may move.
    assert(a(1L).feature(0) !== a(2L).feature(0))
    // Analytic check of block 0 (pixels 0..1 of 12 -> indices 0 and 1):
    // base values 0 and 7 -> mean 3; flipped 255 and 7 -> mean 131.
    assert(a(1L).feature(0) === 3L)
    assert(a(2L).feature(0) === 131L)
  }

  test("frame sampling explodes every k-th fixed-size frame") {
    val frames = MultimodalOps.frameSampleStub(
        media.filter(col("media_id") === 2L), "media_id", "bytes",
        frameBytes = 100, everyK = 3)
      .select(col("frame_idx"), length(col("frame_bytes")).as("len"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    // 1000 bytes / 100 = 10 frames; every 3rd -> frames 0,3,6,9
    assert(frames.map(_._1).toSeq === Seq(0, 3, 6, 9))
    assert(frames.forall(_._2 == 100))
  }

  test("pointer layout externalizes blobs to (uri, offset, length)") {
    val out = MultimodalOps.withPointerLayout(media, "media_id", "bytes", "store://media")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(out === Set((1L, "store://media/1", 100L), (2L, "store://media/2", 1000L),
      (3L, "store://media/3", 0L)))
  }

  test("WAV codec: build/parse round-trip, byte-fixture fields, chunk walk, malformed rejects") {
    import graft.multimodal.MediaCodecs
    val samples = Array[Short](100, -100, 32767, -32768, 0, 7)
    val wav = MediaCodecs.buildWav(12000, 2, samples)
    val m = MediaCodecs.parseWav(wav).get
    assert(m.sampleRate === 12000 && m.channels === 2 &&
      m.bitsPerSample === 16 && m.nSamples === 6L)
    assert(m.sumSquares === samples.map(s => s.toLong * s).sum)
    // Byte-level fixture checks (not builder-vs-parser self-agreement):
    // canonical header offsets hold LE fields.
    assert(wav.length === 44 + 12)
    assert((wav(24) & 0xff) === (12000 & 0xff))           // rate LE byte 0
    assert((wav(25) & 0xff) === ((12000 >> 8) & 0xff))    // rate LE byte 1
    assert(wav(22) === 2.toByte)                          // channels
    // A real-world WAV may carry extra chunks before data: splice a LIST
    // chunk between fmt and data; the chunk walk must skip it.
    val pre = wav.take(36)                 // RIFF..fmt chunk end
    val post = wav.drop(36)                // data chunk
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = pre ++ list ++ post
    // RIFF size field must cover the inserted chunk.
    val newSize = spliced.length - 8
    spliced(4) = (newSize & 0xff).toByte
    spliced(5) = ((newSize >> 8) & 0xff).toByte
    assert(MediaCodecs.parseWav(spliced).get === m)
    // Malformed inputs reject instead of mis-parsing.
    assert(MediaCodecs.parseWav(null).isEmpty)
    assert(MediaCodecs.parseWav(wav.take(30)).isEmpty)          // truncated
    assert(MediaCodecs.parseWav("JUNK".getBytes ++ wav.drop(4)).isEmpty)
    val lying = wav.clone                                       // data size > file
    lying(40) = 0x7f.toByte
    assert(MediaCodecs.parseWav(lying).isEmpty)
  }

  test("BMP codec: round-trip with row padding, non-54 pixel offset, malformed rejects") {
    import graft.multimodal.MediaCodecs
    // width 5 -> row 15 bytes padded to 16: padding arithmetic is load-bearing.
    val bmp = MediaCodecs.buildBmp(5, 3, 200, 100, 50)
    val m = MediaCodecs.parseBmp(bmp).get
    assert(m.width === 5 && m.height === 3 && m.bitsPerPixel === 24)
    assert((m.sumR, m.sumG, m.sumB) === (15L * 200, 15L * 100, 15L * 50))
    assert(bmp.length === 54 + 16 * 3)
    // Parser must honor the pixel-array offset from the file header, not
    // assume 54: shift the pixel data by 4 bytes and patch the offset.
    val shifted = bmp.take(10) ++ Array[Byte](58, 0, 0, 0) ++
      bmp.slice(14, 54) ++ Array[Byte](0, 0, 0, 0) ++ bmp.drop(54)
    assert(MediaCodecs.parseBmp(shifted).get.sumR === m.sumR)
    assert(MediaCodecs.parseBmp(null).isEmpty)
    assert(MediaCodecs.parseBmp(bmp.take(40)).isEmpty)       // truncated header
    assert(MediaCodecs.parseBmp(bmp.dropRight(8)).isEmpty)   // truncated pixels
    val wrongMagic = bmp.clone; wrongMagic(0) = 'X'.toByte
    assert(MediaCodecs.parseBmp(wrongMagic).isEmpty)
  }

  test("BMP resize: identity preserves pixels; downsample picks the nearest-neighbor grid") {
    import graft.multimodal.MediaCodecs
    // Gradient where every pixel is unique: r = x, g = y, b = x + y.
    val src = MediaCodecs.buildBmpGradient(6, 4,
      (x, y) => (x, y, x + y))
    // Identity resize must reproduce the exact pixel sums.
    val same = MediaCodecs.parseBmp(
      MediaCodecs.resizeBmpNearest(src, 6, 4).get).get
    val orig = MediaCodecs.parseBmp(src).get
    assert((same.sumR, same.sumG, same.sumB) ===
      ((orig.sumR, orig.sumG, orig.sumB)))
    // 6x4 -> 3x2: nearest-neighbor picks sx in {0,2,4}, sy in {0,2}.
    val down = MediaCodecs.parseBmp(
      MediaCodecs.resizeBmpNearest(src, 3, 2).get).get
    val sxs = Seq(0, 2, 4); val sys = Seq(0, 2)
    val expR = (for (x <- sxs; _ <- sys) yield x).sum.toLong
    val expG = (for (_ <- sxs; y <- sys) yield y).sum.toLong
    assert(down.width === 3 && down.height === 2)
    assert((down.sumR, down.sumG, down.sumB) ===
      ((expR, expG, expR + expG)))
    // The row flip matters: g = y must NOT come out mirrored. Check a
    // single-pixel resize at the image TOP-left (y = 0, not h-1).
    val tl = MediaCodecs.parseBmp(
      MediaCodecs.resizeBmpNearest(src, 1, 1).get).get
    assert((tl.sumR, tl.sumG, tl.sumB) === ((0L, 0L, 0L)))
    assert(MediaCodecs.resizeBmpNearest(src.take(40), 3, 2).isEmpty)
    assert(MediaCodecs.resizeBmpNearest(src, 0, 2).isEmpty)
  }

  test("WAV features: peak and zero crossings fold over real samples, zeros don't count") {
    import graft.multimodal.MediaCodecs
    // 0-samples neither cross nor seed a sign; 5,-3 crosses; -3,-2 doesn't.
    val m = MediaCodecs.parseWav(MediaCodecs.buildWav(8000, 1,
      Array[Short](0, 5, -3, -2, 0, 4, 7))).get
    assert(m.peak === 7)
    assert(m.zeroCrossings === 2L) // 5->-3 and -2->4 (through the zero)
    val silent = MediaCodecs.parseWav(MediaCodecs.buildWav(8000, 1,
      Array[Short](0, 0, 0))).get
    assert(silent.peak === 0 && silent.zeroCrossings === 0L)
  }

  test("WAV decimation keeps every k-th sample, halves the rate, rejects stereo") {
    import graft.multimodal.MediaCodecs
    val wav = MediaCodecs.buildWav(8000, 1,
      Array[Short](10, -10, 20, -20, 30, -30))
    val m = MediaCodecs.parseWav(MediaCodecs.decimateWav(wav, 2).get).get
    assert(m.sampleRate === 4000 && m.nSamples === 3L)
    assert(m.sumSquares === 100L + 400L + 900L) // samples 10, 20, 30
    val wav9 = MediaCodecs.buildWav(9000, 1,
      Array[Short](10, -10, 20, -20, 30, -30))
    val tri = MediaCodecs.parseWav(MediaCodecs.decimateWav(wav9, 3).get).get
    assert(tri.sampleRate === 3000)
    assert(tri.nSamples === 2L && tri.sumSquares === 100L + 400L) // 10, -20
    val stereo = MediaCodecs.buildWav(8000, 2, Array[Short](1, 2, 3, 4))
    assert(MediaCodecs.decimateWav(stereo, 2).isEmpty)
    assert(MediaCodecs.decimateWav(wav, 0).isEmpty)
    assert(MediaCodecs.decimateWav(wav, 3000).isEmpty) // 8000 % 3000 != 0
  }

  test("decodeWav/decodeBmp drop invalid blobs and decode valid ones in one pass") {
    import spark.implicits._
    import graft.multimodal.MediaCodecs
    val wav = MediaCodecs.buildWav(8000, 1, Array[Short](3, -3, 3, -3))
    val rows = Seq((1L, wav), (2L, "not a wav at all".getBytes),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "bytes")
    val out = MultimodalOps.decodeWav(rows, "doc_id", "bytes").collect()
    assert(out.length === 1 && out(0).docId === 1L &&
      out(0).sumSquares === 36L && out(0).nSamples === 4L)
    val bmp = MediaCodecs.buildBmp(4, 2, 9, 8, 7)
    val rows2 = Seq((1L, bmp), (2L, "nope".getBytes)).toDF("doc_id", "bytes")
    val out2 = MultimodalOps.decodeBmp(rows2, "doc_id", "bytes").collect()
    assert(out2.length === 1 && out2(0).sumR === 8L * 9)
  }

  test("aHash through the real byte pipeline is scale-invariant for 8-multiple upscales") {
    import graft.multimodal.MediaCodecs
    def phash(w: Int, h: Int, seed: Int): Long = {
      val bytes = MediaCodecs.buildBmpGradient(w, h, (x, y) => {
        val v = ((x * 8 / w) * 37 + (y * 8 / h) * 101 + seed * 29) % 256
        (v, v, v)
      })
      val small = MediaCodecs.resizeBmpNearest(bytes, 8, 8).get
      val px = MediaCodecs.bmpGrayR(small).get
      assert(px.length == 64)
      val sum = px.map(_.toLong).sum
      (0 until 64).foldLeft(0L)((acc, i) =>
        if (64L * px(i) > sum) acc | (1L << i) else acc)
    }
    // the same canonical pattern at three resolutions hashes identically
    assert(phash(8, 8, 5) == phash(24, 16, 5))
    assert(phash(8, 8, 5) == phash(16, 24, 5))
    // bmpGrayR reads image order: a pattern with distinct top and bottom
    // rows must not come back flipped
    val asym = MediaCodecs.buildBmpGradient(2, 2, (x, y) => {
      val v = y * 100 + x; (v, v, v)
    })
    assert(MediaCodecs.bmpGrayR(asym).get.toSeq == Seq(0, 1, 100, 101))
  }

  test("BMP patch sums: edge patches sized truly, sums match the pixel grid") {
    import graft.multimodal.MediaCodecs
    // 10×5, v = x + y, p = 8: lattice is (0,0,8,5) and (1,0,2,5)
    val img = MediaCodecs.buildBmpGradient(10, 5, (x, y) => {
      val v = x + y; (v, v, v)
    })
    val got = MediaCodecs.bmpPatchSums(img, 8).get
    def brute(x0: Int, x1: Int): Long =
      (for (x <- x0 until x1; y <- 0 until 5) yield (x + y).toLong).sum
    assert(got === Seq((0, 0, 8, 5, brute(0, 8)), (1, 0, 2, 5, brute(8, 10))))
    // multi-row lattice: 10×12 -> (0,0,8,8) (1,0,2,8) (0,1,8,4) (1,1,2,4)
    val tall = MediaCodecs.buildBmpGradient(10, 12, (x, y) => {
      val v = (x * 7 + y * 13) % 256; (v, v, v)
    })
    val g2 = MediaCodecs.bmpPatchSums(tall, 8).get
    def brute2(x0: Int, x1: Int, y0: Int, y1: Int): Long =
      (for (x <- x0 until x1; y <- y0 until y1)
        yield ((x * 7 + y * 13) % 256).toLong).sum
    assert(g2 === Seq(
      (0, 0, 8, 8, brute2(0, 8, 0, 8)), (1, 0, 2, 8, brute2(8, 10, 0, 8)),
      (0, 1, 8, 4, brute2(0, 8, 8, 12)), (1, 1, 2, 4, brute2(8, 10, 8, 12))))
    // malformed rejects: truncated body, bad magic
    assert(MediaCodecs.bmpPatchSums(img.take(40), 8).isEmpty)
    val bad = img.clone(); bad(0) = 'X'.toByte
    assert(MediaCodecs.bmpPatchSums(bad, 8).isEmpty)
  }

  test("BMP box resize: exact block means, uniform identity, geometry guards") {
    import graft.multimodal.MediaCodecs
    // 4×4 checkerboard of 0/255 at f=2: every 2×2 block holds two of
    // each → mean (2·255) / 4 = 127 exactly, all three channels
    val checker = MediaCodecs.buildBmpGradient(4, 4,
      (x, y) => { val v = if ((x + y) % 2 == 0) 255 else 0; (v, v, v) })
    val m = MediaCodecs.parseBmp(MediaCodecs.resizeBmpBox(checker, 2).get).get
    assert((m.width, m.height) === (2, 2))
    assert((m.sumR, m.sumG, m.sumB) === (4 * 127L, 4 * 127L, 4 * 127L))
    // solid color: box mean is the identity at any factor
    val solid = MediaCodecs.buildBmp(8, 8, 10, 20, 30)
    val sm = MediaCodecs.parseBmp(MediaCodecs.resizeBmpBox(solid, 4).get).get
    assert((sm.width, sm.height, sm.sumR, sm.sumG, sm.sumB) ===
      (2, 2, 4 * 10L, 4 * 20L, 4 * 30L))
    // brute cross-check on a gradient: per-block integer means
    val grad = MediaCodecs.buildBmpGradient(8, 4,
      (x, y) => ((x * 7 + y * 13) % 256, (x * 3) % 256, (y * 5) % 256))
    val g = MediaCodecs.parseBmp(MediaCodecs.resizeBmpBox(grad, 4).get).get
    def brute(f: (Int, Int) => Int): Long =
      (for (bx <- 0 until 2; by <- 0 until 1) yield
        (for (x <- 4 * bx until 4 * bx + 4; y <- 4 * by until 4 * by + 4)
          yield f(x, y).toLong).sum / 16).sum
    assert(g.sumR === brute((x, y) => (x * 7 + y * 13) % 256))
    assert(g.sumG === brute((x, _) => (x * 3) % 256))
    assert(g.sumB === brute((_, y) => (y * 5) % 256))
    // guards: non-divisible geometry, bad factor, bad magic
    assert(MediaCodecs.resizeBmpBox(MediaCodecs.buildBmp(6, 4, 1, 1, 1), 4).isEmpty)
    assert(MediaCodecs.resizeBmpBox(solid, 0).isEmpty)
    val bad = solid.clone(); bad(0) = 'X'.toByte
    assert(MediaCodecs.resizeBmpBox(bad, 2).isEmpty)
  }

  test("WAV silence trim: edges drop, interior silence survives, all-silent empties, stereo rejects") {
    import graft.multimodal.MediaCodecs
    def wav(ss: Int*) = MediaCodecs.buildWav(8000, 1, ss.map(_.toShort).toArray)
    // 2 leading + 3 trailing zeros; interior zero must SURVIVE
    val (out, lead, tail) =
      MediaCodecs.trimWavSilence(wav(0, 0, 5, 0, -7, 0, 0, 0), 0).get
    assert((lead, tail) === (2, 3))
    val m = MediaCodecs.parseWav(out).get
    assert(m.nSamples === 3 && m.sumSquares === 25L + 49L)
    // threshold 2: |1| and |2| count as silence, |3| does not
    val (o2, l2, t2) = MediaCodecs.trimWavSilence(wav(1, -2, 3, 2), 2).get
    assert((l2, t2) === (2, 1))
    assert(MediaCodecs.parseWav(o2).get.nSamples === 1)
    // all-silent: empty container, full length counted as leading
    val (o3, l3, t3) = MediaCodecs.trimWavSilence(wav(0, 0, 0), 0).get
    assert((l3, t3) === (3, 0))
    assert(MediaCodecs.parseWav(o3).get.nSamples === 0)
    // no silence anywhere: identity in samples
    val (o4, l4, t4) = MediaCodecs.trimWavSilence(wav(9, -9), 0).get
    assert((l4, t4) === (0, 0))
    assert(MediaCodecs.parseWav(o4).get.sumSquares === 162L)
    // stereo and garbage reject
    val stereo = MediaCodecs.buildWav(8000, 2, Array[Short](1, 2, 3, 4))
    assert(MediaCodecs.trimWavSilence(stereo, 0).isEmpty)
    assert(MediaCodecs.trimWavSilence(Array[Byte](1, 2, 3), 0).isEmpty)
  }

  test("PNG codec: round-trip through deflate + all five filters, geometry edges") {
    import graft.multimodal.MediaCodecs
    def sums(w: Int, h: Int, f: (Int, Int) => (Int, Int, Int)) = {
      val cs = for (x <- 0 until w; y <- 0 until h) yield f(x, y)
      (cs.map(_._1.toLong).sum, cs.map(_._2.toLong).sum, cs.map(_._3.toLong).sum)
    }
    // h = 7 > 5: every filter type (None/Sub/Up/Average/Paeth) appears
    val f = (x: Int, y: Int) =>
      ((x * 7 + y * 13) % 256, (x * 11 + y * 3) % 256, (x * 5 + y * 17) % 256)
    val m = MediaCodecs.parsePng(MediaCodecs.buildPng(9, 7, f)).get
    val (sr, sg, sb) = sums(9, 7, f)
    assert((m.width, m.height, m.bitDepth, m.colorType) === (9, 7, 8, 2))
    assert((m.sumR, m.sumG, m.sumB) === (sr, sg, sb))
    // 1×1 (no left/up neighbors anywhere) and 1×6 (pure Up/Paeth column)
    val one = MediaCodecs.parsePng(MediaCodecs.buildPng(1, 1, (_, _) => (200, 100, 50))).get
    assert((one.sumR, one.sumG, one.sumB) === (200L, 100L, 50L))
    val col1 = MediaCodecs.parsePng(MediaCodecs.buildPng(1, 6, (_, y) => (y, 2 * y, 3 * y))).get
    assert((col1.sumR, col1.sumG, col1.sumB) === (15L, 30L, 45L))
    // PNG and BMP built from the SAME gradient agree on channel sums
    // (cross-codec consistency: two independent byte paths, one truth)
    val bmp = MediaCodecs.parseBmp(MediaCodecs.buildBmpGradient(9, 7, f)).get
    assert((bmp.sumR, bmp.sumG, bmp.sumB) === (m.sumR, m.sumG, m.sumB))
  }

  test("PNG codec: malformed inputs reject — magic, CRC, zlib, geometry, color type") {
    import graft.multimodal.MediaCodecs
    val good = MediaCodecs.buildPng(6, 5, (x, y) => (x, y, x + y))
    assert(MediaCodecs.parsePng(good).isDefined)
    // bad signature
    val sig = good.clone(); sig(1) = 'X'.toByte
    assert(MediaCodecs.parsePng(sig).isEmpty)
    // truncated anywhere
    assert(MediaCodecs.parsePng(good.take(20)).isEmpty)
    assert(MediaCodecs.parsePng(good.take(good.length - 4)).isEmpty)
    // flip one IDAT payload byte: the CRC check must catch it
    val ihdrLen = 8 + 12 + 13 // sig + IHDR chunk
    val corrupt = good.clone()
    corrupt(ihdrLen + 8 + 2) = (corrupt(ihdrLen + 8 + 2) ^ 0x41).toByte
    assert(MediaCodecs.parsePng(corrupt).isEmpty)
    // valid chunk framing but undecodable zlib: rebuild IDAT as garbage
    // with a CORRECT crc, so the failure is the Inflater's, not the walk's
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
      val c = java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
      len ++ t ++ data ++ c
    }
    val head = good.take(ihdrLen)
    val junk = head ++ chunk("IDAT", Array.fill[Byte](20)(0x55)) ++
      chunk("IEND", Array.empty[Byte])
    assert(MediaCodecs.parsePng(junk).isEmpty)
    // geometry lie: IHDR claims one more row than the pixel data holds
    val ihdrData = good.slice(16, 16 + 13)
    val tall = ihdrData.clone()
    tall(7) = (tall(7) + 1).toByte // height LSB (BE word at offset 4)
    val lied = good.take(8) ++ chunk("IHDR", tall) ++ good.drop(8 + 12 + 13)
    assert(MediaCodecs.parsePng(lied).isEmpty)
    // unsupported color type (grayscale), CRC valid
    val gray = ihdrData.clone(); gray(9) = 0
    val wrongCt = good.take(8) ++ chunk("IHDR", gray) ++ good.drop(8 + 12 + 13)
    assert(MediaCodecs.parsePng(wrongCt).isEmpty)
  }

  test("PNG Adam7 interlace: per-pass filter round-trip across geometries, " +
    "ImageIO cross-validation both directions, malformed interlace rejects") {
    import graft.multimodal.MediaCodecs
    val f = (x: Int, y: Int) =>
      ((x * 7 + y * 13) % 256, (x * 11 + y * 3) % 256, (x * 5 + y * 17) % 256)
    def sums(w: Int, h: Int) = {
      val cs = for (x <- 0 until w; y <- 0 until h) yield f(x, y)
      (cs.map(_._1.toLong).sum, cs.map(_._2.toLong).sum,
        cs.map(_._3.toLong).sum)
    }
    // Geometry sweep: sub-8x8 images exercise EMPTY passes (spec: an
    // empty pass contributes no bytes), 9x7/16x10 exercise partial
    // passes, 1x1 is pass 1 alone, 1x9/9x1 are single-column/row.
    for ((w, h) <- Seq((1, 1), (3, 2), (2, 3), (7, 5), (8, 8), (9, 7),
      (16, 10), (1, 9), (9, 1))) {
      val seqBytes = MediaCodecs.buildPng(w, h, f)
      val intBytes = MediaCodecs.buildPng(w, h, f, interlaced = true)
      val ms = MediaCodecs.parsePng(seqBytes).get
      val mi = MediaCodecs.parsePng(intBytes).get
      val (sr, sg, sb) = sums(w, h)
      assert((mi.width, mi.height) === (w, h))
      assert((mi.sumR, mi.sumG, mi.sumB) === (sr, sg, sb),
        s"interlaced sums at ${w}x$h")
      assert((mi.sumR, mi.sumG, mi.sumB) === (ms.sumR, ms.sumG, ms.sumB))
      // ImageIO (independent JDK codec) decodes our interlaced bytes
      // PIXEL-exactly — a mis-scattered pass or wrong per-pass filter
      // state cannot survive this, sums alone could hide a swap.
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(intBytes))
      assert(img.getWidth === w && img.getHeight === h)
      for (x <- 0 until w; y <- 0 until h) {
        val (r, g, b) = f(x, y)
        assert(img.getRGB(x, y) === (0xff000000 | (r << 16) | (g << 8) | b),
          s"pixel ($x,$y) of ${w}x$h")
      }
    }
    // The other direction: the JDK writer's OWN Adam7 stream (progressive
    // mode) must parse to the analytic sums.
    val (w, h) = (13, 11)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val (r, g, b) = f(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val baos = new java.io.ByteArrayOutputStream
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val jdkBytes = baos.toByteArray
    assert((jdkBytes(8 + 8 + 12) & 0xff) === 1, "JDK stream is Adam7")
    val mj = MediaCodecs.parsePng(jdkBytes).get
    val (sr, sg, sb) = sums(w, h)
    assert((mj.width, mj.height, mj.sumR, mj.sumG, mj.sumB) ===
      (w, h, sr, sg, sb))
    // Malformed: interlace byte 2 (not a spec value) rejects; an
    // interlaced stream whose IDAT holds only the SEQUENTIAL layout
    // (wrong total pass length) rejects on exact geometry.
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      java.nio.ByteBuffer.allocate(4).putInt(data.length).array() ++ t ++
        data ++
        java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
    }
    val good = MediaCodecs.buildPng(6, 5, f)
    val ihdrData = good.slice(16, 16 + 13)
    val badIl = ihdrData.clone(); badIl(12) = 2
    assert(MediaCodecs.parsePng(
      good.take(8) ++ chunk("IHDR", badIl) ++ good.drop(8 + 12 + 13)).isEmpty)
    val lieIl = ihdrData.clone(); lieIl(12) = 1
    assert(MediaCodecs.parsePng(
      good.take(8) ++ chunk("IHDR", lieIl) ++ good.drop(8 + 12 + 13)).isEmpty)
  }

  test("BMP top-down (negative biHeight): position-sensitive readers agree " +
    "with the bottom-up layout and with ImageIO") {
    import graft.multimodal.MediaCodecs
    val f = (x: Int, y: Int) =>
      ((x * 7 + y * 13) % 256, (x * 3 + y * 5) % 256, (x + y) % 256)
    for ((w, h) <- Seq((9, 7), (8, 8), (1, 5), (16, 4))) {
      val up = MediaCodecs.buildBmpGradient(w, h, f)
      val dn = MediaCodecs.buildBmpGradient(w, h, f, topDown = true)
      // channel sums are row-order invariant; positions are NOT —
      // both must come out identical in IMAGE coordinates.
      val (mu, md) = (MediaCodecs.parseBmp(up).get, MediaCodecs.parseBmp(dn).get)
      assert((md.width, md.height, md.sumR, md.sumG, md.sumB) ===
        ((mu.width, mu.height, mu.sumR, mu.sumG, mu.sumB)))
      assert(MediaCodecs.bmpGrayR(dn).get.toSeq ===
        MediaCodecs.bmpGrayR(up).get.toSeq)
      assert(MediaCodecs.bmpPatchSums(dn, 4).get ===
        MediaCodecs.bmpPatchSums(up, 4).get)
      assert(MediaCodecs.resizeBmpNearest(dn, 5, 3).get.toSeq ===
        MediaCodecs.resizeBmpNearest(up, 5, 3).get.toSeq)
      // ImageIO (independent JDK BMP reader) agrees pixel-exactly on
      // the top-down layout.
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(dn))
      val gray = MediaCodecs.bmpGrayR(dn).get
      for (x <- 0 until w; y <- 0 until h)
        assert(((img.getRGB(x, y) >> 16) & 0xff) === gray(y * w + x),
          s"R at ($x,$y) of ${w}x$h")
    }
    val up88 = MediaCodecs.buildBmpGradient(8, 8, f)
    val dn88 = MediaCodecs.buildBmpGradient(8, 8, f, topDown = true)
    assert(MediaCodecs.resizeBmpBox(dn88, 4).get.toSeq ===
      MediaCodecs.resizeBmpBox(up88, 4).get.toSeq)
  }

  test("WAV stereo de-interleave: per-channel features from a hand fixture, " +
    "mono parity, ragged frame reject") {
    import graft.multimodal.MediaCodecs
    // L = (5, -5, 5): 2 crossings; R = (-7, -7, -7): none. Interleaved
    // frame layout (L0 R0 L1 R1 L2 R2).
    val st = MediaCodecs.buildWav(8000, 2,
      Array[Short](5, -7, -5, -7, 5, -7))
    val rows = MediaCodecs.wavChannelFeatures(st).get
    assert(rows === Seq((0, 3L, 75L, 5, 2L), (1, 3L, 147L, 7, 0L)))
    // The interleaved mono fold fabricates crossings at L/R boundaries
    // (5,-7,-5,-7,5,-7 has 3 sign changes ≠ 2 + 0) — the per-channel
    // fold must not inherit them.
    assert(MediaCodecs.parseWav(st).get.zeroCrossings === 3L)
    // Mono parity: single row reproduces parseWav's features.
    val mono = MediaCodecs.buildWav(8000, 1, Array[Short](3, -4, 0, 2))
    val m = MediaCodecs.parseWav(mono).get
    assert(MediaCodecs.wavChannelFeatures(mono).get ===
      Seq((0, m.nSamples, m.sumSquares, m.peak, m.zeroCrossings)))
    // A stereo data chunk with an odd sample count is not a whole
    // number of frames: reject, never mis-align channels.
    val ragged = MediaCodecs.buildWav(8000, 2, Array[Short](1, 2, 3))
    assert(MediaCodecs.wavChannelFeatures(ragged).isEmpty)
    assert(MediaCodecs.wavChannelFeatures(Array[Byte](1, 2)).isEmpty)
  }

  test("JPEG fill bytes (T.81 B.1.1.2): legal 0xFF padding before markers " +
    "decodes identically on both paths; forged-SOF2 still rejects") {
    import graft.multimodal.MediaCodecs
    val f = (x: Int, y: Int) => (x * 5 + y * 9) % 256
    for (progressive <- Seq(false, true)) {
      val plain = MediaCodecs.buildJpegGray(18, 13, f,
        progressive = progressive)
      val filled = MediaCodecs.withJpegFillBytes(plain)
      assert(filled.length === plain.length + 2)
      val a = MediaCodecs.jpegRgb(plain).get
      val b = MediaCodecs.jpegRgb(filled).get
      assert(b._1 === a._1 && b._2 === a._2 && b._3 === a._3)
      assert(b._4.toSeq === a._4.toSeq,
        s"fill bytes changed pixels (progressive=$progressive)")
      assert(MediaCodecs.jpegMaxDevVsImageIO(filled).exists(_ <= 1))
      // header sniff walks the same fill bytes
      val meta = MediaCodecs.sniffMeta(filled).get
      assert(meta.width === Some(18) && meta.height === Some(13) &&
        meta.progressive === Some(progressive))
    }
    // The malformed-reject contract survives: a baseline stream with a
    // forged SOF2 header plus fill bytes must still be refused.
    val forged = MediaCodecs.withJpegFillBytes(
      MediaCodecs.withProgressiveSofHeader(
        MediaCodecs.buildJpegGray(18, 13, f, progressive = false)))
    assert(MediaCodecs.jpegRgb(forged).isEmpty)
  }

  test("Haar band energies: hand-computed pyramid, truncation, edges") {
    // x = 1..8: level 1 a=(3,7,11,15) d=(-1,-1,-1,-1) -> E1 = 4;
    // level 2 a=(10,26) d=(-4,-4) -> E2 = 32; level 3 a=(36) d=(-16)
    // -> E3 = 256; residual = 36^2 = 1296.
    val x8 = Array.tabulate(8)(i => (i + 1).toShort)
    val (b8, r8) = MediaCodecs.haarBandEnergies(x8, 5)
    assert(b8.toSeq === Seq(4L, 32L, 256L) && r8 === 1296L)
    // maxLevels stops the pyramid early: residual = 10^2 + 26^2.
    val (b2, r2) = MediaCodecs.haarBandEnergies(x8, 2)
    assert(b2.toSeq === Seq(4L, 32L) && r2 === 776L)
    // Non-dyadic length truncates to the first 2^floor(log2 n) samples.
    val x10 = Array.tabulate(10)(i => (i + 1).toShort)
    assert(MediaCodecs.haarBandEnergies(x10, 5)._1.toSeq ===
      Seq(4L, 32L, 256L))
    // Single sample: no bands, residual is its square.
    val (b1, r1) = MediaCodecs.haarBandEnergies(Array(7.toShort), 5)
    assert(b1.isEmpty && r1 === 49L)
    // Square wave period 4, amplitude 3, n=16: all energy in band 2
    // (E2 = 16 * 4 * 9 = 576), everything else exactly zero.
    val sq = Array.tabulate(16)(i =>
      (if (((i >> 1) & 1) == 0) 3 else -3).toShort)
    val (bs, rs) = MediaCodecs.haarBandEnergies(sq, 5)
    assert(bs.toSeq === Seq(0L, 576L, 0L, 0L) && rs === 0L)
  }

  test("GIF round-trip: analytic sums, incl. LZW width growth and reset") {
    // Small image: dictionary stays in 9-bit codes.
    def idx(x: Int, y: Int): Int = (x * 31 + y * 17) % 256
    val small = MediaCodecs.parseGif(MediaCodecs.buildGif(9, 7, idx)).get
    val n = 9 * 7
    val expIdx = (for (y <- 0 until 7; x <- 0 until 9) yield idx(x, y)).sum
    assert(small.width === 9 && small.height === 7 && small.paletteSize === 256)
    assert(small.nPixels === n.toLong && small.sumIdx === expIdx.toLong)
    assert(small.sumR === expIdx.toLong)
    assert(small.sumG ===
      (for (y <- 0 until 7; x <- 0 until 9) yield (2 * idx(x, y)) % 256)
        .sum.toLong)
    assert(small.sumB === 255L * n - expIdx)
    // 120x120 high-entropy image: > 4096 dictionary entries, so the
    // encoder must walk 9->10->11->12-bit codes AND emit a mid-stream
    // CLEAR reset; any width desync corrupts every downstream sum.
    def big(x: Int, y: Int): Int = (x * 131 + y * 197 + (x * y) % 83) % 256
    val large = MediaCodecs.parseGif(MediaCodecs.buildGif(120, 120, big)).get
    val expBig = (for (y <- 0 until 120; x <- 0 until 120)
      yield big(x, y).toLong).sum
    assert(large.nPixels === 120L * 120 && large.sumIdx === expBig)
    // 1x1 edge: a single code between CLEAR and EOI.
    val one = MediaCodecs.parseGif(MediaCodecs.buildGif(1, 1, (_, _) => 42)).get
    assert(one.nPixels === 1L && one.sumIdx === 42L && one.sumB === 213L)
  }

  test("GIF cross-validation against the JDK's independent ImageIO codec") {
    // Our encoder -> ImageIO's decoder: pixel-exact agreement proves
    // the LZW bitstream is REAL GIF, not a private dialect.
    def idx(x: Int, y: Int): Int = (x * 7 + y * 13) % 256
    val mine = MediaCodecs.buildGif(33, 21, idx)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(mine))
    assert(img.getWidth === 33 && img.getHeight === 21)
    for (y <- 0 until 21; x <- 0 until 33) {
      val i = idx(x, y)
      val exp = (0xff << 24) | (i << 16) | (((2 * i) % 256) << 8) | (255 - i)
      assert(img.getRGB(x, y) === exp, s"pixel ($x,$y)")
    }
    // ImageIO's encoder -> our decoder: sums must match the source
    // raster (exercises foreign sub-block framing / deferred-clear
    // styles our encoder doesn't emit).
    val src = new java.awt.image.BufferedImage(40, 25,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 25; x <- 0 until 40)
      src.setRGB(x, y, (0xff << 24) | (idx(x, y) << 16) |
        (idx(x, y) << 8) | idx(x, y))
    val bos = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(src, "gif", bos))
    val theirs = MediaCodecs.parseGif(bos.toByteArray).get
    assert(theirs.width === 40 && theirs.height === 25)
    var (expR, expG, expB) = (0L, 0L, 0L)
    for (y <- 0 until 25; x <- 0 until 40) {
      val rgb = src.getRGB(x, y)
      expR += (rgb >> 16) & 0xff; expG += (rgb >> 8) & 0xff
      expB += rgb & 0xff
    }
    assert((theirs.sumR, theirs.sumG, theirs.sumB) === ((expR, expG, expB)))
  }

  test("animated GIF: every frame decodes to its own exact sums, ImageIO " +
      "reads the same frames, single-frame parseGif rejects it") {
    def idx(t: Int, x: Int, y: Int): Int = (x * 7 + y * 13 + t * 31) % 256
    val nf = 4
    val anim = MediaCodecs.buildGifAnimated(19, 11, nf, idx)
    // Header frame count (no decode) agrees.
    assert(MediaCodecs.sniffMeta(anim).flatMap(_.nFrames) === Some(nf))
    // Our decoder: per-frame exact sums.
    val frames = MediaCodecs.gifFrameSums(anim).get
    assert(frames.length === nf)
    for (t <- 0 until nf) {
      var s = 0L
      for (y <- 0 until 11; x <- 0 until 19) s += idx(t, x, y)
      assert(frames(t).width === 19 && frames(t).height === 11)
      assert(frames(t).sumIdx === s, s"frame $t")
      assert(frames(t).nPixels === 19L * 11)
    }
    // The JDK's independent reader sees the SAME number of frames and
    // the same pixels in frame 2 — the bitstream is real multi-image
    // GIF, not a private concatenation.
    val rdr = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    rdr.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(anim)))
    assert(rdr.getNumImages(true) === nf)
    val f2 = rdr.read(2)
    for (y <- 0 until 11; x <- 0 until 19) {
      val i = idx(2, x, y)
      val exp = (0xff << 24) | (i << 16) | (((2 * i) % 256) << 8) | (255 - i)
      assert(f2.getRGB(x, y) === exp, s"frame2 pixel ($x,$y)")
    }
    // parseGif keeps its single-image contract: a multi-frame stream is
    // not "one image followed by the trailer".
    assert(MediaCodecs.parseGif(anim).isEmpty)
    // Truncating the last frame's data breaks the whole walk.
    assert(MediaCodecs.gifFrameSums(anim.dropRight(2)).isEmpty)
  }

  test("GIF malformed inputs reject") {
    val good = MediaCodecs.buildGif(8, 6, (x, y) => (x + y) % 256)
    assert(MediaCodecs.parseGif(good).isDefined)
    // magic flip
    val sig = good.clone(); sig(3) = 'X'.toByte
    assert(MediaCodecs.parseGif(sig).isEmpty)
    // truncation: mid-palette, mid-LZW-stream, and missing trailer
    assert(MediaCodecs.parseGif(good.take(100)).isEmpty)
    assert(MediaCodecs.parseGif(good.take(good.length - 10)).isEmpty)
    assert(MediaCodecs.parseGif(good.dropRight(1)).isEmpty)
    // geometry lie: image descriptor claims one more pixel column than
    // the LZW stream produces
    val lie = good.clone()
    val idOff = 6 + 7 + 768 // header + LSD + global color table
    assert((lie(idOff) & 0xff) === 0x2c)
    lie(idOff + 5) = (lie(idOff + 5) + 1).toByte // width LSB
    assert(MediaCodecs.parseGif(lie).isEmpty)
  }

  // ---- FLAC -------------------------------------------------------------

  import graft.multimodal.FlacCodec

  /** Deterministic pseudo-random 16-bit signal (no Math.random). */
  private def sig(n: Int, seed: Int, span: Int): Array[Short] =
    Array.tabulate(n) { i =>
      val x = (i.toLong * 1103515245L + seed * 12345L) % 2147483647L
      ((x % span) - span / 2).toShort
    }

  test("FLAC round-trip: mono, every forced subframe type (constant, " +
    "verbatim, fixed 0-2, LPC), multi-frame with short last frame, " +
    "exact sample recovery") {
    val flat = Array.fill(300)(1234.toShort)
    for (mode <- Seq("auto", "verbatim", "fixed0", "fixed1", "fixed2", "lpc")) {
      val s = if (mode == "auto") flat else sig(300, 7, 2000)
      val enc = FlacCodec.buildFlac(44100, 1, s, blockSize = 128, mode = mode)
      val (info, planes) = FlacCodec.decodeFlac(enc).get
      assert(info.sampleRate === 44100 && info.channels === 1 &&
        info.bps === 16 && info.totalSamples === 300L, mode)
      assert(planes.length === 1 && planes(0).toSeq === s.map(_.toInt).toSeq,
        s"mode $mode diverged")
    }
  }

  test("FLAC round-trip: all four stereo decorrelations reconstruct the " +
    "same planes bit-exactly (side channel at 17-bit depth)") {
    val n = 200
    val l = sig(n, 3, 30000)
    val r = sig(n, 11, 30000)
    val inter = Array.tabulate(2 * n)(i =>
      if (i % 2 == 0) l(i / 2) else r(i / 2))
    for (a <- Seq(FlacCodec.ChIndep, FlacCodec.ChLeftSide,
        FlacCodec.ChRightSide, FlacCodec.ChMidSide)) {
      val enc = FlacCodec.buildFlac(8000, 2, inter, blockSize = 64,
        assignment = a)
      val (info, planes) = FlacCodec.decodeFlac(enc).get
      assert(info.channels === 2 && info.totalSamples === n.toLong)
      assert(planes(0).toSeq === l.map(_.toInt).toSeq, s"assignment $a L")
      assert(planes(1).toSeq === r.map(_.toInt).toSeq, s"assignment $a R")
    }
  }

  test("FLAC wasted bits: samples with shared low zero bits store " +
    "narrower and recover exactly") {
    val s = sig(150, 5, 4000).map(v => ((v / 4) * 4).toShort)
    val enc = FlacCodec.buildFlac(16000, 1, s, blockSize = 64,
      mode = "verbatim", wasted = 2)
    val plain = FlacCodec.buildFlac(16000, 1, s, blockSize = 64,
      mode = "verbatim")
    assert(enc.length < plain.length, "wasted bits must shrink verbatim")
    assert(FlacCodec.decodeFlac(enc).get._2(0).toSeq ===
      s.map(_.toInt).toSeq)
  }

  test("FLAC malformed rejects: bad magic, truncated stream, corrupt " +
    "header CRC-8, corrupt frame CRC-16, corrupt Rice payload never " +
    "decodes silently") {
    val s = sig(100, 9, 1000)
    val enc = FlacCodec.buildFlac(8000, 1, s, blockSize = 64)
    assert(FlacCodec.decodeFlac(enc).isDefined)
    val badMagic = enc.clone(); badMagic(0) = 'g'.toByte
    assert(FlacCodec.decodeFlac(badMagic).isEmpty)
    assert(FlacCodec.decodeFlac(enc.take(50)).isEmpty)
    assert(FlacCodec.decodeFlac(enc.dropRight(3)).isEmpty)
    val frameStart = 4 + 4 + 34 // magic + block header + STREAMINFO
    // frame header byte (inside sync/flags): flip -> sync or CRC-8 dies
    val badHdr = enc.clone()
    badHdr(frameStart + 2) = (badHdr(frameStart + 2) ^ 0x40).toByte
    assert(FlacCodec.decodeFlac(badHdr).isEmpty)
    // flip a byte well inside the first frame body: CRC-16 must catch
    // it (either the decode structure breaks or the checksum differs)
    val badBody = enc.clone()
    badBody(frameStart + 12) = (badBody(frameStart + 12) ^ 0x10).toByte
    assert(FlacCodec.decodeFlac(badBody).isEmpty)
  }

  test("FLAC hardening: a STREAMINFO block whose declared length lies " +
    "short rejects cleanly (no out-of-bounds read on crafted input)") {
    val s = sig(80, 13, 500)
    val enc = FlacCodec.buildFlac(8000, 1, s, blockSize = 64)
    // patch the 24-bit block length (bytes 5-7) from 34 down to 10
    val lie = enc.clone(); lie(5) = 0; lie(6) = 0; lie(7) = 10
    assert(FlacCodec.decodeFlac(lie).isEmpty)
    // minimal crafted file: magic + last-flagged STREAMINFO header whose
    // lying short length (2) sits exactly at the buffer tail — pre-fix
    // the fixed 34-byte body read indexed past the array here
    val tail = Array[Byte]('f', 'L', 'a', 'C', 0x80.toByte, 0, 0, 2, 0, 0)
    assert(FlacCodec.decodeFlac(tail).isEmpty)
  }

  test("FLAC hardening: totalSamples = 0 (unknown length, RFC 9639) " +
    "decodes frames to EOF and reports the actual count, never a " +
    "silent empty decode") {
    val s = sig(150, 17, 900)
    val enc = FlacCodec.buildFlac(8000, 1, s, blockSize = 64)
    val unk = enc.clone()
    // totalSamples = STREAMINFO body bits 108..143 = low nibble of
    // body byte 13 plus body bytes 14..17 (body starts at offset 8)
    unk(8 + 13) = (unk(8 + 13) & 0xf0).toByte
    for (i <- 14 to 17) unk(8 + i) = 0
    val (info, planes) = FlacCodec.decodeFlac(unk).get
    assert(info.totalSamples === 150L)
    assert(planes(0).toSeq === s.map(_.toInt).toSeq)
    // a truncated unknown-length stream still rejects: the final
    // partial frame fails its parse instead of quietly shortening
    assert(FlacCodec.decodeFlac(unk.dropRight(3)).isEmpty)
  }

  test("WARC record walk: plain and gzip-member streams yield identical " +
    "records with decompressed-space offsets; unknown headers skip; " +
    "structural violations reject") {
    import graft.sources.WarcCodec
    val recs = Seq(
      ("warcinfo", "", Array.tabulate(10)(_.toByte)),
      ("response", "https://ex.org/a", Array.tabulate(25)(i => (i * 3).toByte)),
      ("request", "https://ex.org/b", Array.emptyByteArray))
    val plain = WarcCodec.buildWarc(recs)
    val gzipd = WarcCodec.buildWarc(recs, gzipPerRecord = true)
    val (gz0, rp) = WarcCodec.parseWarc(plain).get
    val (gz1, rg) = WarcCodec.parseWarc(gzipd).get
    assert(!gz0 && gz1)
    // Array payload defeats case-class ==: compare fields + bytes
    assert(rp.map(r => (r.idx, r.recType, r.targetUri, r.contentLength,
        r.offset, r.payload.toSeq)) ===
      rg.map(r => (r.idx, r.recType, r.targetUri, r.contentLength,
        r.offset, r.payload.toSeq)),
      "gzip layout must be invisible to the walk")
    assert(rp(1).payload.toSeq === recs(1)._3.toSeq,
      "payload bytes extracted exactly")
    assert(rp.map(_.recType) === Seq("warcinfo", "response", "request"))
    assert(rp.map(_.contentLength) === Seq(10L, 25L, 0L))
    // exact offset arithmetic: version(10) + type + date(33) + CL + blank
    val r0len = 10 + ("WARC-Type: warcinfo".length + 2) + 33 +
      ("Content-Length: 10".length + 2) + 2 + 10 + 4
    assert(rp(1).offset === r0len.toLong)
    // an unknown header is legal and skipped
    val extra = new String(plain, "ISO-8859-1").replaceFirst(
      "WARC-Date", "X-Custom: v\r\nWARC-Date").getBytes("ISO-8859-1")
    assert(WarcCodec.parseWarc(extra).get._2.map(_.recType) ===
      rp.map(_.recType))
    // rejects: bad version, truncated payload, broken trailer, missing
    // Content-Length, trailing garbage
    val badV = plain.clone(); badV(5) = '2'
    assert(WarcCodec.parseWarc(badV).isEmpty)
    assert(WarcCodec.parseWarc(plain.dropRight(3)).isEmpty)
    val badT = plain.clone(); badT(badT.length - 1) = 'x'
    assert(WarcCodec.parseWarc(badT).isEmpty)
    val noCl = new String(plain, "ISO-8859-1").replaceFirst(
      "Content-Length", "Content-Size").getBytes("ISO-8859-1")
    assert(WarcCodec.parseWarc(noCl).isEmpty)
    assert(WarcCodec.parseWarc(plain ++ Array[Byte](1, 2)).isEmpty)
    assert(WarcCodec.parseWarc(Array.emptyByteArray).isEmpty)
  }

  test("WARC gzip strictness: corrupt later member, flipped CRC, and " +
    "trailing garbage all reject — never a silently truncated decode " +
    "(the JDK reader's EOF-swallow behavior)") {
    import graft.sources.WarcCodec
    val recs = Seq(
      ("warcinfo", "", Array.tabulate(6)(_.toByte)),
      ("response", "https://g.org/a", Array.tabulate(20)(i => (i * 5).toByte)),
      ("response", "https://g.org/b", Array.tabulate(11)(i => (i + 9).toByte)))
    val gz = WarcCodec.buildWarc(recs, gzipPerRecord = true)
    assert(WarcCodec.parseWarc(gz).get._2.size === 3)
    // find the SECOND member's magic and corrupt its header: a lenient
    // reader would return the first record only
    val second = {
      var i = 2
      while (!((gz(i) & 0xff) == 0x1f && (gz(i + 1) & 0xff) == 0x8b)) i += 1
      i
    }
    val badHdr = gz.clone(); badHdr(second + 2) = 7 // CM != deflate
    assert(WarcCodec.parseWarc(badHdr).isEmpty, "corrupt member header")
    // flip a byte in the LAST member's trailer (CRC32 area)
    val badCrc = gz.clone()
    badCrc(badCrc.length - 6) = (badCrc(badCrc.length - 6) ^ 0x1).toByte
    assert(WarcCodec.parseWarc(badCrc).isEmpty, "CRC mismatch")
    assert(WarcCodec.parseWarc(gz ++ Array[Byte](9, 9, 9)).isEmpty,
      "trailing garbage after the last member")
    assert(WarcCodec.parseWarc(gz.dropRight(4)).isEmpty, "truncated member")
  }

  test("WARC gzip bomb: a member inflating past the cap drops the BLOB " +
    "(None) instead of allocating through to OutOfMemoryError — the " +
    "untrusted-bytes drop-the-blob contract") {
    import graft.sources.WarcCodec
    // a high-ratio member: 4 MiB of zeros deflates to ~4 KiB (~1000x)
    val big = ("response", "https://bomb.org/z", new Array[Byte](4 << 20))
    val gz = WarcCodec.buildWarc(Seq(big), gzipPerRecord = true)
    assert(gz.length < (16 << 10), "fixture really is high-ratio")
    // cap below the payload: reject; the default 256 MiB cap: parse
    assert(WarcCodec.parseWarc(gz, maxInflated = 1 << 20).isEmpty,
      "inflate past the cap rejects")
    assert(WarcCodec.parseWarc(gz).get._2.head.contentLength === (4 << 20).toLong,
      "the default cap still admits a legitimate large record")
    // the cap is on the TOTAL across members, not per member: many
    // small members that sum past it reject too
    val many = WarcCodec.buildWarc(
      Seq.fill(8)(("response", "https://bomb.org/m", new Array[Byte](256 << 10))),
      gzipPerRecord = true)
    assert(WarcCodec.parseWarc(many, maxInflated = 1 << 20).isEmpty,
      "cumulative total past the cap rejects")
    assert(WarcCodec.parseWarc(many, maxInflated = 4 << 20).get._2.size === 8)
  }

  test("WARC/1.1 version lines are accepted, per record and " +
    "interleaved with 1.0; other versions still reject") {
    import graft.sources.WarcCodec
    val recs = Seq(
      ("warcinfo", "", Array.tabulate(7)(_.toByte)),
      ("response", "https://v.org/a", Array.tabulate(13)(i => (i * 2).toByte)))
    val v10 = WarcCodec.buildWarc(recs)
    val v11 = WarcCodec.buildWarc(recs, version = _ => "WARC/1.1")
    val mixed = WarcCodec.buildWarc(recs,
      version = i => if (i == 0) "WARC/1.1" else "WARC/1.0")
    val base = WarcCodec.parseWarc(v10).get._2
      .map(r => (r.idx, r.recType, r.targetUri, r.contentLength, r.offset))
    for (b <- Seq(v11, mixed)) {
      assert(WarcCodec.parseWarc(b).get._2
        .map(r => (r.idx, r.recType, r.targetUri, r.contentLength, r.offset))
        === base,
        "1.1 and mixed-revision segments walk identically (8-octet " +
          "version lines keep offsets fixed)")
    }
    // gzip layout too
    assert(WarcCodec.parseWarc(WarcCodec.buildWarc(recs,
        gzipPerRecord = true, version = _ => "WARC/1.1")).get._2.size === 2)
    // 0.9 / 2.0 / 1.2 are NOT silently admitted
    for (v <- Seq("WARC/0.9", "WARC/2.0", "WARC/1.2"))
      assert(WarcCodec.parseWarc(WarcCodec.buildWarc(recs,
        version = _ => v)).isEmpty, s"$v must reject")
  }

  test("charset sniff: RFC 3629 edges — overlongs, surrogates, " +
    "past-10FFFF, truncation all quarantine; BOMs dispatch; valid " +
    "multibyte counts sequences") {
    import spark.implicits._
    def row(id: Long, b: Array[Byte]) = (id, b)
    val cases = Seq(
      row(1L, "plain".getBytes("US-ASCII")),
      row(2L, "naïve café".getBytes("UTF-8")), // 2 two-byte seqs
      row(3L, new String(Character.toChars(0x10348)).getBytes("UTF-8")),
      row(4L, Array[Byte](0xC0.toByte, 0xAF.toByte)), // overlong '/'
      row(5L, Array[Byte](0xE0.toByte, 0x80.toByte, 0x80.toByte)), // overlong
      row(6L, Array[Byte](0xED.toByte, 0xA0.toByte, 0x80.toByte)), // surrogate
      row(7L, Array[Byte](0xF4.toByte, 0x90.toByte, 0x80.toByte, 0x80.toByte)), // > 10FFFF
      row(8L, Array[Byte](0xC3.toByte)), // truncated tail
      row(9L, Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
        "ok".getBytes("US-ASCII")),
      row(10L, Array[Byte](0xFE.toByte, 0xFF.toByte, 0, 'h')),
      row(11L, Array[Byte](0x80.toByte)) // stray continuation
    )
    val out = graft.multimodal.MultimodalOps.charsetSniff(
      cases.toDF("doc_id", "bytes"), "doc_id", "bytes")
      .collect().map(r => r.docId -> ((r.charset, r.nSeq))).toMap
    assert(out(1L) === (("ascii", 0L)))
    assert(out(2L) === (("utf8", 2L)))
    assert(out(3L) === (("utf8", 1L)), "4-byte supplementary is one seq")
    for (id <- Seq(4L, 5L, 6L, 7L, 8L, 11L))
      assert(out(id) === (("unknown-8bit", 0L)), s"case $id")
    assert(out(9L) === (("utf8-bom", 0L)))
    assert(out(10L) === (("utf16be-bom", 0L)))
  }

  test("WARC HTTP envelope: status line + case-insensitive Content-Type " +
    "parse, exact body split, malformed messages drop the record only") {
    import spark.implicits._
    import graft.multimodal.MultimodalOps
    import graft.sources.WarcCodec
    def warc(id: Long, msg: String): (Long, Array[Byte]) =
      (id, WarcCodec.buildWarc(Seq(
        ("response", s"https://s.org/$id", msg.getBytes("US-ASCII")))))
    val rows = MultimodalOps.warcHttpResponses(Seq(
      warc(1L, "HTTP/1.1 200 OK\r\ncontent-TYPE: text/html\r\n\r\n<p>a</p>"),
      warc(2L, "HTTP/1.0 404 Not Found\r\nX: y\r\n\r\nmissing"),
      warc(3L, "HTTP/1.1 301\r\nLocation: /x\r\n\r\n"),
      warc(4L, "ICY 200 OK\r\n\r\nnope"),          // not HTTP
      warc(5L, "HTTP/1.1 200 OK\r\nNo-Blank-Line: 1"), // unterminated
      warc(6L, "HTTP/1.1 20 OK\r\n\r\nshort code")  // 2-digit code
    ).toDF("doc_id", "bytes"), "doc_id", "bytes")
      .collect().map(r => r.docId ->
        ((r.status, r.contentType, r.body))).toMap
    assert(rows(1L) === ((200, "text/html", "<p>a</p>")),
      "case-insensitive header name, exact body split")
    assert(rows(2L) === ((404, "", "missing")))
    assert(rows(3L) === ((301, "", "")), "reasonless status line, empty body")
    assert(!rows.contains(4L) && !rows.contains(5L) && !rows.contains(6L),
      "malformed envelopes drop")
    // zero-header message is LEGAL HTTP: the status line's own CRLF
    // starts the blank-line terminator (eol == hdrEnd) — this once
    // threw StringIndexOutOfBounds and killed the task
    val zh = MultimodalOps.warcHttpResponses(Seq(
      warc(7L, "HTTP/1.1 200 OK\r\n\r\n<p>zero headers</p>"))
      .toDF("doc_id", "bytes"), "doc_id", "bytes").collect()
    assert(zh.length === 1 &&
      zh(0).status === 200 && zh(0).contentType === "" &&
      zh(0).body === "<p>zero headers</p>")
  }

  test("HTTP chunked transfer-encoding: framing is de-chunked exactly " +
    "(extensions + trailers hopped); truncated, oversized, bad-hex, and " +
    "trailing-garbage chunks drop the record; identity passes through; " +
    "undecodable encodings drop") {
    import spark.implicits._
    import graft.multimodal.MultimodalOps
    import graft.sources.WarcCodec
    def warc(id: Long, msg: String): (Long, Array[Byte]) =
      (id, WarcCodec.buildWarc(Seq(
        ("response", s"https://c.org/$id", msg.getBytes("US-ASCII")))))
    def chunkedMsg(body: String): String =
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + body
    val rows = MultimodalOps.warcHttpResponses(Seq(
      // 2 chunks + empty-trailer terminator
      warc(1L, chunkedMsg("5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n")),
      // chunk extension on the size line + a trailer field
      warc(2L, chunkedMsg("b;x=\"1\"\r\nhello world\r\n0\r\nX-T: v\r\n\r\n")),
      // case-insensitive TE header name and value
      warc(3L, "HTTP/1.1 200 OK\r\ntransfer-encoding: CHUNKED\r\n\r\n" +
        "3\r\nabc\r\n0\r\n\r\n"),
      // identity is a pass-through
      warc(4L, "HTTP/1.1 200 OK\r\nTransfer-Encoding: identity\r\n\r\nraw"),
      // hex sizes beyond one digit (0x10 = 16 bytes)
      warc(5L, chunkedMsg("10\r\n0123456789abcdef\r\n0\r\n\r\n")),
      // rejects: truncated data, size line without CRLF end, bad hex,
      // garbage after the last chunk, data not ending at its CRLF,
      // oversized size, undecodable encoding
      warc(10L, chunkedMsg("5\r\nhel")),
      warc(11L, chunkedMsg("5\r\nhello\r\n")),
      warc(12L, chunkedMsg("5g\r\nhello\r\n0\r\n\r\n")),
      warc(13L, chunkedMsg("3\r\nabc\r\n0\r\n\r\nextra")),
      warc(14L, chunkedMsg("2\r\nabc\r\n0\r\n\r\n")),
      warc(15L, chunkedMsg("ffffffffffffffff\r\nx\r\n0\r\n\r\n")),
      // Int.MaxValue-class declared size: the truncation guard must
      // use LONG arithmetic — p + n + 2 wrapping negative once threw
      // an uncaught IndexOutOfBounds and killed the task (review r14)
      warc(18L, chunkedMsg("7fffffff\r\nx\r\n0\r\n\r\n")),
      warc(19L, chunkedMsg("7ffffffa\r\nx\r\n0\r\n\r\n")),
      warc(16L, chunkedMsg("\r\nabc\r\n0\r\n\r\n")), // empty size
      warc(17L, "HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip, chunked" +
        "\r\n\r\n3\r\nabc\r\n0\r\n\r\n")
    ).toDF("doc_id", "bytes"), "doc_id", "bytes")
      .collect().map(r => r.docId -> ((r.body, r.chunked))).toMap
    assert(rows(1L) === (("hello world", true)))
    assert(rows(2L) === (("hello world", true)), "extension + trailer hop")
    assert(rows(3L) === (("abc", true)), "case-insensitive TE")
    assert(rows(4L) === (("raw", false)), "identity pass-through")
    assert(rows(5L) === (("0123456789abcdef", true)), "multi-digit hex")
    for (id <- (10L to 17L) ++ Seq(18L, 19L))
      assert(!rows.contains(id), s"case $id must drop the record")
  }

  test("WARC payload digests: Horner fold over exact payload slices, " +
    "identical across plain and gzip layouts, high bytes unsigned") {
    import spark.implicits._
    import graft.multimodal.MultimodalOps
    import graft.sources.WarcCodec
    // payload with bytes > 0x7F: the signed-byte trap
    val pay = Array.tabulate(9)(k => ((200 + k) % 251).toByte)
    def horner(bs: Array[Byte]): Long =
      bs.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    val recs = Seq(
      ("response", "https://d.org/a", pay),
      ("request", "https://d.org/a", pay.reverse),
      ("response", "https://d.org/b", pay)) // duplicate payload
    for (gz <- Seq(false, true)) {
      val rows = MultimodalOps.warcPayloadDigests(
        Seq((7L, WarcCodec.buildWarc(recs, gzipPerRecord = gz)))
          .toDF("doc_id", "bytes"), "doc_id", "bytes")
        .collect().sortBy(_.recIdx)
      assert(rows.map(_.digest).toSeq ===
        Seq(horner(pay), horner(pay.reverse), horner(pay)),
        s"gz=$gz digests")
      assert(rows(0).digest === rows(2).digest,
        "identical payloads collide (the dedup key)")
      assert(rows(0).digest !== rows(1).digest,
        "reversed payload differs (order-sensitive fold)")
      assert(rows.map(_.contentLength).toSeq === Seq(9L, 9L, 9L))
    }
  }

  test("MP3 frame walk: all three MPEG versions round-trip exact field " +
    "recovery incl. VBR average, ID3v2 syncsafe skip, Xing at the " +
    "version/mode side-info offset, ID3v1 trailer") {
    import graft.multimodal.Mp3Codec
    // MPEG-1, stereo, VBR 128/192, ID3 + Xing + TAG
    val a = Mp3Codec.buildMp3(3, 3, srIdx = 0, mono = false, nFrames = 6,
      kbpsIdx = i => if (i % 2 == 1) 11 else 9, pad = i => i % 2,
      withId3 = true, withXing = true, withTag = true)
    val ma = Mp3Codec.parseMp3(a).get
    assert(ma.version === "1" && ma.layer === 3 && ma.channels === 2 &&
      ma.sampleRate === 44100 && ma.nFrames === 6L)
    assert(ma.vbr && ma.hasId3 && ma.hasXing)
    assert(ma.avgKbps === (3 * 128 + 3 * 192) / 6)
    assert(ma.durationMs === 6L * 1152 * 1000 / 44100)
    assert(ma.nBytes === a.length.toLong)
    // MPEG-2 mono CBR — LSF: 576 samples/frame, 72000 length constant
    val b = Mp3Codec.buildMp3(2, 3, srIdx = 1, mono = true, nFrames = 4,
      kbpsIdx = _ => 8, pad = _ => 0)
    val mb = Mp3Codec.parseMp3(b).get
    assert(mb.version === "2" && mb.channels === 1 &&
      mb.sampleRate === 24000 && !mb.vbr && !mb.hasId3 && !mb.hasXing)
    assert(mb.durationMs === 4L * 576 * 1000 / 24000)
    assert(b.length === 4 * (72000 * 64 / 24000))
    // MPEG-2.5 — the de-facto extension rates
    val c = Mp3Codec.buildMp3(0, 3, srIdx = 2, mono = false, nFrames = 3,
      kbpsIdx = _ => 12, pad = i => 1 - i % 2)
    val mc = Mp3Codec.parseMp3(c).get
    assert(mc.version === "2.5" && mc.sampleRate === 8000 &&
      mc.nFrames === 3L)
  }

  test("MP3 frame walk: Layer I quad-slot and Layer II lengths hop " +
    "correctly") {
    import graft.multimodal.Mp3Codec
    val l1 = Mp3Codec.buildMp3(3, 1, srIdx = 1, mono = false, nFrames = 5,
      kbpsIdx = _ => 4, pad = i => i % 2) // 128 kbps L1
    val m1 = Mp3Codec.parseMp3(l1).get
    assert(m1.layer === 1 && m1.nFrames === 5L &&
      m1.durationMs === 5L * 384 * 1000 / 48000)
    val l2 = Mp3Codec.buildMp3(3, 2, srIdx = 0, mono = true, nFrames = 4,
      kbpsIdx = _ => 7, pad = _ => 0) // 112 kbps L2
    val m2 = Mp3Codec.parseMp3(l2).get
    assert(m2.layer === 2 && m2.nFrames === 4L &&
      m2.durationMs === 4L * 1152 * 1000 / 44100)
    // MPEG-2 (LSF) Layer I has its OWN 13818-3 bitrate table — idx 1
    // is 32 kbps there, not the L2/L3 table's 8: the frame length must
    // hop (12*32000/24000 + pad)*4 = 64-byte frames, which only works
    // if the right table is used on BOTH build and parse sides.
    val l1v2 = Mp3Codec.buildMp3(2, 1, srIdx = 1, mono = true, nFrames = 3,
      kbpsIdx = _ => 1, pad = _ => 0)
    assert(l1v2.length === 3 * 64, "LSF Layer I frame length")
    val m1v2 = Mp3Codec.parseMp3(l1v2).get
    assert(m1v2.version === "2" && m1v2.layer === 1 &&
      m1v2.avgKbps === 32L && m1v2.nFrames === 3L)
  }

  test("MP3: an ID3v2.4 tag WITH the footer flag skips header + body + " +
    "footer and the frames still parse") {
    import graft.multimodal.Mp3Codec
    val frames = Mp3Codec.buildMp3(3, 3, srIdx = 0, mono = false,
      nFrames = 2, kbpsIdx = _ => 9, pad = _ => 0)
    val body = Array.tabulate(30)(i => (i % 5).toByte)
    val tag = Array[Byte]('I', 'D', '3', 4, 0, 0x10, 0, 0, 0,
      body.length.toByte) ++ body ++
      (Array[Byte]('3', 'D', 'I', 4, 0, 0x10, 0, 0, 0,
        body.length.toByte))
    val m = Mp3Codec.parseMp3(tag ++ frames).get
    assert(m.hasId3 && m.nFrames === 2L && m.sampleRate === 44100)
  }

  test("MP3 frame walk rejects: truncation, sync loss, free-format and " +
    "invalid bitrate indices, reserved version/layer/rate, " +
    "mid-stream parameter change, empty stream") {
    import graft.multimodal.Mp3Codec
    val good = Mp3Codec.buildMp3(3, 3, srIdx = 0, mono = false,
      nFrames = 3, kbpsIdx = _ => 9, pad = _ => 0)
    assert(Mp3Codec.parseMp3(good).isDefined)
    assert(Mp3Codec.parseMp3(good.dropRight(5)).isEmpty, "truncated")
    val noSync = good.clone(); noSync(0) = 0x12
    assert(Mp3Codec.parseMp3(noSync).isEmpty, "sync loss")
    def hdr(b1: Int, b2: Int): Array[Byte] =
      Array(0xFF.toByte, b1.toByte, b2.toByte, 0x00.toByte)
    // free format (bitrate idx 0) and invalid idx 15
    assert(Mp3Codec.parseMp3(hdr(0xFB, 0x00)).isEmpty, "free format")
    assert(Mp3Codec.parseMp3(hdr(0xFB, 0xF0)).isEmpty, "bad bitrate")
    // reserved version (01), reserved layer (00), reserved rate (11)
    assert(Mp3Codec.parseMp3(hdr(0xEB, 0x90)).isEmpty, "reserved version")
    assert(Mp3Codec.parseMp3(hdr(0xF9, 0x90)).isEmpty, "reserved layer")
    assert(Mp3Codec.parseMp3(hdr(0xFB, 0x9C)).isEmpty, "reserved rate")
    // two self-consistent streams with different rates concatenated
    val other = Mp3Codec.buildMp3(3, 3, srIdx = 1, mono = false,
      nFrames = 2, kbpsIdx = _ => 9, pad = _ => 0)
    assert(Mp3Codec.parseMp3(good ++ other).isEmpty, "parameter change")
    assert(Mp3Codec.parseMp3(Array.emptyByteArray).isEmpty, "empty")
    assert(Mp3Codec.parseMp3("ID3".getBytes).isEmpty, "bare ID3 magic")
  }

  test("FLAC hardening: effective bit depths past 31 reject instead of " +
    "wrapping the Int planes; 31 itself decodes exactly") {
    // VERBATIM subframe header (pad 0 | type 000001 | wasted-flag 0)
    // = 0x02, then one raw ebps-bit sample, driven straight through
    // decodeSubframe (a real 32-bit stream can't be synthesized: the
    // encoder tops out below it by design)
    def sub(bps: Int, payload: Array[Byte]): Option[Array[Int]] =
      FlacCodec.decodeSubframe(
        new FlacCodec.BitR(Array[Byte](0x02) ++ payload, 0), 1, bps)
    assert(sub(32, Array.fill(5)(0x55.toByte)).isEmpty)
    assert(sub(33, Array.fill(6)(0x55.toByte)).isEmpty)
    val got = sub(31, Array.fill(5)(0x55.toByte))
    // first 31 bits of 0x55555555: sign 0, value 0x2AAAAAAA
    assert(got.isDefined && got.get.toSeq === Seq(0x2AAAAAAA))
  }

  test("FLAC residual coding paths: full-span Rice, partition orders " +
    "1-3, the 5-bit RICE2 parameter width, and the raw-bits ESCAPE " +
    "all round-trip bit-exactly") {
    val wild = sig(64, 13, 65536) // full 16-bit span residuals at order 0
    val enc = FlacCodec.buildFlac(8000, 1, wild, blockSize = 64,
      mode = "fixed0")
    assert(FlacCodec.decodeFlac(enc).get._2(0).toSeq ===
      wild.map(_.toInt).toSeq)
    val s = sig(128, 21, 3000)
    for (po <- 1 to 3; method <- 0 to 1) {
      val e = FlacCodec.buildFlac(8000, 1, s, blockSize = 128,
        mode = "fixed2", po = po, riceMethod = method)
      assert(FlacCodec.decodeFlac(e).get._2(0).toSeq ===
        s.map(_.toInt).toSeq, s"po=$po method=$method")
    }
    // ESCAPE: every partition coded as raw 18-bit signed residuals
    // (order-2 residuals of a 16-bit signal need up to 18 bits); also
    // with escapeBits wide enough at po=2, and the all-zero-residual
    // escapeBits=0 corner over a constant-slope signal
    for (po <- Seq(0, 2)) {
      val e = FlacCodec.buildFlac(8000, 1, s, blockSize = 128,
        mode = "fixed2", po = po, escapeBits = 18)
      assert(FlacCodec.decodeFlac(e).get._2(0).toSeq ===
        s.map(_.toInt).toSeq, s"escape po=$po")
    }
    val ramp = Array.tabulate(64)(i => (3 * i - 90).toShort) // fixed2 res = 0
    val e0 = FlacCodec.buildFlac(8000, 1, ramp, blockSize = 64,
      mode = "fixed2", escapeBits = 0)
    assert(FlacCodec.decodeFlac(e0).get._2(0).toSeq ===
      ramp.map(_.toInt).toSeq)
    // a RICE2 escape (5-bit all-ones parameter) decodes too
    val e2 = FlacCodec.buildFlac(8000, 1, s, blockSize = 128,
      mode = "fixed1", riceMethod = 1, escapeBits = 18)
    assert(FlacCodec.decodeFlac(e2).get._2(0).toSeq ===
      s.map(_.toInt).toSeq)
  }

  test("sniffFlac: STREAMINFO fields unpack from the fixed byte layout " +
    "without visiting frames; corrupt magic/short/lying-length reject") {
    val inter = Array.tabulate(2 * 123)(i =>
      (if (i % 2 == 0) 99 else -5).toShort)
    val enc = FlacCodec.buildFlac(22050, 2, inter, blockSize = 64)
    val m = MediaCodecs.sniffMeta(enc).get
    assert(m.kind === "audio" && m.channels === Some(2) &&
      m.sampleRate === Some(22050) && m.codec === Some("flac") &&
      m.durationMs === Some(123 * 1000 / 22050))
    // header-only: truncating to the metadata region still sniffs
    assert(MediaCodecs.sniffMeta(enc.take(4 + 4 + 34)).isDefined)
    val badMagic = enc.clone(); badMagic(2) = 'x'.toByte
    assert(MediaCodecs.sniffMeta(badMagic).isEmpty)
    assert(MediaCodecs.sniffMeta(enc.take(20)).isEmpty)
    val lyingLen = enc.clone(); lyingLen(7) = 5.toByte // STREAMINFO len < 34
    assert(MediaCodecs.sniffMeta(lyingLen).isEmpty)
  }

  test("transcodeFlacToWav: the transcoded WAV parses to exactly the " +
    "direct PCM encode of the same signal; corrupt FLAC drops") {
    import spark.implicits._
    val n = 50
    val inter = Array.tabulate(2 * n)(i =>
      (if (i % 2 == 0) (i / 2 - 25) * 100 else 77).toShort)
    val flac = FlacCodec.buildFlac(12000, 2, inter, blockSize = 32,
      assignment = FlacCodec.ChLeftSide)
    val direct = MediaCodecs.parseWav(
      MediaCodecs.buildWav(12000, 2, inter)).get
    val bad = flac.clone(); bad(5) = (bad(5) ^ 0x7).toByte
    val rows = MultimodalOps.transcodeFlacToWav(
      Seq((1L, flac), (2L, bad)).toDF("doc_id", "bytes"),
      "doc_id", "bytes").collect()
    assert(rows.length === 1 && rows(0).docId === 1L)
    assert(rows(0).sampleRate === direct.sampleRate &&
      rows(0).channels === direct.channels &&
      rows(0).nSamples === direct.nSamples &&
      rows(0).sumSquares === direct.sumSquares)
  }

  test("decodeFlacChannels: dataset wrapper drops corrupt blobs and " +
    "reports per-channel features matching the WAV crossing rule") {
    import spark.implicits._
    val n = 40
    val inter = Array.tabulate(2 * n)(i =>
      if (i % 2 == 0) { if ((i / 2) % 2 == 0) 7.toShort else (-7).toShort }
      else 3.toShort)
    val good = FlacCodec.buildFlac(8000, 2, inter, blockSize = 16,
      assignment = FlacCodec.ChMidSide)
    val bad = good.clone(); bad(0) = 'x'.toByte
    val df = Seq((1L, good), (2L, bad)).toDF("doc_id", "bytes")
    val rows = MultimodalOps.decodeFlacChannels(df, "doc_id", "bytes")
      .collect().sortBy(r => (r.docId, r.channel))
    assert(rows.length === 2) // doc 2 dropped
    assert(rows(0).docId === 1L && rows(0).channel === 0 &&
      rows(0).nSamples === n.toLong &&
      rows(0).sumSquares === n.toLong * 49 &&
      rows(0).peak === 7 && rows(0).zeroCrossings === (n - 1).toLong)
    assert(rows(1).channel === 1 && rows(1).sumSquares === n.toLong * 9 &&
      rows(1).peak === 3 && rows(1).zeroCrossings === 0L)
  }
}
