package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata structs, plus decode / feature-extract /
  * resize / frame-sample operators.
  *
  * Codec status: WAV (RIFF/PCM), BMP, and PNG (zlib DEFLATE + full
  * filter reconstruction) decode are REAL — parsed by [[MediaCodecs]]
  * with no library beyond java.util.zip, gated end to end by
  * `mm_wav_decode`/`mm_bmp_decode`/`mm_png_decode`. LOSSY compressed
  * formats (JPEG/MP4) need codec libraries this environment lacks, so
  * the remaining `*Stub` operators are clearly-marked deterministic fakes deriving
  * plausible metadata/features from the bytes via stable arithmetic. For
  * the stubs the Spark-side contract — schema, binary column handling,
  * partition-batched execution shape, null/short-input behavior — is
  * real and tested; swap the stub body for a codec call (e.g.
  * javax.imageio / ffmpeg bindings) without touching any plan structure.
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
    StructField("n_frames", IntegerType)))    // video only

  case class MediaFeature(mediaId: Long, nBytes: Int, checksum: Long,
                          feature: Array[Float])

  /** STUB decode — deterministic fake metadata from the blob bytes.
    * Real implementation would parse the container header. Expressed as
    * narrow column ops (codegen-friendly), so the fake is also
    * SQL-expressible for the oracle gate. */
  def decodeImageMetaStub(bytesCol: String): org.apache.spark.sql.Column = {
    // ??? real codec goes here; fake: dimensions from byte length + first byte.
    val n = length(col(bytesCol))
    struct(
      lit("image").as("kind"),
      (n % 640 + 16).cast("int").as("width"),
      (pmod(ascii(substring(col(bytesCol).cast("string"), 1, 1)), lit(480)) + 16).cast("int").as("height"),
      lit(3).cast("int").as("channels"),
      lit(null).cast("int").as("sample_rate"),
      lit(null).cast("int").as("n_frames"))
  }

  /** STUB feature extraction — partition-batched `mapPartitions` with an
    * explicit batch size: the real implementation would hand each batch of
    * blobs to a native/codec library in one call (amortizing per-call
    * overhead), which is exactly the shape this preserves. The fake
    * derives a `dim`-wide float vector from a 60-bit md5 checksum of the
    * bytes, with power-of-two scaling so every component is exactly
    * representable — the fake is therefore bit-reproducible in ANY engine
    * (md5 + integer shifts + exact float arithmetic), letting the oracle
    * gate check this operator's output end to end. */
  def extractFeaturesStub(media: DataFrame, idCol: String, bytesCol: String,
                          dim: Int = 8, batchSize: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.grouped(batchSize).flatMap { batch =>
          // ??? real batched codec/model call goes here; deterministic fake:
          batch.map { case (id, bytes) =>
            val bs = if (bytes == null) Array.empty[Byte] else bytes
            val hex = md.digest(bs).map("%02x".format(_)).mkString.take(15)
            val acc = java.lang.Long.parseLong(hex, 16) // 60-bit, positive
            val feat = Array.tabulate(dim) { i =>
              ((acc >>> (i * 7)) & 0xffff).toFloat / 65536f * 2f - 1f
            }
            MediaFeature(id, bs.length, acc, feat)
          }
        }
      }
  }

  /** STUB resize — keeps the plumbing honest: output is again a binary
    * column + updated metadata; the fake truncates bytes proportionally. */
  def resizeStub(media: DataFrame, bytesCol: String, metaCol: String,
                 newWidth: Int, newHeight: Int): DataFrame = {
    // ??? real resample goes here; fake keeps a proportional prefix.
    media
      .withColumn("__scale",
        least(lit(1.0), lit(newWidth * newHeight).cast("double") /
          (col(s"$metaCol.width") * col(s"$metaCol.height"))))
      .withColumn(bytesCol,
        expr(s"substring($bytesCol, 1, greatest(1, CAST(length($bytesCol) * __scale AS INT)))"))
      .withColumn(metaCol, struct(
        col(s"$metaCol.kind"),
        lit(newWidth).cast("int").as("width"),
        lit(newHeight).cast("int").as("height"),
        col(s"$metaCol.channels"),
        col(s"$metaCol.sample_rate"),
        col(s"$metaCol.n_frames")))
      .drop("__scale")
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
