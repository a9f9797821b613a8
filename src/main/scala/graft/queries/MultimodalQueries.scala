package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.multimodal.MultimodalOps

/** Multimodal-column queries. No binary table ships in the testdata, so
  * `documents.text` (pure-ASCII synthetic text) cast to binary stands in
  * for media blobs — the point is the Spark-side plumbing: binary columns,
  * metadata structs, frame explode shape. The decode stubs are
  * deterministic arithmetic (clearly marked in MultimodalOps), which also
  * makes them SQL-expressible for the oracle.
  */
object MultimodalQueries {

  val FrameBytes = 64
  val EveryK = 2

  val defs: Seq[QueryDef] = Seq(

    // Decode-metadata stub over blobs: narrow map, no shuffle.
    QueryDef("mm_decode_meta",
      (s, d) => Tables.documents(s, d)
        .withColumn("bytes", col("text").cast("binary"))
        .withColumn("meta", MultimodalOps.decodeImageMetaStub("bytes"))
        .select(col("doc_id"), length(col("bytes")).as("n_bytes"),
          col("meta.kind").as("kind"), col("meta.width").as("width"),
          col("meta.height").as("height")),
      Some("""SELECT doc_id, CAST(len(text) AS INT) AS n_bytes, 'image' AS kind,
             | CAST(len(text) % 640 + 16 AS INT) AS width,
             | CAST(ascii(substr(text, 1, 1)) % 480 + 16 AS INT) AS height
             | FROM documents ORDER BY doc_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("doc_id")),

    // Frame-sampling stub: blob → every-k-th fixed-size frame slice,
    // exploded one row per sampled frame (the per-frame fan-out shape a
    // video pipeline needs before feature extraction).
    QueryDef("mm_frame_sample",
      (s, d) => MultimodalOps.frameSampleStub(
          Tables.documents(s, d).withColumn("bytes", col("text").cast("binary")),
          "doc_id", "bytes", frameBytes = FrameBytes, everyK = EveryK)
        .select(col("doc_id"), col("sample_idx"), col("frame_idx"),
          length(col("frame_bytes")).as("frame_len")),
      Some(s"""WITH m AS (SELECT doc_id, text,
              |  greatest(1, len(text) // $FrameBytes) AS nf FROM documents),
              | s AS (SELECT doc_id, text, unnest(range(0, (nf - 1) // $EveryK + 1)) AS raw FROM m)
              | SELECT doc_id, CAST(raw AS INT) AS sample_idx,
              |  CAST(raw * $EveryK AS INT) AS frame_idx,
              |  CAST(len(substr(text, CAST(raw * $EveryK * $FrameBytes + 1 AS INT), $FrameBytes)) AS INT) AS frame_len
              | FROM s ORDER BY doc_id, sample_idx""".stripMargin.replace("\n", "")),
      presentOrder = Seq("doc_id", "sample_idx")),

    // Audio windowing — the PCM sibling of mm_frame_sample: bytes read
    // as 16-bit/8 kHz samples, cut into 1-second windows, one row per
    // window with its sample offset and length. Pure integer arithmetic
    // over blob lengths (ceil spelled (a+b-1) div b), narrow explode,
    // blobs never shuffled.
    QueryDef("mm_audio_windows",
      (s, d) => Tables.documents(s, d)
        .withColumn("bytes", col("text").cast("binary"))
        .withColumn("n_samples", (length(col("bytes")).cast("long") / 2).cast("long"))
        .withColumn("n_windows", expr("greatest(1L, (n_samples + 7999) div 8000)"))
        .withColumn("win", explode(expr("sequence(0L, n_windows - 1)")))
        .select(col("doc_id"), col("win").cast("int").as("win"),
          (col("win") * 8000).cast("long").as("start_sample"),
          least(lit(8000L), col("n_samples") - col("win") * 8000)
            .as("win_samples")),
      Some("""WITH m AS (SELECT doc_id,
             |  CAST(len(text) // 2 AS BIGINT) AS n_samples FROM documents),
             | w AS (SELECT doc_id, n_samples,
             |  unnest(range(0, greatest(1, (n_samples + 7999) // 8000))) AS win
             |  FROM m)
             | SELECT doc_id, CAST(win AS INT) AS win,
             |  CAST(win * 8000 AS BIGINT) AS start_sample,
             |  CAST(least(8000, n_samples - win * 8000) AS BIGINT) AS win_samples
             | FROM w ORDER BY doc_id, win""".stripMargin.replace("\n", "")),
      presentOrder = Seq("doc_id", "win")),

    // Feature-extraction stub via partition-batched mapPartitions. The
    // fake is a 60-bit md5 checksum + power-of-two-scaled float
    // components — bit-reproducible in DuckDB (md5 + integer shifts +
    // exact float arithmetic), so the batched-UDF plumbing is checked by
    // the full oracle gate, feature values included (emitted as scalar
    // float columns; documents.text is pure ASCII so VARCHAR md5 ==
    // binary md5).
    QueryDef("mm_embed_features",
      (s, d) => MultimodalOps.extractFeaturesStub(
          Tables.documents(s, d).withColumn("bytes", col("text").cast("binary")),
          "doc_id", "bytes")
        .toDF()
        .select(Seq(col("mediaId").as("media_id"), col("nBytes").as("n_bytes"),
          col("checksum")) ++
          (0 until 8).map(i => element_at(col("feature"), i + 1).as(s"f$i")): _*),
      Some {
        val fs = (0 until 8).map(i =>
          s"CAST(((checksum >> ${i * 7}) & 65535) / 65536.0 * 2 - 1 AS FLOAT) AS f$i")
          .mkString(", ")
        s"""WITH c AS (SELECT doc_id AS media_id, CAST(len(text) AS INT) AS n_bytes,
            CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS checksum
            FROM documents)
            SELECT media_id, n_bytes, checksum, $fs
            FROM c ORDER BY media_id"""
      },
      presentOrder = Seq("media_id"))
  )
}
