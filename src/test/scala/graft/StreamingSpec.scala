package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.Schemas
import graft.streaming.{EgvStreams, IdempotentBulkSink, InMemoryBulkClient, StatefulOps}

/** End-to-end streaming tests: MemoryStream in, memory/foreachBatch sink
  * out — the Spark analog of the reference's TopologyTestDriver pipe-in /
  * read-out pattern (SURVEY.md §5.2). */
class StreamingSpec extends SparkSpec {

  /** Kafka-source-shaped record: (key, value, timestamp). */
  case class KafkaRec(key: String, value: String, timestamp: Timestamp)

  private def egvJson(value: Int, systemTime: String): String =
    s"""{"systemTime":"$systemTime","displayTime":"$systemTime","value":$value,
        "realtimeValue":$value,"smoothedValue":$value,"status":"ok",
        "trend":"flat","trendRate":0.5}""".replaceAll("\n\\s*", "")

  test("filter-high topology end-to-end: pipe 3 EGVs, only 265 survives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KafkaRec]
    val parsed = EgvStreams.parseEgvs(in.toDF())
    val out = EgvStreams.filterHighTopology(parsed)
    val q = out.writeStream.format("memory").queryName("high_egvs")
      .outputMode("append").start()
    in.addData(
      KafkaRec("robert", egvJson(65, "2020-11-02T02:00:00"), Timestamp.valueOf("2020-11-02 02:00:00")),
      KafkaRec("robert", egvJson(100, "2020-11-02T02:05:00"), Timestamp.valueOf("2020-11-02 02:05:00")),
      KafkaRec("robert", egvJson(265, "2020-11-02T02:10:00"), Timestamp.valueOf("2020-11-02 02:10:00")))
    q.processAllAvailable(); q.stop()
    val vals = spark.table("high_egvs").select("value").collect().map(_.getInt(0))
    assert(vals.toSeq === Seq(265))
  }

  test("categorize-lookup topology end-to-end reproduces reference asserts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KafkaRec]
    val ranges = Schemas.fixtureRanges
      .map(r => (r.rangeId, r.startSec, r.endSec, r.lowerBound, r.upperBound))
      .toDF("range_id", "start_sec", "end_sec", "lower_bound", "upper_bound")
    val out = EgvStreams.categorizeLookupTopology(
      EgvStreams.parseEgvs(in.toDF()), ranges)
    val q = out.writeStream.format("memory").queryName("categorized")
      .outputMode("append").start()
    in.addData(
      KafkaRec("robert", egvJson(75, "2020-11-02T02:00:00"), new Timestamp(0)),
      KafkaRec("robert", egvJson(100, "2020-11-02T12:00:00"), new Timestamp(1)),
      KafkaRec("robert", egvJson(265, "2020-11-02T19:00:00"), new Timestamp(2)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("categorized").select("value", "range_id", "in_range")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(got === Set((75, 1, "false"), (100, 2, "true"), (265, 2, "false")))
  }

  test("windowed counts with watermark aggregate per 10-minute window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KafkaRec]
    val out = EgvStreams.windowedCounts(EgvStreams.parseEgvs(in.toDF()))
    val q = out.writeStream.format("memory").queryName("windowed")
      .outputMode("complete").start()
    in.addData(
      KafkaRec("r", egvJson(100, "2020-11-02T02:01:00"), new Timestamp(0)),
      KafkaRec("r", egvJson(110, "2020-11-02T02:09:00"), new Timestamp(1)),
      KafkaRec("r", egvJson(120, "2020-11-02T02:11:00"), new Timestamp(2)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("windowed")
      .select(col("window_start").cast("string"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === Map("2020-11-02 02:00:00" -> 2L, "2020-11-02 02:10:00" -> 1L))
  }

  test("stateful deltas per user via flatMapGroupsWithState") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StatefulOps.Reading]
    val out = StatefulOps.deltasPerUser(in.toDS())
    val q = out.toDF().writeStream.format("memory").queryName("deltas")
      .outputMode("append").start()
    // Two micro-batches: state must carry 130 across the batch boundary.
    in.addData(
      StatefulOps.Reading("u1", Timestamp.valueOf("2020-11-02 02:00:00"), 100),
      StatefulOps.Reading("u1", Timestamp.valueOf("2020-11-02 02:05:00"), 130))
    q.processAllAvailable()
    in.addData(
      StatefulOps.Reading("u1", Timestamp.valueOf("2020-11-02 02:10:00"), 95),
      StatefulOps.Reading("u2", Timestamp.valueOf("2020-11-02 02:10:00"), 80))
    q.processAllAvailable(); q.stop()
    val got = spark.table("deltas")
      .select("userId", "value", "delta")
      .collect().map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSet
    assert(got === Set(
      ("u1", 100, None), ("u1", 130, Some(30)), ("u1", 95, Some(-35)),
      ("u2", 80, None)))
  }

  test("stateful deltas via transformWithState (state API v2) match the v1 path") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[StatefulOps.Reading]
      val out = StatefulOps.deltasPerUserV2(in.toDS())
      val q = out.toDF().writeStream.format("memory").queryName("deltas_v2")
        .outputMode("append").start()
      in.addData(
        StatefulOps.Reading("u1", Timestamp.valueOf("2020-11-02 02:00:00"), 100),
        StatefulOps.Reading("u1", Timestamp.valueOf("2020-11-02 02:05:00"), 130))
      q.processAllAvailable()
      in.addData(
        StatefulOps.Reading("u1", Timestamp.valueOf("2020-11-02 02:10:00"), 95),
        StatefulOps.Reading("u2", Timestamp.valueOf("2020-11-02 02:10:00"), 80))
      q.processAllAvailable(); q.stop()
      val got = spark.table("deltas_v2")
        .select("userId", "value", "delta")
        .collect().map(r => (r.getString(0), r.getInt(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSet
      // identical rows to the flatMapGroupsWithState path's assert set
      assert(got === Set(
        ("u1", 100, None), ("u1", 130, Some(30)), ("u1", 95, Some(-35)),
        ("u2", 80, None)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming dedup within watermark drops cross-batch duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KafkaRec]
    val out = EgvStreams.streamingDedup(
      EgvStreams.parseEgvs(in.toDF()).select(col("key"), col("systemTime"), col("value"), col("systemTs")),
      Seq("key", "systemTime"), "systemTs", "1 hour")
    val q = out.writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    in.addData(
      KafkaRec("robert", egvJson(100, "2020-11-02T02:00:00"), new Timestamp(0)),
      KafkaRec("robert", egvJson(100, "2020-11-02T02:00:00"), new Timestamp(1))) // in-batch dup
    q.processAllAvailable()
    in.addData(
      KafkaRec("robert", egvJson(100, "2020-11-02T02:00:00"), new Timestamp(2)), // cross-batch dup
      KafkaRec("robert", egvJson(110, "2020-11-02T02:05:00"), new Timestamp(3))) // new reading
    q.processAllAvailable(); q.stop()
    val got = spark.table("deduped").select("systemTime").collect().map(_.getString(0))
    assert(got.sorted.toSeq === Seq("2020-11-02T02:00:00", "2020-11-02T02:05:00"))
  }

  test("distributed bulk sink: executor-side partitions write the same docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    InMemoryBulkClient.store.clear()
    val in = MemoryStream[KafkaRec]
    val parsed = EgvStreams.parseEgvs(in.toDF())
      .select(col("key"), col("value"), col("systemTime"))
      .repartition(4) // force multi-partition executor-side writes
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dist-ckpt").toString
    val q = parsed.writeStream
      .foreachBatch(IdempotentBulkSink.writeBatchDistributed(
        () => InMemoryBulkClient, Seq("key", "systemTime"), bulkSize = 2) _)
      .option("checkpointLocation", ckpt)
      .start()
    in.addData((1 to 10).map(i =>
      KafkaRec("u" + i % 3, egvJson(100 + i, f"2020-11-02T02:${i}%02d:00"), new Timestamp(i))): _*)
    q.processAllAvailable(); q.stop()
    assert(InMemoryBulkClient.store.size() === 10)
    assert(InMemoryBulkClient.store.containsKey("2:u1_19:2020-11-02T02:01:00"))
  }

  test("stream-stream interval join with watermark-bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Both sides watermarked + a time-range condition: Spark can bound the
    // join state store (drop left/right rows older than watermark+range)
    // instead of retaining both streams forever — the scale contract for
    // stream-stream joins.
    val alerts = MemoryStream[(String, Timestamp)]
    val readings = MemoryStream[(String, Timestamp, Int)]
    val a = alerts.toDF().toDF("a_user", "a_ts").withWatermark("a_ts", "10 minutes")
    val r = readings.toDF().toDF("r_user", "r_ts", "value").withWatermark("r_ts", "10 minutes")
    val joined = a.join(r, expr(
      "a_user = r_user AND r_ts BETWEEN a_ts - INTERVAL 5 MINUTES AND a_ts"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    def ts(m: Int) = Timestamp.valueOf(f"2020-11-02 02:$m%02d:00")
    alerts.addData(("robert", ts(10)))
    readings.addData(
      ("robert", ts(7), 101),  // within [02:05, 02:10] -> joins
      ("robert", ts(10), 102), // boundary inclusive -> joins
      ("robert", ts(2), 103),  // too early -> no
      ("robert", ts(12), 104), // after the alert -> no
      ("other", ts(8), 105))   // different key -> no
    q.processAllAvailable(); q.stop()
    val got = spark.table("ssjoin").select("value").collect().map(_.getInt(0)).toSet
    assert(got === Set(101, 102))
  }

  test("gap-dedup streaming twin matches the gated batch query across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, hm: String) =
      StatefulOps.KeyedEvent("robert", Timestamp.valueOf(s"2020-11-02 $hm:00"), id)
    // 30-min horizon: e1 keep (no prev), e2 gap 600s drop, e3 gap 2400s
    // keep, e4 gap 900s drop — e3/e4 arrive in a LATER micro-batch so the
    // kept/dropped decision must flow through the per-key state.
    val batch1 = Seq(ev(1, "02:00"), ev(2, "02:10"))
    val batch2 = Seq(ev(3, "02:50"), ev(4, "03:05"))
    val in = MemoryStream[StatefulOps.KeyedEvent]
    val q = StatefulOps.gapDedup(in.toDS(), horizonSec = 1800)
      .writeStream.format("memory").queryName("gap_dedup").outputMode("append").start()
    in.addData(batch1: _*); q.processAllAvailable()
    in.addData(batch2: _*); q.processAllAvailable(); q.stop()
    val streamed = spark.table("gap_dedup").select("eventId")
      .collect().map(_.getLong(0)).toSet
    // The gated batch twin's expression over the same rows.
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("ts"), col("eventId"))
    val batched = (batch1 ++ batch2).toDS().toDF()
      .withColumn("__prev", lag(col("ts"), 1).over(byKey))
      .filter(col("__prev").isNull ||
        col("ts").cast("long") - col("__prev").cast("long") > 1800)
      .select("eventId").collect().map(_.getLong(0)).toSet
    assert(streamed === Set(1L, 3L))
    assert(streamed === batched)
  }

  test("span-dedup streaming twin: union of hits equals the batch rewrite's removal set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val run = "one two three four five six seven eight" // SpanLen = 8 tokens
    val docsSeq = Seq(
      (0L, s"$run nine ten"),                // canonical holder
      (1L, s"zzz yyy $run extra tail here"), // cross-doc duplicate
      (9L, s"$run filler $run"))             // later batch; same-doc repeat
    val docs = docsSeq.toDF("doc_id", "text")
    // Derive the window rows exactly as the batch grams stage does.
    val grams = docs
      .withColumn("__toks", graft.ops.TextOps.tokens(col("text")))
      .select(col("doc_id"), posexplode(expr(
        """CASE WHEN size(__toks) < 8 THEN CAST(array() AS ARRAY<STRING>)
           ELSE transform(sequence(0, size(__toks) - 8),
             j -> concat_ws(' ', slice(__toks, j + 1, 8))) END""")))
      .select(col("doc_id"), col("pos"),
        graft.ops.TextOps.hash64(col("col")).as("h"))
      .collect()
      .map(r => StatefulOps.SpanWindow(r.getLong(0), r.getInt(1), r.getLong(2)))
    val byDoc = grams.groupBy(_.docId)
    val in = MemoryStream[StatefulOps.SpanWindow]
    val q = StatefulOps.streamingSpanDedup(in.toDS())
      .writeStream.format("memory").queryName("span_twin")
      .outputMode("append").start()
    // Docs arrive in id order (the documented parity contract), split so
    // the doc-9 verdicts must flow through cross-batch state.
    in.addData(byDoc(0L).toSeq ++ byDoc(1L).toSeq: _*); q.processAllAvailable()
    in.addData(byDoc(9L).toSeq: _*); q.processAllAvailable()
    // At-least-once replay: the canonical must not move, no self-hits —
    // re-emitted dup hits are absorbed by the downstream set-union.
    in.addData(byDoc(9L).toSeq: _*); q.processAllAvailable(); q.stop()
    val hits = spark.table("span_twin").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val streamedRemoved: Map[Long, Long] = hits.toSeq
      .flatMap { case (d, p) => (p until p + 8).map(d -> _) }
      .distinct.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      .withDefaultValue(0L)
    val batch = graft.ops.DedupOps.spanRewrite(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    docsSeq.foreach { case (id, _) =>
      assert(streamedRemoved(id) === batch(id), s"doc $id removal mismatch") }
    // The canonical holder lost nothing; the repeat doc lost both copies'
    // positions (0..7 and 9..16).
    assert(streamedRemoved(0L) === 0L && streamedRemoved(9L) === 16L)
    // Attribution parity with the GATED batch twin: the streamed hit
    // rows (with canonical sites) equal stream_span_marks exactly.
    val streamedFull = spark.table("span_twin").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    val marks = graft.ops.DedupOps.spanMarks(docs, "text", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    assert(streamedFull === marks)
  }

  test("stream-stream interval join emits exactly its gated batch twin's rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = Timestamp.valueOf(f"2020-11-02 02:$m%02d:00")
    // (user, ts, value, event_id) — alerts are value >= 200, the same
    // predicate + 10-minute preceding range as stream_interval_join.
    val rows = Seq(
      ("robert", ts(0), 210, 1L), ("robert", ts(5), 100, 2L),
      ("robert", ts(12), 250, 3L), ("robert", ts(15), 120, 4L),
      ("robert", ts(40), 130, 5L), ("other", ts(5), 300, 6L),
      ("other", ts(9), 90, 7L))
    val cond = expr("user_id = a_user AND a_ts <= ts AND a_ts >= ts - INTERVAL 10 MINUTES")
    def pairs(e: org.apache.spark.sql.DataFrame,
              a: org.apache.spark.sql.DataFrame) =
      e.join(a, cond).filter(col("event_id") =!= col("alert_id"))
        .select(col("event_id"), col("alert_id"))
    val ein = MemoryStream[(String, Timestamp, Int, Long)]
    val ain = MemoryStream[(String, Timestamp, Int, Long)]
    val es = ein.toDF().toDF("user_id", "ts", "value", "event_id")
      .withWatermark("ts", "20 minutes")
    val as = ain.toDF().toDF("a_user", "a_ts", "a_value", "alert_id")
      .filter(col("a_value") >= 200).withWatermark("a_ts", "20 minutes")
    val q = pairs(es, as).writeStream.format("memory").queryName("ssjoin_twin")
      .outputMode("append").start()
    ein.addData(rows: _*); ain.addData(rows: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ssjoin_twin")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val eb = rows.toDF("user_id", "ts", "value", "event_id")
    val ab = rows.toDF("a_user", "a_ts", "a_value", "alert_id")
      .filter(col("a_value") >= 200)
    val batched = pairs(eb, ab)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batched)
    assert(streamed.nonEmpty && streamed.contains((2L, 1L)))
  }

  test("mid-stream range update takes effect for subsequent batches (KTable semantics)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The reference's ranges KTable is a changelog: an update consumed
    // mid-stream re-categorizes everything after it in offset order
    // (CategorizeWithKTableLookup.java:59-62). Batch-aligned here
    // (SURVEY §7.3.1): each micro-batch rebuilds the latest-by-key range
    // snapshot from the accumulated changelog via latestByKeyBatch and
    // joins against THAT, so an update lands exactly at a batch boundary.
    val in = MemoryStream[KafkaRec]
    val changelog = scala.collection.mutable.ArrayBuffer[(Int, Int, Int, Int, Int, Long)]()
    Schemas.fixtureRanges.zipWithIndex.foreach { case (r, i) =>
      changelog += ((r.rangeId, r.startSec, r.endSec, r.lowerBound, r.upperBound, i.toLong))
    }
    val results = scala.collection.mutable.ArrayBuffer[(Long, Int, String)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ktable-ckpt").toString
    val q = EgvStreams.parseEgvs(in.toDF()).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val snapshot = EgvStreams.latestByKeyBatch(
          changelog.toSeq.toDF("range_id", "start_sec", "end_sec",
            "lower_bound", "upper_bound", "offset"),
          Seq("range_id"), "offset", "offset").drop("offset")
        EgvStreams.categorizeLookupTopology(batch, snapshot)
          .select("value", "in_range").collect()
          .foreach(r => results += ((batchId, r.getInt(0), r.getString(1))))
      }
      .option("checkpointLocation", ckpt)
      .start()
    // Batch 0: noon reading of 100 against fixture range 2 [70,180] -> true.
    in.addData(KafkaRec("robert", egvJson(100, "2020-11-02T12:00:00"), new Timestamp(0)))
    q.processAllAvailable()
    // Mid-stream update at offset 3: range 2 narrows to [110,180]
    // (latest offset wins in the KTable view).
    changelog += ((2, 6 * 3600, 22 * 3600 - 1, 110, 180, 3L))
    in.addData(KafkaRec("robert", egvJson(100, "2020-11-02T12:00:00"), new Timestamp(1)))
    q.processAllAvailable(); q.stop()
    val byBatch = results.groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSeq).toMap
    assert(byBatch(0L) === Seq(100 -> "true"))
    assert(byBatch(1L) === Seq(100 -> "false"))
  }

  test("file stream with maxFilesPerTrigger bounds each micro-batch (backpressure)") {
    import org.apache.spark.sql.types._
    // The ingestion-rate knob a 100 TB backfill needs: without a per-batch
    // cap, the first trigger of a large directory becomes one giant batch.
    val dir = java.nio.file.Files.createTempDirectory("graft-backfill").toString
    for (i <- 1 to 3)
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, s"f$i.json"),
        s"""{"id": $i}\n""".getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("id", LongType)))
    val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").json(dir)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = b.count(); if (n > 0) batchSizes.synchronized { batchSizes += n }
        ()
      }
      .start()
    q.processAllAvailable(); q.stop()
    assert(batchSizes.sum === 3)
    assert(batchSizes.forall(_ === 1L), s"expected 1 file per batch, got $batchSizes")
  }

  test("kafka sink options match the reference producer knobs") {
    // ProducerDexcom.java:66-89 — idempotence, acks=all, snappy
    // compression, linger.ms=20, batch.size=32768. format("kafka") cannot
    // resolve here (no connector jar), so the guard pins the options map
    // itself: drift from the reference's delivery contract fails this.
    assert(EgvStreams.kafkaProducerOptions === Map(
      "kafka.enable.idempotence" -> "true",
      "kafka.acks" -> "all",
      "kafka.compression.type" -> "snappy",
      "kafka.linger.ms" -> "20",
      "kafka.batch.size" -> "32768"))
  }

  test("docId: key values containing the separator cannot collide") {
    import spark.implicits._
    val ids = Seq(("a_b", "c"), ("a", "b_c")).toDF("k1", "k2")
      .select(IdempotentBulkSink.docId(Seq("k1", "k2")).as("id"))
      .collect().map(_.getString(0)).toSet
    assert(ids === Set("3:a_b_1:c", "1:a_3:b_c"))
  }

  test("idempotent bulk sink: batch replay after failure does not duplicate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    InMemoryBulkClient.store.clear()
    val in = MemoryStream[KafkaRec]
    val parsed = EgvStreams.parseEgvs(in.toDF())
      .select(col("key"), col("value"), col("systemTime"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sink-ckpt").toString
    def start() = parsed.writeStream
      .foreachBatch(IdempotentBulkSink.writeBatch(
        InMemoryBulkClient, Seq("key", "systemTime")) _)
      .option("checkpointLocation", ckpt)
      .start()

    // Batch 1 fails mid-write: offsets NOT committed.
    InMemoryBulkClient.failNextBatches = 1
    in.addData(
      KafkaRec("robert", egvJson(100, "2020-11-02T02:00:00"), new Timestamp(0)),
      KafkaRec("robert", egvJson(265, "2020-11-02T02:05:00"), new Timestamp(1)))
    val q1 = start()
    intercept[Exception] { q1.processAllAvailable() }
    q1.stop()
    // Restart from the same checkpoint: the SAME batch replays with the
    // SAME deterministic ids -> upsert, no duplicates.
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    assert(InMemoryBulkClient.store.size() === 2)
    assert(InMemoryBulkClient.store.containsKey("6:robert_19:2020-11-02T02:00:00"))
  }

  test("heavy-hitters sketch as streaming state: final top-k equals batch exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The sketch's merge/reduce make it per-key streaming state: each
    // micro-batch folds its terms into the stored buffer; the emitted
    // top-k converges to the full-stream answer. Bounded state by
    // construction (capacity entries per key), unlike an exact per-term
    // count map that grows with vocabulary.
    val agg = new graft.catalyst.TopKSketchAgg(32)
    val batch1 = Seq("en" -> "alpha", "en" -> "alpha", "en" -> "beta",
      "de" -> "eins", "de" -> "zwei")
    val batch2 = Seq("en" -> "beta", "en" -> "beta", "en" -> "beta",
      "de" -> "eins", "de" -> "eins")
    val all = batch1 ++ batch2
    val in = MemoryStream[(String, String)]
    val out = in.toDS().groupByKey(_._1)
      .mapGroupsWithState[graft.catalyst.TopKBuf, (String, Long, String)](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (lang, rows, state) =>
          val buf = rows.foldLeft(state.getOption.getOrElse(agg.zero))(
            (b, r) => agg.reduce(b, r._2))
          state.update(buf)
          val fin = agg.finish(buf)
          (lang, fin.map(_._2).sum, fin.take(2).map(e => s"${e._1}:${e._2}").mkString(","))
      }
    val q = out.toDF().toDF("lang", "total", "top2").writeStream
      .format("memory").queryName("sketch_state").outputMode("update").start()
    in.addData(batch1: _*); q.processAllAvailable()
    in.addData(batch2: _*); q.processAllAvailable(); q.stop()
    // Final-state rows are the ones whose total equals the full stream's
    // per-key count; their top-2 must equal the exact batch answer.
    def exactTop2(lang: String) = all.filter(_._1 == lang).map(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(2)
      .map(e => s"${e._1}:${e._2}").mkString(",")
    val rows = spark.table("sketch_state")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    for (lang <- Seq("en", "de")) {
      val total = all.count(_._1 == lang).toLong
      val finals = rows.filter(r => r._1 == lang && r._2 == total)
      assert(finals.nonEmpty, s"no final-state row for $lang")
      assert(finals.forall(_._3 === exactTop2(lang)),
        s"$lang top-2 drifted: ${finals.toSeq} vs ${exactTop2(lang)}")
    }
  }

  test("streaming decontamination twin matches the batch contamination report") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Decontaminating a document STREAM is stateless per doc once the eval
    // set is fixed: the eval slice's distinct shingles (tiny by
    // construction) ship to every task and each arriving doc is scored as
    // a narrow map — no streaming state, no shuffle, any output mode. This
    // is the streaming shape of DedupOps.contamination's broadcast side.
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (0L, base),                                      // eval
      (1L, base.replace("today", "tonight")),          // train: near-dup
      (2L, "completely different words populate this other document entirely"),
      (3L, base),                                      // train: exact copy
      (4L, "more unrelated filler text that shares nothing with the eval slice"))
    val docsDF = docs.toDF("doc_id", "text")
    val evalPred = col("doc_id") % 2 === 0 && col("doc_id") < 1
    // Batch report (the gated operator) on the same data.
    val batch = graft.ops.DedupOps.contamination(docsDF, "text", "doc_id", evalPred)
      .select("doc_id", "n_sh", "n_shared")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // Streaming twin: eval shingles pinned once, stream scored statelessly.
    val evalSh = graft.ops.DedupOps.shingleInv(
        docsDF.filter(evalPred), "text", "doc_id")
      .select("h").distinct().as[Long].collect().sorted
    val in = MemoryStream[(Long, String)]
    val scored = graft.ops.DedupOps.shingleSets(
        in.toDF().toDF("doc_id", "text").filter(!evalPred), "text", "doc_id")
      .select(col("doc_id"),
        size(array_distinct(col("sh"))).cast("long").as("n_sh"),
        size(array_intersect(col("sh"), typedLit(evalSh))).cast("long")
          .as("n_shared"))
      .filter(col("n_shared") > 0)
    val q = scored.writeStream.format("memory").queryName("decontam_twin")
      .outputMode("append").start()
    in.addData(docs: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("decontam_twin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.map(_._1) === Set(1L, 3L)) // near-dup + copy, not 2/4
  }

  test("streaming funnel transitions match the gated batch funnel across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{FunnelEvent, FunnelTransition}
    val dir = "/root/testdata/sf0.001"
    // Batch truth: the gated query's per-user final stage + anchors.
    val batch = Catalog.queries("ref_funnel")(spark, dir).collect()
      .map(r => (r.getLong(0).toString, r.getInt(4))).toMap
    // Stream the same events in event-time order, split into 3 batches —
    // stage anchors must survive in state across the splits.
    val evs = graft.Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id").cast("string"), col("ts"), col("event_type"))
      .orderBy("ts").collect()
      .map(r => FunnelEvent(r.getString(0), r.getTimestamp(1), r.getString(2)))
    val in = MemoryStream[FunnelEvent]
    val q = graft.streaming.StatefulOps
      .streamingFunnel(in.toDS(), windowMs = 6L * 3600 * 1000)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    val third = evs.length / 3
    in.addData(evs.take(third): _*); q.processAllAvailable()
    in.addData(evs.slice(third, 2 * third): _*); q.processAllAvailable()
    in.addData(evs.drop(2 * third): _*); q.processAllAvailable(); q.stop()
    val streamed = spark.table("funnel_stream").as[FunnelTransition].collect()
    // One transition per stage reached; max stage per user == batch stage.
    val perUser = streamed.groupBy(_.userId).view
      .mapValues(ts => ts.map(_.stage).max).toMap
    batch.foreach { case (u, stage) =>
      assert(perUser.getOrElse(u, 0) === stage, s"user $u")
    }
    assert(streamed.groupBy(t => (t.userId, t.stage)).forall(_._2.length == 1),
      "each stage must be reached exactly once per user")
    // Full-row parity against the twin's own gate: every transition the
    // stream emitted — (user, stage, anchor ts) — must equal the gated
    // stream_funnel_transitions rows exactly, anchors included.
    val gated = Catalog.queries("stream_funnel_transitions")(spark, dir)
      .collect()
      .map(r => (r.getLong(0).toString, r.getInt(1), r.getTimestamp(2))).toSet
    assert(streamed.map(t => (t.userId, t.stage, t.ts)).toSet === gated)
  }

  test("streaming as-of enrichment matches the batch as-of join across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{AsofEnriched, AsofEvent}
    // Interleaved changelog + lookups over 3 keys: dim updates every 70 s,
    // lookups every 60 s, including exact timestamp collisions (every
    // 420 s) where the inclusive-<= tie rule decides the answer, and
    // lookups before any dim row (NULL enrichment).
    val t0 = 1700000000000L
    val dims = for (k <- 0 until 3; i <- 0 until 20) yield
      AsofEvent(s"k$k", new java.sql.Timestamp(t0 + 30000L + i * 70000L + k * 7000L),
        isDim = true, eventId = -1L, dimValue = Some(k * 100 + i))
    val lookups = for (k <- 0 until 3; i <- 0 until 25) yield
      AsofEvent(s"k$k", new java.sql.Timestamp(t0 + i * 60000L + (k % 2) * 30000L),
        isDim = false, eventId = k * 1000L + i, dimValue = None)
    // Batch truth: the gated operator on the same two tables.
    val left = lookups.toSeq.toDF("key", "ts", "isDim", "eventId", "dimValue")
      .select("key", "ts", "eventId")
    val right = dims.toSeq.toDF("key", "ts", "isDim", "eventId", "dimValue")
      .select(col("key"), col("ts").as("dim_ts"), col("dimValue").as("value"))
    val batch = graft.ops.AsofOps.asofJoin(left, right, Seq("key"),
        "ts", "dim_ts", Seq("value", "dim_ts"))
      .collect().map(r => (r.getLong(2),
        (Option(r.get(3)).map(_.asInstanceOf[Int]),
         Option(r.getTimestamp(4))))).toMap
    // Stream the union in event-time order (dim first at equal ts), split
    // across 3 micro-batches — state must carry the last dim across splits.
    val evs = (dims ++ lookups).sortBy(e => (e.ts.getTime, !e.isDim, e.eventId))
    val in = MemoryStream[AsofEvent]
    val q = graft.streaming.StatefulOps.streamingAsof(in.toDS())
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    val third = evs.length / 3
    in.addData(evs.take(third): _*); q.processAllAvailable()
    in.addData(evs.slice(third, 2 * third): _*); q.processAllAvailable()
    in.addData(evs.drop(2 * third): _*); q.processAllAvailable(); q.stop()
    val streamed = spark.table("asof_stream").as[AsofEnriched].collect()
    assert(streamed.length === lookups.length) // one output row per lookup
    streamed.foreach { e =>
      val (bv, bt) = batch(e.eventId)
      assert(e.asofValue === bv, s"value for lookup ${e.eventId}")
      assert(e.asofTs === bt, s"ts for lookup ${e.eventId}")
    }
    // The fixture exercises both edges: some NULL (pre-dim) lookups and
    // at least one exact ts collision resolved by the inclusive rule.
    assert(streamed.exists(_.asofValue.isEmpty))
    assert(lookups.exists(l => dims.exists(d =>
      d.key == l.key && d.ts.getTime == l.ts.getTime)))
  }

  test("running z-score state matches batch cumulative stats across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{Reading, RunningZ}
    val readings = (0 until 40).map { i =>
      Reading(s"u${i % 3}", new java.sql.Timestamp(1700000000000L + i * 60000L),
        80 + (i * 37) % 90)
    }
    // Batch expectation: z against the PRECEDING readings' sample stats
    // (cumulative window, frame ending 1 before current).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("userId")).orderBy(col("ts"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val batch = readings.toDF()
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("mu", avg(col("value")).over(w))
      .withColumn("sd", stddev_samp(col("value")).over(w))
      .withColumn("z", when(col("n") >= 2 && col("sd") > 0,
        (col("value") - col("mu")) / col("sd")))
      .select("userId", "value", "n", "z").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    val in = MemoryStream[Reading]
    val q = graft.streaming.StatefulOps.runningZscore(in.toDS())
      .writeStream.format("memory").queryName("runz")
      .outputMode("append").start()
    in.addData(readings.take(20): _*)
    q.processAllAvailable()
    in.addData(readings.drop(20): _*) // state must carry n/mean/m2 over
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("runz").as[RunningZ].collect()
      .map(r => (r.userId, r.value, r.n, r.z)).toSet
    // Welford vs sum-based window stddev agree to ~1e-9 relative; compare
    // with rounding rather than bit equality.
    def canon(s: Set[(String, Int, Long, Option[Double])]) =
      s.map { case (u, v, n, z) => (u, v, n, z.map(x => math.round(x * 1e6))) }
    assert(canon(streamed) === canon(batch))
  }

  test("streaming near-dup flags arrivals against state from earlier batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{BucketDoc, NearDupHit}
    val base = "the quick brown fox jumps over the lazy dog again and again today ok"
    val docs = Seq(
      (0L, base),
      (1L, base + " indeed"),                              // near-dup of 0 (J≈0.92)
      (2L, "completely different words populate this other document entirely now"),
      (3L, base),                                          // exact copy of 0
      (4L, "more unrelated filler text that shares nothing with anything else here"))
    val (bands, rpb) = (4, 4)
    // Bucket rows prepared with the SAME signature/band math as the batch
    // operators (in a live topology this is a narrow per-doc map).
    val sigs = graft.ops.DedupOps.signatures(
      graft.ops.DedupOps.shingleInv(docs.toDF("doc_id", "text"), "text", "doc_id"),
      bands * rpb)
    val bucketRows = sigs
      .withColumn("bk", graft.ops.DedupOps.bandKeys(bands, rpb))
      .withColumn("sig", array((0 until bands * rpb).map(i => col(s"m$i")): _*))
      .select(col("doc_id"),
        posexplode(col("bk")).as(Seq("band", "key")), col("sig"))
      .collect()
      .map(r => BucketDoc(r.getInt(1), r.getLong(2), r.getLong(0),
        r.getSeq[Long](3)))
    // Expected: for docs a < b sharing any bucket, flag b if signature
    // agreement >= threshold (computed naively on the driver).
    val sigById = bucketRows.map(b => b.docId -> b.sig).toMap
    val expected = (for {
      a <- bucketRows; b <- bucketRows
      if a.band == b.band && a.key == b.key && a.docId < b.docId
      agree = sigById(a.docId).zip(sigById(b.docId))
        .count { case (x, y) => x == y }.toDouble / (bands * rpb)
      if agree >= 0.5
    } yield (b.docId, a.docId)).groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    // Stream in two batches split mid-corpus: doc 3's duplicate-of-0 hit
    // can only come from bucket STATE carried over from batch 1.
    val in = MemoryStream[BucketDoc]
    val q = graft.streaming.StatefulOps.streamingNearDup(in.toDS(), 0.5)
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    in.addData(bucketRows.filter(_.docId <= 2).toSeq: _*)
    q.processAllAvailable()
    in.addData(bucketRows.filter(_.docId >= 3).toSeq: _*)
    q.processAllAvailable(); q.stop()
    val got = spark.table("neardup_stream").as[NearDupHit].collect()
      .groupBy(_.docId).view.mapValues(_.map(_.dupOf).min).toMap
    assert(got === expected)
    assert(got.get(3L).contains(0L), "cross-batch exact copy must flag via state")
    assert(got.contains(1L) && !got.contains(2L) && !got.contains(4L))
  }

  test("Trigger.AvailableNow drains a backlog in bounded batches then stops itself") {
    import spark.implicits._
    // The backfill pattern: reprocess a historical table through the
    // SAME streaming topology, rate-limited by maxFilesPerTrigger, and
    // terminate when caught up — no manual stop, no always-on cluster.
    val dir = java.nio.file.Files.createTempDirectory("graft-avnow").toString
    (0 until 4).foreach { i =>
      Seq.tabulate(25)(j => (i * 25L + j, s"v${i * 25 + j}"))
        .toDF("id", "v").coalesce(1).write.parquet(s"$dir/in/batch$i")
    }
    val in = spark.readStream
      .schema("id LONG, v STRING")
      .option("maxFilesPerTrigger", "1") // bounded work per micro-batch
      .parquet(s"$dir/in/*")
    val q = in.writeStream.format("memory").queryName("avnow")
      .option("checkpointLocation", s"$dir/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "AvailableNow must self-terminate")
    assert(spark.table("avnow").count() === 100)
    assert(q.recentProgress.length >= 4, // one micro-batch per file
      s"expected the backlog in multiple bounded batches, got ${q.recentProgress.length}")
  }

  test("streaming near-dup hot bucket saturates at maxPerBucket, comparisons continue") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{BucketDoc, NearDupHit}
    val sig = Seq(1L, 2L, 3L, 4L)
    val in = MemoryStream[BucketDoc]
    val q = graft.streaming.StatefulOps
      .streamingNearDup(in.toDS(), threshold = 0.5, maxPerBucket = 1)
      .writeStream.format("memory").queryName("neardup_cap")
      .outputMode("append").start()
    in.addData(BucketDoc(0, 5L, 1L, sig), BucketDoc(0, 5L, 2L, sig))
    q.processAllAvailable()
    in.addData(BucketDoc(0, 5L, 3L, sig))
    q.processAllAvailable(); q.stop()
    val hits = spark.table("neardup_cap").as[NearDupHit].collect()
      .map(h => (h.docId, h.dupOf)).toSet
    // doc 1 fills the bucket; docs 2 and 3 still compare against it, but
    // doc 2 was never STORED, so (3 -> 2) must not exist.
    assert(hits === Set((2L, 1L), (3L, 1L)))
  }

  test("streaming quality-filter twin matches the batch gopher rules") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The Gopher composite filter is a stateless narrow map, so its
    // streaming twin is the SAME QueryDef plan applied to a stream: no
    // state store, no watermark, append mode. Parity is checked against
    // the gated batch query on the real sf0.001 table.
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val batch = Catalog.queries("text_gopher_rules")(spark, dir)
      .select("doc_id", "keep").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSet
    val in = MemoryStream[(Long, String, String, String, Long)]
    val tmp = java.nio.file.Files.createTempDirectory("graft-gq").toString
    // Re-derive the same plan over the stream by writing the micro-batch
    // through the identical rule expressions (QueryDef.run needs a table
    // dir; the rule set lives in one place, so drive it via a parquet
    // round-trip of the streamed rows).
    val rows = docs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    in.addData(rows.toSeq: _*)
    val streamedDF = in.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
    val q = streamedDF.writeStream.format("parquet")
      .option("path", s"$tmp/documents.parquet")
      .option("checkpointLocation", s"$tmp/ck")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = Catalog.queries("text_gopher_rules")(spark, tmp.stripSuffix("/"))
      .select("doc_id", "keep").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(streamed === batch)
  }

  test("streaming heavy hitters match the gated batch sketch across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{TermEvent, TopTermRow}
    val dir = "/root/testdata/sf0.001"
    // Batch truth: the gated SpaceSaving query (exact regime: capacity
    // 256 >> vocabulary).
    val batch = graft.Catalog.queries("text_top_terms")(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet
    val evs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(graft.ops.TextOps.tokens(col("text"))).as("term"))
      .orderBy("doc_id").select("lang", "term").collect()
      .map(r => TermEvent(r.getString(0), r.getString(1)))
    // The per-group sketch state must carry across micro-batch splits.
    val latest = scala.collection.mutable.Map[String, Array[TopTermRow]]()
    val in = MemoryStream[TermEvent]
    val q = graft.streaming.StatefulOps.streamingTopTerms(in.toDS(), 256, 5)
      .writeStream.outputMode("update")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[TopTermRow], _: Long) =>
        ds.collect().groupBy(_.grp).foreach { case (g, rows) => latest(g) = rows }
      }.start()
    val third = evs.length / 3
    in.addData(evs.take(third): _*); q.processAllAvailable()
    in.addData(evs.slice(third, 2 * third): _*); q.processAllAvailable()
    in.addData(evs.drop(2 * third): _*); q.processAllAvailable(); q.stop()
    val streamed = latest.values.flatten
      .map(t => (t.grp, t.rk, t.term, t.cnt)).toSet
    assert(streamed === batch)
  }

  test("streaming time-in-range converges to the batch clinical report across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{GlucoseReading, TirRow}
    val dir = "/root/testdata/sf0.001"
    val batch = graft.Catalog.queries("ref_time_in_range")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    val evs = graft.Tables.events(spark, dir)
      .selectExpr("user_id", "CAST(ts AS LONG) AS sec", "event_id", "value")
      .orderBy("sec", "event_id").collect()
      .map(r => GlucoseReading(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val latest = scala.collection.mutable.Map[Long, TirRow]()
    val in = MemoryStream[GlucoseReading]
    val q = graft.streaming.StatefulOps.streamingTimeInRange(in.toDS())
      .writeStream.outputMode("update")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[TirRow], _: Long) =>
        ds.collect().foreach(t => latest(t.userId) = t)
      }.start()
    val third = evs.length / 3
    in.addData(evs.take(third): _*); q.processAllAvailable()
    in.addData(evs.slice(third, 2 * third): _*); q.processAllAvailable()
    in.addData(evs.drop(2 * third): _*); q.processAllAvailable(); q.stop()
    val streamed = latest.view.mapValues(t => (t.totalSec, t.veryLowSec,
      t.lowSec, t.inRangeSec, t.highSec, t.veryHighSec, t.tirMicro)).toMap
    assert(streamed === batch)
  }

  test("streaming CMS sketch equals the batch UDAF bit-for-bit across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{CmsState, HashEvent}
    val dir = "/root/testdata/sf0.001"
    graft.catalyst.GraftFunctions.register(spark)
    // Batch truth: the same cms_counts UDAF the gated query runs,
    // per source group.
    val batch = graft.Tables.documents(spark, dir)
      .select(col("source"),
        explode(graft.ops.TextOps.tokens(col("text"))).as("term"))
      .select(col("source"), graft.ops.TextOps.hash64(col("term")).as("h"))
      .groupBy("source").agg(expr("cms_counts(h)").as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    val evs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(graft.ops.TextOps.tokens(col("text"))).as("term"))
      .select(col("doc_id"), col("source"),
        graft.ops.TextOps.hash64(col("term")).as("h"))
      .orderBy("doc_id").select("source", "h").collect()
      .map(r => HashEvent(r.getString(0), r.getLong(1)))
    val latest = scala.collection.mutable.Map[String, CmsState]()
    val in = MemoryStream[HashEvent]
    val q = graft.streaming.StatefulOps.streamingCms(in.toDS())
      .writeStream.outputMode("update")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[CmsState], _: Long) =>
        ds.collect().foreach(e => latest(e.grp) = e)
      }.start()
    val third = evs.length / 3
    in.addData(evs.take(third): _*); q.processAllAvailable()
    in.addData(evs.slice(third, 2 * third): _*); q.processAllAvailable()
    in.addData(evs.drop(2 * third): _*); q.processAllAvailable(); q.stop()
    assert(latest.keySet === batch.keySet)
    for ((g, sk) <- batch) {
      assert(java.util.Arrays.equals(latest(g).sketch, sk),
        s"sketch drift for group $g")
      assert(latest(g).total === evs.count(_.grp == g).toLong)
    }
  }

  test("streaming HLL distinct estimate matches the batch sketch across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{DistinctEst, IdEvent}
    val dir = "/root/testdata/sf0.001"
    // Batch truth: Spark's own hll_sketch_agg at the same lgConfigK.
    val batch = graft.Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(doc_id, 12))").as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val evs = graft.Tables.documents(spark, dir)
      .select(col("source"), col("doc_id")).orderBy("doc_id").collect()
      .map(r => IdEvent(r.getString(0), r.getLong(1)))
    val latest = scala.collection.mutable.Map[String, Long]()
    val in = MemoryStream[IdEvent]
    val q = graft.streaming.StatefulOps.streamingDistinct(in.toDS(), 12)
      .writeStream.outputMode("update")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[DistinctEst], _: Long) =>
        ds.collect().foreach(e => latest(e.grp) = e.est)
      }.start()
    val third = evs.length / 3
    in.addData(evs.take(third): _*); q.processAllAvailable()
    // Replay the first batch in full (at-least-once): set semantics mean
    // the duplicates cannot move any estimate.
    in.addData(evs.take(third): _*); q.processAllAvailable()
    in.addData(evs.slice(third, 2 * third): _*); q.processAllAvailable()
    in.addData(evs.drop(2 * third): _*); q.processAllAvailable(); q.stop()
    assert(latest.toMap === batch)
  }

  test("streaming trend arrows equal the batch classification across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{ArrowRow, GlucoseReading}
    val dir = "/root/testdata/sf0.001"
    val batch = Catalog.queries("ref_trend_arrows")(spark, dir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        ((Option(r.getAs[java.lang.Double]("rate")).map(_.toDouble),
          r.getAs[String]("arrow")))).toMap
    val evs = graft.Tables.events(spark, dir)
      .select(col("user_id"), expr("CAST(ts AS LONG)").as("sec"),
        col("event_id"), col("value"))
      .orderBy("sec", "event_id").collect()
      .map(r => GlucoseReading(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val got = scala.collection.mutable.Map[(Long, Long), (Option[Double], String)]()
    val in = MemoryStream[GlucoseReading]
    val q = graft.streaming.StatefulOps.streamingTrendArrows(in.toDS())
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[ArrowRow], _: Long) =>
        ds.collect().foreach(a => got((a.userId, a.eventId)) = (a.rate, a.arrow))
      }.start()
    val third = evs.length / 3
    in.addData(evs.take(third): _*); q.processAllAvailable()
    in.addData(evs.slice(third, 2 * third): _*); q.processAllAvailable()
    in.addData(evs.drop(2 * third): _*); q.processAllAvailable(); q.stop()
    assert(got.size === batch.size)
    assert(got.toMap === batch)
  }

  test("streaming CDC classify equals the batch changelog across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{CdcRow, CdcUpdate}
    val dir = "/root/testdata/sf0.001"
    val batch = Catalog.queries("stream_cdc_classify")(spark, dir)
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[String]("status")).toMap
    val evs = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("CAST(ts AS LONG)").as("sec"), col("event_id"), col("value"))
      .orderBy("sec", "event_id").collect()
      .map(r => CdcUpdate(r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val got = scala.collection.mutable.Map[Long, String]()
    val in = MemoryStream[CdcUpdate]
    val q = graft.streaming.StatefulOps.streamingCdcClassify(in.toDS())
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[CdcRow], _: Long) =>
        ds.collect().foreach(c => got(c.eventId) = c.status)
      }.start()
    val third = evs.length / 3
    in.addData(evs.take(third): _*); q.processAllAvailable()
    in.addData(evs.slice(third, 2 * third): _*); q.processAllAvailable()
    in.addData(evs.drop(2 * third): _*); q.processAllAvailable(); q.stop()
    assert(got.size === batch.size)
    assert(got.toMap === batch)
  }

  test("streaming discovery curve equals the batch cumulative distinct") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{DiscoveryRow, TypeEvent}
    val dir = "/root/testdata/sf0.001"
    val batch = Catalog.queries("q_cumulative_distinct")(spark, dir)
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[Long]("cum_distinct_types")).toMap
    val evs = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("CAST(ts AS LONG)").as("sec"), col("event_id"))
      .orderBy("sec", "event_id").collect()
      .map(r => TypeEvent(r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val got = scala.collection.mutable.Map[Long, Long]()
    val in = MemoryStream[TypeEvent]
    val q = graft.streaming.StatefulOps.streamingDiscovery(in.toDS())
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[DiscoveryRow], _: Long) =>
        ds.collect().foreach(r => got(r.eventId) = r.cumDistinct)
      }.start()
    val third = evs.length / 3
    in.addData(evs.take(third): _*); q.processAllAvailable()
    in.addData(evs.slice(third, 2 * third): _*); q.processAllAvailable()
    in.addData(evs.drop(2 * third): _*); q.processAllAvailable(); q.stop()
    assert(got.size === batch.size)
    assert(got.toMap === batch)
  }

  test("streaming k-anonymity suppress-until-k equals the batch gate " +
    "across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{KAnonRelease, QiDoc}
    val dir = "/root/testdata/sf0.001"
    val batch = Catalog.queries("stream_k_anon")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("qi"), r.getAs[Long]("released_by")))).toMap
    val docs = graft.Tables.documents(spark, dir)
      .select(concat_ws("|", col("source"), col("lang"),
        expr("n_chars div 1000")).as("qi"), col("doc_id"))
      .orderBy("doc_id").collect()
      .map(r => QiDoc(r.getString(0), r.getLong(1)))
    val got = scala.collection.mutable.Map[Long, (String, Long)]()
    val in = MemoryStream[QiDoc]
    val q = graft.streaming.StatefulOps
      .streamingKAnon(in.toDS(), graft.queries.PipelineQueries.KAnon)
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[KAnonRelease], _: Long) =>
        ds.collect().foreach(r => got(r.docId) = (r.qi, r.releasedBy))
      }.start()
    val third = docs.length / 3
    in.addData(docs.take(third): _*); q.processAllAvailable()
    in.addData(docs.slice(third, 2 * third): _*); q.processAllAvailable()
    in.addData(docs.drop(2 * third): _*); q.processAllAvailable(); q.stop()
    // Same published rows, same release attribution — and nothing from
    // a below-k class leaked.
    assert(got.size === batch.size)
    assert(got.toMap === batch)
  }

  test("streaming doubling-release DP counter equals the batch gate " +
    "across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{CatDoc, DpRelease}
    val dir = "/root/testdata/sf0.001"
    val batch = Catalog.queries("stream_geo_dp")(spark, dir)
      .collect().map(r => (r.getAs[String]("qi"), r.getAs[Long]("true_n")) ->
        ((r.getAs[Long]("noise"), r.getAs[Long]("released_n"),
          r.getAs[Long]("released_at")))).toMap
    val docs = graft.Tables.documents(spark, dir)
      .select(col("lang").as("qi"), col("doc_id"))
      .orderBy("doc_id").collect()
      .map(r => CatDoc(r.getString(0), r.getLong(1)))
    val got = scala.collection.mutable.Map[(String, Long), (Long, Long, Long)]()
    val in = MemoryStream[CatDoc]
    val q = graft.streaming.StatefulOps.streamingGeoDp(in.toDS())
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[DpRelease], _: Long) =>
        ds.collect().foreach(r =>
          got((r.qi, r.trueN)) = (r.noise, r.releasedN, r.releasedAt))
      }.start()
    val third = docs.length / 3
    in.addData(docs.take(third): _*); q.processAllAvailable()
    in.addData(docs.slice(third, 2 * third): _*); q.processAllAvailable()
    in.addData(docs.drop(2 * third): _*); q.processAllAvailable(); q.stop()
    assert(got.size === batch.size)
    assert(got.toMap === batch)
  }

  test("streaming binary-tree DP releases equal the batch gate at every " +
    "arrival across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{CatDoc, TreeRelease}
    val dir = "/root/testdata/sf0.001"
    val batch = Catalog.queries("stream_tree_dp")(spark, dir)
      .collect().map(r => (r.getAs[String]("qi"), r.getAs[Long]("true_n")) ->
        ((r.getAs[Long]("n_nodes"), r.getAs[Long]("released_n")))).toMap
    val docs = graft.Tables.documents(spark, dir)
      .select(col("lang").as("qi"), col("doc_id"))
      .orderBy("doc_id").collect()
      .map(r => CatDoc(r.getString(0), r.getLong(1)))
    val got = scala.collection.mutable.Map[(String, Long), (Long, Long)]()
    val in = MemoryStream[CatDoc]
    val q = graft.streaming.StatefulOps.streamingTreeDp(in.toDS())
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[TreeRelease], _: Long) =>
        ds.collect().foreach(r =>
          got((r.qi, r.trueN)) = (r.nNodes, r.releasedN))
      }.start()
    val third = docs.length / 3
    in.addData(docs.take(third): _*); q.processAllAvailable()
    in.addData(docs.slice(third, 2 * third): _*); q.processAllAvailable()
    in.addData(docs.drop(2 * third): _*); q.processAllAvailable(); q.stop()
    assert(got.size === batch.size) // one release per arrival, no extras
    assert(got.toMap === batch)
  }

  test("streaming Stupid-Backoff scoring equals the gated batch serve " +
    "rows across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{LmDoc, LmScoreRow}
    val dir = "/root/testdata/sf0.001"
    // Batch truth: the gated serve view (non-train docs only).
    val batch = Catalog.queries("stream_lm_score")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6), r.getBoolean(7)))).toMap
    // Train ONCE batch-side, broadcast the count tables as a driver
    // model (the Brants serving shape), stream the non-train docs.
    val model = graft.streaming.StatefulOps.trainSbModel(
      graft.Tables.documents(spark, dir), col("lang") === "en")
    // Same NULL semantics as the gate's NOT-predicate filter: a doc
    // whose lang is NULL is neither train nor served.
    val docs = graft.Tables.documents(spark, dir)
      .filter(!(col("lang") === "en"))
      .select(col("doc_id"), col("text")).collect()
      .map(r => LmDoc(r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1)))
    val got = scala.collection.mutable.Map[Long,
      (Long, Long, Long, Long, Long, Double, Boolean)]()
    val in = MemoryStream[LmDoc]
    val q = graft.streaming.StatefulOps.streamingLmScore(in.toDS(), model)
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[LmScoreRow], _: Long) =>
        ds.collect().foreach(r => got(r.docId) = (r.nTrigrams, r.nTriHit,
          r.nBiBack, r.nUniBack, r.nOov, r.sbScore, r.flagged))
      }.start()
    val third = docs.length / 3
    in.addData(docs.take(third): _*); q.processAllAvailable()
    in.addData(docs.slice(third, 2 * third): _*); q.processAllAvailable()
    in.addData(docs.drop(2 * third): _*); q.processAllAvailable(); q.stop()
    assert(got.size === batch.size)
    assert(got.toMap === batch)
    // the corpus must exercise the backoff ladder BELOW the trigram
    // level somewhere (the shared synthetic vocab means true OOV may
    // not exist; the scalar OOV branch is pinned separately below)
    val sums = got.values.foldLeft((0L, 0L, 0L, 0L)) { (a, v) =>
      (a._1 + v._2, a._2 + v._3, a._3 + v._4, a._4 + v._5) }
    assert(sums._1 > 0, "no trigram hits at all")
    assert(sums._2 + sums._3 + sums._4 > 0, "backoff never taken")
    // OOV branch: a doc of never-seen tokens scores 0 trigram mass
    // and flags.
    val oov = graft.streaming.StatefulOps.streamingLmScore(
      Seq(graft.streaming.StatefulOps.LmDoc(
        999999L, "zzq1 zzq2 zzq3 zzq4")).toDS(), model).collect()(0)
    assert(oov.nOov === 2L && oov.nTrigrams === 2L &&
      oov.sbScore === 0.0 && oov.flagged)
  }

  test("streaming Kneser-Ney scoring equals the gated batch serve rows " +
    "across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{LmDoc, KnScoreRow}
    val dir = "/root/testdata/sf0.001"
    // Batch truth: the gated KN serve view (non-train docs only) —
    // rows derived from the same knBigram pipeline text_kneser_ney
    // gates, filtered to the serve slice.
    val batch = Catalog.queries("stream_kn_score")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getBoolean(6)))).toMap
    val model = graft.streaming.StatefulOps.trainKnModel(
      graft.Tables.documents(spark, dir), col("lang") === "en")
    val docs = graft.Tables.documents(spark, dir)
      .filter(!(col("lang") === "en"))
      .select(col("doc_id"), col("text")).collect()
      .map(r => LmDoc(r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1)))
    val got = scala.collection.mutable.Map[Long,
      (Long, Long, Long, Long, Double, Boolean)]()
    val in = MemoryStream[LmDoc]
    val q = graft.streaming.StatefulOps.streamingKnScore(in.toDS(), model)
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[KnScoreRow], _: Long) =>
        ds.collect().foreach(r => got(r.docId) = (r.nBigrams, r.nKnHit,
          r.nContBack, r.nOov, r.knScore, r.flagged))
      }.start()
    val third = docs.length / 3
    in.addData(docs.take(third): _*); q.processAllAvailable()
    in.addData(docs.slice(third, 2 * third): _*); q.processAllAvailable()
    in.addData(docs.drop(2 * third): _*); q.processAllAvailable(); q.stop()
    assert(got.size === batch.size)
    assert(got.toMap === batch)
    // the ladder's levels must all be exercised somewhere: KN hits
    // and at least one continuation-backoff or OOV occurrence
    val sums = got.values.foldLeft((0L, 0L, 0L)) { (a, v) =>
      (a._1 + v._2, a._2 + v._3, a._3 + v._4) }
    assert(sums._1 > 0, "no KN bigram hits at all")
    assert(sums._2 + sums._3 > 0, "interpolation backoff never taken")
    // OOV branch: never-seen tokens score 0 and flag; the unseen-
    // CONTEXT branch (pcont without ctx) is covered by the corpus
    // parity above when a serve doc opens with a train-continuation.
    val oov = graft.streaming.StatefulOps.streamingKnScore(
      Seq(graft.streaming.StatefulOps.LmDoc(
        999999L, "zzq1 zzq2 zzq3")).toDS(), model).collect()(0)
    assert(oov.nOov === 2L && oov.nBigrams === 2L &&
      oov.knScore === 0.0 && oov.flagged)
  }

  test("streaming WordPiece tokenization equals the gated batch serve " +
    "rows across micro-batch splits (JVM max-munch vs the HOF fold)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{LmDoc, WpTokRow}
    val dir = "/root/testdata/sf0.001"
    val batch = Catalog.queries("stream_wordpiece")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val vocab = graft.streaming.StatefulOps.trainWpVocab(
      graft.Tables.documents(spark, dir), col("lang") === "en")
    assert(vocab.size <= 2 * graft.ops.TextOps.WpVocabTop + 72,
      s"vocab not bounded: ${vocab.size}")
    val docs = graft.Tables.documents(spark, dir)
      .filter(!(col("lang") === "en"))
      .select(col("doc_id"), col("text")).collect()
      .map(r => LmDoc(r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1)))
    val got = scala.collection.mutable.Map[Long, (Long, Long, Long, Long)]()
    val in = MemoryStream[LmDoc]
    val q = graft.streaming.StatefulOps.streamingWordPiece(in.toDS(), vocab)
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[WpTokRow], _: Long) =>
        ds.collect().foreach(r =>
          got(r.docId) = (r.nWords, r.nPieces, r.nUnk, r.docFp))
      }.start()
    val half = docs.length / 2
    in.addData(docs.take(half): _*); q.processAllAvailable()
    in.addData(docs.drop(half): _*); q.processAllAvailable(); q.stop()
    assert(got.size === batch.size)
    assert(got.toMap === batch)
    // the serve slice must actually exercise tokenization (nonzero
    // words and multi-piece segmentations somewhere)
    assert(got.values.map(_._1).sum > 0L)
    assert(got.values.exists(v => v._2 > v._1),
      "no word ever split into multiple pieces")
    // long-word [UNK] rule through the streaming path
    val unk = graft.streaming.StatefulOps.streamingWordPiece(
      Seq(LmDoc(999999L, "abcdefghijklmnopq ok")).toDS(), vocab).collect()(0)
    assert(unk.nUnk === 1L && unk.nWords === 2L)
    // multilingual degrade through the streaming path: non-ASCII runs
    // are COUNTED [UNK] words (naïve = na/[UNK ï]/ve, Cyrillic and CJK
    // runs one [UNK] each), matching the widened batch extraction —
    // and the JVM twin agrees with the batch HOF fold on the same text
    val ms = graft.streaming.StatefulOps.streamingWordPiece(
      Seq(LmDoc(999998L, "naïve КОСМОС 漢字 ok")).toDS(), vocab).collect()(0)
    assert(ms.nWords === 6L, s"words counted, not dropped: $ms")
    assert(ms.nUnk >= 3L, s"non-ASCII runs degrade to [UNK]: $ms")
    val msBatch = graft.ops.TextOps.wordPieceServe(
      graft.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
        .limit(0)
        .unionAll(Seq((999998L, "naïve КОСМОС 漢字 ok"))
          .toDF("doc_id", "text"))
        .unionAll(graft.Tables.documents(spark, dir)
          .filter(col("lang") === "en")
          .select(col("doc_id"), col("text"))),
      col("doc_id") =!= 999998L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).find(_._1 == 999998L).get
    assert((msBatch._2, msBatch._3, msBatch._4, msBatch._5) ===
      ((ms.nWords, ms.nPieces, ms.nUnk, ms.docFp)),
      s"batch $msBatch vs stream $ms")
  }

  test("streaming crawl-intake equals the gated batch pipeline rows " +
    "across micro-batch splits (independent JVM regex chain vs the " +
    "codegen'd probe frames)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{IntakeRow, LmDoc}
    val d = "/root/testdata/sf0.001"
    val batch = Catalog.queries("pipeline_crawl_intake")(spark, d)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getBoolean(4))))
      .toMap
    val iq = graft.queries.IndexQueries
    // the gate's own raw-page derivation, composed in plain Scala
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val t = if (r.isNullAt(1)) "" else r.getString(1)
        val suffix = if (r.getLong(0) % 3 == 0) " " + iq.MojibakeFix
                     else " " + iq.MultiScript
        LmDoc(r.getLong(0), iq.HtmlPre + t + suffix + iq.HtmlPost)
      }
    val got = scala.collection.mutable
      .Map[Long, (Long, Long, String, Boolean)]()
    val in = MemoryStream[LmDoc]
    val q = graft.streaming.StatefulOps.streamingCrawlIntake(in.toDS())
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[IntakeRow],
                       _: Long) =>
        ds.collect().foreach(r =>
          got(r.docId) = (r.nClean, r.nMojibake, r.dominant, r.keep))
      }.start()
    val half = docs.length / 2
    in.addData(docs.take(half): _*); q.processAllAvailable()
    in.addData(docs.drop(half): _*); q.processAllAvailable(); q.stop()
    assert(got.size === batch.size)
    assert(got.toMap === batch)
    // the fixture must exercise BOTH keep branches
    assert(got.values.exists(_._4) && got.values.exists(!_._4))
  }

  test("SHARDED Kneser-Ney serving (stream-static joins, tables never " +
    "collected) equals the gated batch serve rows across micro-batch " +
    "splits; the size dispatch picks it past the threshold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.{LmDoc, KnScoreRow}
    val dir = "/root/testdata/sf0.001"
    val batch = Catalog.queries("stream_kn_score")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getBoolean(6)))).toMap
    val train = graft.Tables.documents(spark, dir)
    // The fixture's distinct-bigram vocabulary EXCEEDS the threshold
    // of 1, so knServe must take the sharded path (guard: the tables
    // really are bigger than the budget).
    val tables = StatefulOps.trainKnTables(train, col("lang") === "en")
    assert(tables.bi.count() > 1L, "fixture must exceed the threshold")
    val docs = train.filter(!(col("lang") === "en"))
      .select(col("doc_id"), col("text")).collect()
      .map(r => LmDoc(r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1)))
    val got = scala.collection.mutable.Map[Long,
      (Long, Long, Long, Long, Double, Boolean)]()
    val in = MemoryStream[LmDoc]
    val q = StatefulOps.knServe(in.toDS(), train, col("lang") === "en",
        maxBroadcastNgrams = 1L)
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[KnScoreRow], _: Long) =>
        ds.collect().foreach(r => got(r.docId) = (r.nBigrams, r.nKnHit,
          r.nContBack, r.nOov, r.knScore, r.flagged))
      }.start()
    val third = docs.length / 3
    in.addData(docs.take(third): _*); q.processAllAvailable()
    in.addData(docs.slice(third, 2 * third): _*); q.processAllAvailable()
    in.addData(docs.drop(2 * third): _*); q.processAllAvailable(); q.stop()
    assert(got.size === batch.size)
    assert(got.toMap === batch)
    // The dispatch's broadcast arm (collecting the SAME checkpointed
    // tables — no retrain) scores one probe doc identically to the
    // trainKnModel route already pinned above.
    val probe = docs.take(5).toSeq
    val viaModel = StatefulOps.streamingKnScore(probe.toDS(),
      StatefulOps.trainKnModel(train, col("lang") === "en")).collect()
    val viaDispatch = StatefulOps.knServe(probe.toDS(), train,
      col("lang") === "en").collect()
    assert(viaDispatch.sortBy(_.docId).toSeq ===
      viaModel.sortBy(_.docId).toSeq)
  }

  test("SHARDED Stupid-Backoff serving equals the gated batch serve rows " +
    "across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.{LmDoc, LmScoreRow}
    val dir = "/root/testdata/sf0.001"
    val batch = Catalog.queries("stream_lm_score")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6), r.getBoolean(7)))).toMap
    val train = graft.Tables.documents(spark, dir)
    val docs = train.filter(!(col("lang") === "en"))
      .select(col("doc_id"), col("text")).collect()
      .map(r => LmDoc(r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1)))
    val got = scala.collection.mutable.Map[Long,
      (Long, Long, Long, Long, Long, Double, Boolean)]()
    val in = MemoryStream[LmDoc]
    val q = StatefulOps.sbServe(in.toDS(), train, col("lang") === "en",
        maxBroadcastNgrams = 1L)
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[LmScoreRow], _: Long) =>
        ds.collect().foreach(r => got(r.docId) = (r.nTrigrams, r.nTriHit,
          r.nBiBack, r.nUniBack, r.nOov, r.sbScore, r.flagged))
      }.start()
    val third = docs.length / 3
    in.addData(docs.take(third): _*); q.processAllAvailable()
    in.addData(docs.slice(third, 2 * third): _*); q.processAllAvailable()
    in.addData(docs.drop(2 * third): _*); q.processAllAvailable(); q.stop()
    assert(got.size === batch.size)
    assert(got.toMap === batch)
    // True-OOV probe through the sharded ladder: never-seen tokens
    // contribute 0 mass at level 0 and flag.
    val oovIn = MemoryStream[LmDoc]
    val oovGot = scala.collection.mutable.ListBuffer[LmScoreRow]()
    val q2 = StatefulOps.streamingLmScoreSharded(
        oovIn.toDS(),
        StatefulOps.trainSbTables(train, col("lang") === "en"))
      .writeStream.outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[LmScoreRow], _: Long) =>
        oovGot ++= ds.collect(); ()
      }.start()
    oovIn.addData(LmDoc(999999L, "zzq1 zzq2 zzq3 zzq4"))
    q2.processAllAvailable(); q2.stop()
    val oov = oovGot.head
    assert(oov.nOov === 2L && oov.nTrigrams === 2L &&
      oov.sbScore === 0.0 && oov.flagged)
  }

  test("streaming EWMA snapshot is bit-equal to the batch fold across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{EwmaRow, GlucoseReading}
    val dir = "/root/testdata/sf0.001"
    val batch = Catalog.queries("ref_ewma_trend")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_readings"), r.getAs[Double]("ewma")))).toMap
    val evs = graft.Tables.events(spark, dir)
      .select(col("user_id"), expr("CAST(ts AS LONG)").as("sec"),
        col("event_id"), col("value"))
      .orderBy("sec", "event_id").collect()
      .map(r => GlucoseReading(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val latest = scala.collection.mutable.Map[Long, EwmaRow]()
    val in = MemoryStream[GlucoseReading]
    val q = graft.streaming.StatefulOps.streamingEwma(in.toDS())
      .writeStream.outputMode("update")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[EwmaRow], _: Long) =>
        ds.collect().foreach(e => latest(e.userId) = e)
      }.start()
    val third = evs.length / 3
    in.addData(evs.take(third): _*); q.processAllAvailable()
    in.addData(evs.slice(third, 2 * third): _*); q.processAllAvailable()
    in.addData(evs.drop(2 * third): _*); q.processAllAvailable(); q.stop()
    assert(latest.keySet === batch.keySet)
    for ((u, (n, e)) <- batch) {
      assert(latest(u).n === n)
      assert(latest(u).ewma === e, s"ewma drift for user $u")
    }
  }

  test("streaming KMV sketch is byte-equal to the batch aggregator across batches and replays") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{IdEvent, KmvEst}
    val dir = "/root/testdata/sf0.001"
    val k = 32
    // Batch truth: the SAME typed aggregator the gate query uses.
    val batch = graft.Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(graft.catalyst.KmvSketchAgg.kmvSketch(col("doc_id"), k).as("sk"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1).toSeq)).toMap
    val evs = graft.Tables.documents(spark, dir)
      .select(col("source"), col("doc_id")).orderBy("doc_id").collect()
      .map(r => IdEvent(r.getString(0), r.getLong(1)))
    val latest = scala.collection.mutable.Map[String, KmvEst]()
    val in = MemoryStream[IdEvent]
    val q = graft.streaming.StatefulOps.streamingKmv(in.toDS(), k)
      .writeStream.outputMode("update")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[KmvEst], _: Long) =>
        ds.collect().foreach(e => latest(e.grp) = e)
      }.start()
    val third = evs.length / 3
    in.addData(evs.take(third): _*); q.processAllAvailable()
    in.addData(evs.take(third): _*); q.processAllAvailable() // replay
    in.addData(evs.slice(third, 2 * third): _*); q.processAllAvailable()
    in.addData(evs.drop(2 * third): _*); q.processAllAvailable(); q.stop()
    assert(latest.keySet === batch.keySet)
    for ((g, sk) <- batch) {
      assert(latest(g).sketch === sk, s"kmv state drift for group $g")
      assert(latest(g).sketchN === sk.length)
    }
  }

  test("WARC -> WET extraction is stream-stateless: the SAME " +
    "warcHtmlText body over a readStream of segments equals the batch " +
    "rows across micro-batch splits, gzip and plain members mixed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.multimodal.MultimodalOps
    import graft.sources.WarcCodec
    def blob(id: Long): (Long, Array[Byte]) = {
      val html = s"<p>page $id &#8217;</p>".getBytes("US-ASCII")
      (id, WarcCodec.buildWarc(Seq(
        ("warcinfo", "", Array.tabulate(7)(_.toByte)),
        ("response", s"https://s.org/$id", html)),
        gzipPerRecord = id % 2 == 1))
    }
    val blobs = (1L to 20L).map(blob)
    val batch = MultimodalOps.warcHtmlText(
        blobs.toDF("doc_id", "bytes"), "doc_id", "bytes")
      .collect().map(r => r.docId -> ((r.targetUri, r.text))).toMap
    val got = scala.collection.mutable.Map[Long, (String, String)]()
    val in = MemoryStream[(Long, Array[Byte])]
    val q = MultimodalOps.warcHtmlText(
        in.toDS().toDF("doc_id", "bytes"), "doc_id", "bytes")
      .writeStream.outputMode("append")
      .foreachBatch {
        (ds: org.apache.spark.sql.Dataset[MultimodalOps.WetRow],
         _: Long) =>
          ds.collect().foreach(r => got(r.docId) = (r.targetUri, r.text))
      }.start()
    in.addData(blobs.take(9): _*); q.processAllAvailable()
    in.addData(blobs.drop(9): _*); q.processAllAvailable(); q.stop()
    assert(got.toMap === batch)
    assert(batch(3L)._2.contains("page 3"), "payload really extracted")
  }
}
