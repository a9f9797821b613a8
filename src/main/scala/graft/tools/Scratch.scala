package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{DedupOps, TextOps}

/** Dev scratchpad for isolating perf anomalies. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("scratch-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Bucketed co-located join: write both sides bucketed on the join key,
    // join with broadcast disabled -> plan must contain no Exchange.
    if (args.contains("bucketing")) {
      import graft.sources.Bucketing
      Bucketing.writeBucketed(Tables.orders(spark, d)
        .select(col("o_orderkey"), col("o_orderpriority")), "orders_b", "o_orderkey", 16, Some("o_orderkey"))
      Bucketing.writeBucketed(Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_quantity")), "lineitem_b", "l_orderkey", 16, Some("l_orderkey"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Bucketing.coLocatedJoin(spark, "orders_b", "lineitem_b", "o_orderkey", "l_orderkey")
      val plan = j.queryExecution.executedPlan.toString
      println("SCRATCH bucketed-join exchanges: " + (plan.split("Exchange").length - 1))
      println("SCRATCH bucketed-join rows: " + j.count())
      val t0 = System.nanoTime(); j.count()
      println(f"SCRATCH bucketed-join time: ${(System.nanoTime()-t0)/1e9}%.2fs")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.stop(); return
    }
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCRATCH $tag%-46s ${(System.nanoTime() - t0) / 1e9}%7.2fs  ($r)")
    }

    // latest-by-key shapes: max_by(struct) SortAggregate vs window
    // row_number vs two-pass (hash-aggregable max(struct(ord)) + self-join).
    if (args.contains("latest")) {
      val ev = Tables.events(spark, d)
      def aggKind(df: org.apache.spark.sql.DataFrame): String = {
        val p = df.queryExecution.executedPlan.toString
        if (p.contains("SortAggregate")) "SortAggregate"
        else if (p.contains("HashAggregate")) "HashAggregate"
        else "other"
      }
      val maxBy = graft.ops.EgvOps.latestByKey(ev, Seq("user_id"), "ts", "event_id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      val window = ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      val mx = ev.groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"))).as("__mx"))
        .select(col("user_id").as("__u"), col("__mx"))
      val twoPass = ev.as("e").join(mx,
        col("e.user_id") === col("__u") &&
          struct(col("e.ts"), col("e.event_id")) === col("__mx"))
        .select(ev.columns.map(c => col(s"e.$c")): _*)
      println("SCRATCH latest aggKinds: max_by=" + aggKind(maxBy) +
        " twoPassAgg=" + aggKind(mx))
      for (pass <- 1 to 3) {
        time(s"p$pass latest max_by(struct)") { maxBy.count() }
        time(s"p$pass latest window rn=1") { window.count() }
        time(s"p$pass latest two-pass join") { twoPass.count() }
      }
      // Same three shapes on the upsert-merge workload (orders + updates).
      val orders = Tables.orders(spark, d)
      val base = orders.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), lit(0).as("v"))
      val updates = orders.filter(pmod(col("o_orderkey"), lit(10)) === 3)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"), lit(1).as("v"))
      val allr = base.unionAll(updates)
      val mMaxBy = allr.groupBy(col("o_orderkey"))
        .agg(max_by(struct(col("o_orderstatus"), col("o_totalprice"), col("v")),
          col("v")).as("__m"))
      val wv = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderkey")).orderBy(col("v").desc)
      val mWindow = allr.withColumn("rn", row_number().over(wv))
        .filter(col("rn") === 1).drop("rn")
      val mvx = allr.groupBy(col("o_orderkey")).agg(max(col("v")).as("__v"))
        .select(col("o_orderkey").as("__k"), col("__v"))
      val mTwoPass = allr.as("a").join(mvx,
        col("a.o_orderkey") === col("__k") && col("a.v") === col("__v"))
        .select(allr.columns.map(c => col(s"a.$c")): _*)
      println("SCRATCH merge aggKinds: max_by=" + aggKind(mMaxBy) +
        " twoPassAgg=" + aggKind(mvx))
      for (pass <- 1 to 3) {
        time(s"p$pass merge max_by(struct)") { mMaxBy.count() }
        time(s"p$pass merge window rn=1") { mWindow.count() }
        time(s"p$pass merge two-pass join") { mTwoPass.count() }
      }
      spark.stop(); return
    }

    // Plan + stage dissection of dedup_ngram_jaccard at sf0.1.
    if (args.contains("jaccard")) {
      val docs = Tables.documents(spark, d)
      val q = DedupOps.jaccardPairs(docs, "text", "doc_id", 0.8)
      q.count()
      val p = q.queryExecution.executedPlan.toString
      println("SCRATCH jaccard scans=" + (p.split("Scan parquet").length - 1) +
        " exchanges=" + (p.split("\\bExchange").length - 1) +
        " reused=" + (p.split("ReusedExchange").length - 1))
      for (pass <- 1 to 2) {
        time(s"p$pass invAll distinct") {
          DedupOps.shingleInv(docs, "text", "doc_id").distinct().count()
        }
        time(s"p$pass full jaccardPairs") {
          DedupOps.jaccardPairs(docs, "text", "doc_id", 0.8).count()
        }
        time(s"p$pass jaccardPairs persisted-inv") {
          val invAll = DedupOps.shingleInv(docs, "text", "doc_id").distinct()
            .persist()
          try {
            val keep = invAll.groupBy("h").agg(count(lit(1)).as("df"))
              .filter(col("df") <= DedupOps.MaxShingleFreq).select("h")
            val inv = invAll.join(keep, Seq("h"), "left_semi")
            val counts = inv.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
            val pairs = inv.as("a").join(inv.as("b"),
                col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
              .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
              .agg(count(lit(1)).as("common"))
            pairs
              .join(counts.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
              .join(counts.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
              .withColumn("jaccard",
                col("common").cast("double") / (col("na") + col("nb") - col("common")))
              .filter(col("jaccard") >= 0.8).count()
          } finally invAll.unpersist()
        }
      }
      spark.stop(); return
    }

    // Stage dissection of dedup_embedding_lsh at sf0.1.
    if (args.contains("lsh")) {
      import graft.ops.SimOps
      graft.catalyst.GraftFunctions.register(spark)
      val tables = graft.queries.DedupQueries.LshTables
      val v = SimOps.withNorm(
        Tables.embeddings(spark, d).select("vec_id", "embedding"), "embedding", "n")
      for (pass <- 1 to 2) {
        time(s"p$pass plain scan") {
          Tables.embeddings(spark, d).select("vec_id", "embedding").count()
        }
        time(s"p$pass withNorm (1 array_dot)") { v.count() }
        time(s"p$pass 1-table bucket (4 dots)") {
          v.withColumn("b", SimOps.lshBucket("embedding", tables.head)).count()
        }
        time(s"p$pass 8-table buckets, no explode") {
          v.withColumn("bks", array(tables.map(p => SimOps.lshBucket("embedding", p)): _*)).count()
        }
        time(s"p$pass buckets only") {
          val keyed = v.withColumn("bks",
            array(tables.map(p => SimOps.lshBucket("embedding", p)): _*))
          keyed.select(col("vec_id"),
            posexplode(col("bks")).as(Seq("tbl", "bucket"))).count()
        }
        time(s"p$pass candidates (pre-dedup)") {
          val keyed = v.withColumn("bks",
            array(tables.map(p => SimOps.lshBucket("embedding", p)): _*))
          val b = keyed.select(col("vec_id"),
            posexplode(col("bks")).as(Seq("tbl", "bucket")))
          b.as("a").join(b.as("b"),
            col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
              col("a.vec_id") < col("b.vec_id")).count()
        }
        time(s"p$pass full pipeline") {
          SimOps.cosineLshPairs(v.select("vec_id", "embedding"), 0.45, tables).count()
        }
      }
      val keyed = v.withColumn("bks",
        array(tables.map(p => SimOps.lshBucket("embedding", p)): _*))
      val b = keyed.select(col("vec_id"),
        posexplode(col("bks")).as(Seq("tbl", "bucket")))
      val j = b.as("a").join(b.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      j.count()
      println("SCRATCH candidates plan:\n" + j.queryExecution.executedPlan.toString.take(4000))
      spark.stop(); return
    }
    val docs = Tables.documents(spark, d)
    for (_ <- 1 to 2) {
      // (a) tokens only
      time("tokens size") {
        docs.select(size(TextOps.tokens(col("text"))).as("n")).agg(sum("n")).collect()(0)
      }
      // (b) shingle strings via HOF, no hashing
      time("shingle strings HOF") {
        docs.withColumn("__toks", TextOps.tokens(col("text")))
          .select(explode(expr(
            """CASE WHEN size(__toks) < 3 THEN CAST(array() AS ARRAY<STRING>)
               ELSE transform(sequence(0, size(__toks) - 3),
                 j -> concat_ws(' ', __toks[j], __toks[j+1], __toks[j+2])) END""")).as("s"))
          .count()
      }
      // (c) full shingle-hash arrays via HOF (current shingleSets)
      time("shingle hash arrays HOF (current)") {
        DedupOps.shingleSets(docs, "text", "doc_id")
          .select(size(col("sh")).as("n")).agg(sum("n")).collect()(0)
      }
      // (d) explode strings then codegen hash
      time("explode strings then codegen md5/conv") {
        docs.withColumn("__toks", TextOps.tokens(col("text")))
          .select(col("doc_id"), explode(expr(
            """CASE WHEN size(__toks) < 3 THEN CAST(array() AS ARRAY<STRING>)
               ELSE transform(sequence(0, size(__toks) - 3),
                 j -> concat_ws(' ', __toks[j], __toks[j+1], __toks[j+2])) END""")).as("s"))
          .select(col("doc_id"), TextOps.hash64(col("s")).as("h"))
          .distinct().count()
      }
      // (e) signatures from sets (current path)
      time("signatures (explode+groupBy 16 mins)") {
        DedupOps.signatures(
          DedupOps.shingleInv(docs, "text", "doc_id"), 16).count()
      }
      // (f) full minhashLshPairs
      time("minhashLshPairs full") {
        DedupOps.minhashLshPairs(docs, "text", "doc_id", 0.8).count()
      }
      // (g) jaccardPairs full
      time("jaccardPairs full") {
        DedupOps.jaccardPairs(docs, "text", "doc_id", 0.8).count()
      }
    }

    // PQ-ADC stage bisect: which stage of topKPqAdc carries the ~8 s
    // warm cost at sf0.01 (500 vectors)?
    if (args.contains("pq")) {
      import graft.ops.SimOps
      import graft.queries.SimQueries._
      graft.catalyst.GraftFunctions.register(spark)
      val sf = "/root/testdata/sf0.01"
      val vecs = Tables.embeddings(spark, sf)
      val d = Dim / PqM
      def vNorm = {
        val vRaw = vecs.select(col("vec_id"), col("embedding"),
          sqrt(expr("array_dot(embedding, embedding)")).as("vn"))
        vRaw.select(col("vec_id"),
          when(col("vn") === 0d, transform(col("embedding"), x => x.cast("double")))
            .otherwise(transform(col("embedding"), x => x.cast("double") / col("vn")))
            .as("ne"))
      }
      val cent: Array[Array[Double]] = vNorm
        .withColumn("h", TextOps.hash64(concat(lit("pq"), col("vec_id").cast("string"))))
        .orderBy(col("h"), col("vec_id")).limit(PqK)
        .select(col("ne")).collect().map(_.getSeq[Double](0).toArray)
      def dist(mi: Int, ki: Int) = SimOps.pqSubDist(col("ne"), cent, mi, ki, d)
      val codeArr = array((0 until PqM).map { mi =>
        array_min(array((0 until PqK).map(ki =>
          struct(dist(mi, ki).as("d"), lit(ki).as("k"))): _*)).getField("k")
      }: _*)
      val lutArr = array((0 until PqM).map { mi =>
        array((0 until PqK).map(ki =>
          floor(dist(mi, ki) * 1e6 + 0.5).cast("long")): _*)
      }: _*)
      for (pass <- Seq("cold", "warm")) {
        time(s"$pass norm only") {
          vNorm.agg(sum(element_at(col("ne"), 1))).collect() }
        time(s"$pass codes (500x512 dists)") {
          vNorm.select(col("vec_id"), codeArr.as("codes"))
            .agg(sum(element_at(col("codes"), 1))).collect() }
        time(s"$pass lut (10x512 dists)") {
          vNorm.filter(col("vec_id") < 10)
            .select(col("vec_id"), lutArr.as("lm"))
            .agg(sum(element_at(element_at(col("lm"), 1), 1))).collect() }
        time(s"$pass full topKPqAdc") {
          SimOps.topKPqAdc(vecs, col("vec_id") < 10, K, PqM, PqK, Dim,
            PqShortlist).count() }
      }
    }
    // Which TgtHllType does Spark's hll_sketch_agg build? Compare the SQL
    // aggregate's estimate against driver-side DataSketches HllSketch in
    // HLL_4 and HLL_8 on identical ids.
    // IVF assignment probe: is the nested-HOF integer-L2 distance map
    // (transform -> aggregate(zip_with)) the hot part of the trained-IVF
    // pipelines, and what does the codegen'd array_dot decomposition
    // (v·v + c·c − 2·v·c) buy at the same exact-integer values?
    if (args.contains("ivfassign")) {
      graft.catalyst.GraftFunctions.register(spark)
      val rnd = new scala.util.Random(7)
      val cents: Seq[Seq[Long]] =
        Seq.fill(32)(Seq.fill(64)((rnd.nextDouble() * 2e6 - 1e6).toLong))
      val micro = Tables.embeddings(spark, d)
        .select(col("vec_id"), expr(
          """transform(embedding, x ->
             CAST(floor(CAST(x AS DOUBLE) * 1000000.0d + 0.5d) AS BIGINT))""")
          .as("vm"))
      def t(tag: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"IVFASSIGN $tag ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
      val n = micro.count()
      println(s"IVFASSIGN n=$n")
      for (pass <- 1 to 2) {
        t(s"hof$pass") {
          graft.Materialize(micro
            .withColumn("dists", transform(typedLit(cents), c =>
              aggregate(zip_with(col("vm"), c, (a, b) => (a - b) * (a - b)),
                lit(0L), (acc, x) => acc + x)))
            .withColumn("cl", array_position(col("dists"),
              array_min(col("dists"))).cast("int"))
            .select(col("vec_id"), col("cl")))
        }
        t(s"dot$pass") {
          val centsD = cents.map(_.map(_.toDouble))
          val cc = cents.map(c => c.map(x => x.toDouble * x).sum)
          val vmd = transform(col("vm"), _.cast("double"))
          val dists = array(cents.indices.map(i =>
            (col("__vv") + lit(cc(i)) -
              lit(2.0) * expr(s"array_dot(__vmd, __c$i)")).cast("long")): _*)
          var df = micro.withColumn("__vmd", vmd)
            .withColumn("__vv", expr("array_dot(__vmd, __vmd)"))
          cents.indices.foreach(i =>
            df = df.withColumn(s"__c$i", typedLit(centsD(i))))
          graft.Materialize(df.withColumn("dists", dists)
            .withColumn("cl", array_position(col("dists"),
              array_min(col("dists"))).cast("int"))
            .select(col("vec_id"), col("cl")))
        }
        t(s"seq$pass") {
          val cmLit = typedLit(cents.map(_.map(_.toDouble)))
          val ccLit = typedLit(cents.map(_.map(x => x.toDouble * x).sum))
          graft.Materialize(micro
            .withColumn("__vmd", transform(col("vm"), x => x.cast("double")))
            .withColumn("__vv",
              call_function("array_dot", col("__vmd"), col("__vmd")))
            .withColumn("dists",
              transform(sequence(lit(1), lit(cents.size)), i =>
                (col("__vv") + element_at(ccLit, i) - lit(2.0d) *
                  call_function("array_dot", col("__vmd"),
                    element_at(cmLit, i))).cast("long")))
            .withColumn("cl", array_position(col("dists"),
              array_min(col("dists"))).cast("int"))
            .select(col("vec_id"), col("cl")))
        }
      }
    }
    // Decompose the trained-IVF gate: training (cold + memo-hit), the
    // full query, and the query again warm — where do the seconds sit?
    if (args.contains("ivfpipe")) {
      graft.catalyst.GraftFunctions.register(spark)
      import graft.ops.SimOps
      def t(tag: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"IVFPIPE $tag ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
      val emb = Tables.embeddings(spark, d)
      t("train_cold") {
        SimOps.kmeansCentroidsMicro(emb, 32, 4, 64, "ivfkm",
          normalize = true, trainCap = SimOps.IvfTrainCap * 32)
      }
      t("train_again") {
        SimOps.kmeansCentroidsMicro(emb, 32, 4, 64, "ivfkm",
          normalize = true, trainCap = SimOps.IvfTrainCap * 32)
      }
      for (pass <- 1 to 3)
        t(s"query$pass") {
          graft.Materialize(SimOps.topKIvf(emb, col("vec_id") < 10, 10,
            c = 32, nprobe = 10, trainRounds = 4, dim = 64))
        }
    }
    if (args.contains("hll")) {
      import org.apache.datasketches.hll.{HllSketch, TgtHllType}
      val ids = Tables.documents(spark, "/root/testdata/sf0.01")
        .select(col("doc_id")).collect().map(_.getLong(0))
      val sparkEst = Tables.documents(spark, "/root/testdata/sf0.01")
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(doc_id, 12))"))
        .collect()(0).getLong(0)
      for (t <- Seq(TgtHllType.HLL_4, TgtHllType.HLL_8)) {
        val sk = new HllSketch(12, t)
        ids.foreach(sk.update)
        println(s"HLLCHECK $t driver=${Math.round(sk.getEstimate)} spark=$sparkEst")
      }
    }
    spark.stop()
  }
}
