package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Egv, Schemas}

/** S1/S2 — the reference's ingestion edge (ProducerDexcom.java:91-141):
  * OAuth2 token refresh + windowed EGV fetch from the Dexcom REST API,
  * landed as a DataFrame.
  *
  * Ingestion is driver-side, single-machine work (the API returns ~2-3
  * records per 10-minute window — ProducerDexcom.java:92-94): it stays
  * OUT of the distributed engine core, exactly like the reference keeps
  * it outside Kafka Streams. The HTTP edge is injected (`TokenClient` /
  * `EgvClient`) so the module is testable in this zero-egress environment
  * and swappable for a real java.net.http client in deployment.
  */
trait TokenClient extends Serializable {
  /** POST /v2/oauth2/token with a refresh token → access token
    * (ProducerDexcom.java:113-141). */
  def refreshAccessToken(clientId: String, clientSecret: String,
                         refreshToken: String): String
}

trait EgvClient extends Serializable {
  /** GET /v2/users/self/egvs?startDate&endDate with a Bearer token →
    * raw JSON response body (ProducerDexcom.java:91-111). */
  def fetchEgvsJson(accessToken: String, startDate: String, endDate: String): String
}

object DexcomIngest {

  /** Parse the API envelope JSON ({unit, rateUnit, egvs: [...]}) and
    * explode the nested egvs array — DexcomEgvsResponse.java:5-9. */
  def parseEnvelope(spark: SparkSession, responseJson: String): Dataset[Egv] = {
    import spark.implicits._
    spark.createDataset(Seq(responseJson))
      .select(from_json(col("value"), Schemas.egvsResponse).as("r"))
      .select(explode(col("r.egvs")).as("egv"))
      .select("egv.*")
      .as[Egv]
  }

  /** Token refresh → fetch → parse → explode: the full S1+S2 edge. */
  def ingestWindow(spark: SparkSession, tokens: TokenClient, egvs: EgvClient,
                   clientId: String, clientSecret: String, refreshToken: String,
                   startDate: String, endDate: String): Dataset[Egv] = {
    val access = tokens.refreshAccessToken(clientId, clientSecret, refreshToken)
    parseEnvelope(spark, egvs.fetchEgvsJson(access, startDate, endDate))
  }
}

/** Generic file-source readers beyond parquet: schema-enforced JSON-lines
  * and CSV (header or not), plus the rate source for streaming tests.
  * Explicit schemas keep the scan prunable and the ingestion contract
  * honest (no runtime inference surprises at 100 TB).
  */
object FileSources {
  def jsonLines(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def csv(spark: SparkSession, path: String,
          schema: org.apache.spark.sql.types.StructType,
          header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** Streaming rate source: monotonically increasing (timestamp, value)
    * rows — the broker-free stand-in for a Kafka stream in tests/demos. */
  def rate(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()

  /** Small-files compaction: rewrite a parquet directory into
    * ~`targetFileBytes`-sized files and atomically swap it in
    * (write-to-tmp + rename via the Hadoop FS API, so it works on any
    * Hadoop-compatible filesystem). The small-files problem is a real
    * 100 TB failure mode — streaming sinks and fine-grained partitions
    * leave millions of KB-sized files whose per-file open/footer cost
    * dominates scans and whose listing OOMs the driver. Returns the
    * output file count. */
  def compactParquet(spark: SparkSession, dir: String,
                     targetFileBytes: Long = 128L << 20): Int = {
    val conf0 = spark.sparkContext.hadoopConfiguration
    val target0 = new org.apache.hadoop.fs.Path(dir)
    val fs0 = target0.getFileSystem(conf0)
    val oldGen = new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + ".compact.old")
    // Crash recovery: a previous run that died between the two renames
    // leaves the live path missing and the data under .compact.old —
    // restore it before reading (a naive re-run would fail on the scan).
    if (!fs0.exists(target0) && fs0.exists(oldGen)) {
      if (!fs0.rename(oldGen, target0))
        sys.error(s"compaction recovery failed: could not restore $oldGen to $dir")
    }
    // Reject Hive-partitioned layouts: compacting one would silently
    // inline the partition columns as data columns and lose the layout
    // (and its planning-time pruning). Partition-aware compaction is a
    // per-partition-directory rewrite — run this on each leaf directory.
    val hasPartitionDirs = fs0.listStatus(target0).exists(st =>
      st.isDirectory && st.getPath.getName.contains("="))
    if (hasPartitionDirs)
      sys.error(s"$dir contains Hive partition subdirectories; compact each " +
        "leaf partition directory instead (whole-tree compaction would " +
        "inline partition columns and break pruning)")
    val df = spark.read.parquet(dir)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = math.max(1,
      math.ceil(bytes.toDouble / targetFileBytes.toDouble).toInt)
    val tmp = dir.stripSuffix("/") + ".compact.tmp"
    df.repartition(parts).write.mode("overwrite").parquet(tmp)
    // Swap via rename-aside, not delete-then-rename: the live data must
    // survive a crash or failed rename at every step. Only after the new
    // data is in place is the old generation deleted. READER-VISIBLE
    // WINDOW: between the two renames the live path does not exist —
    // concurrent readers see a transient missing-path error (single-digit
    // milliseconds on HDFS-like stores; a crash inside the window is
    // healed by the recovery step above on the next run). Readers needing
    // zero-gap swaps should read through a manifest/view layer instead.
    fs0.delete(oldGen, true) // leftover from a previous completed swap
    if (!fs0.rename(target0, oldGen))
      sys.error(s"compaction swap failed: could not move $dir aside")
    if (!fs0.rename(new org.apache.hadoop.fs.Path(tmp), target0)) {
      fs0.rename(oldGen, target0) // restore the live generation
      sys.error(s"compaction swap failed: could not rename $tmp to $dir")
    }
    fs0.delete(oldGen, true)
    parts
  }
}
