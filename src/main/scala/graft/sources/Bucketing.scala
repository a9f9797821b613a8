package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-hash-partition both sides of a recurring
  * join on the join key so the join is co-located — zero exchange at
  * query time. At 100 TB this converts the fact⋈fact shuffle (the
  * dominant cost of q_join_facts-shaped queries) into a one-time write
  * cost amortized over every subsequent join.
  *
  * Buckets must agree on (column, count) across both tables; Spark then
  * plans SortMergeJoin with no Exchange on either side (asserted in
  * BucketingSpec).
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (overwrites). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Join two pre-bucketed tables on their bucket column — planned
    * without any Exchange when bucket specs match. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }

  /** Hive-style partitioned layout: one directory per partition value.
    * The complement of bucketing — an equality/IN filter on the
    * partition column prunes whole directories at PLANNING time
    * (`PartitionFilters` in the scan, zero I/O for pruned partitions),
    * where a parquet row-group filter still has to open every file.
    * Partition by low-cardinality columns a 100 TB query filters on
    * (date, source, language); never by high-cardinality keys (that
    * recreates the small-files problem `FileSources.compactParquet`
    * exists to fix). */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Clustered layout write — the table-maintenance pass a 100 TB store
    * runs so later scans can SKIP row groups: range-repartition by the
    * cluster key (contiguous key ranges per file, so per-file min/max
    * stats are disjoint and a key predicate prunes to ~one file), sort
    * within partitions (ordered row groups inside each file), and
    * optionally bound file size with maxRecordsPerFile. Splits honor the
    * sort, but a key whose duplicate run straddles a cut appears in two
    * adjacent files — their ranges then touch at that one boundary key
    * (a point predicate reads 2 files, not 1); strict pairwise
    * disjointness holds when the cluster key is unique or
    * maxRecordsPerFile is unset. The parquet-native sibling of
    * Z-ordering: 1-D clustering, exact, no curve math.
    */
  def writeClustered(df: DataFrame, path: String, clusterCol: String,
                     files: Int, maxRecordsPerFile: Long = 0L): Unit = {
    val w = df.repartitionByRange(files, org.apache.spark.sql.functions.col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode(SaveMode.Overwrite)
    (if (maxRecordsPerFile > 0)
      w.option("maxRecordsPerFile", maxRecordsPerFile) else w)
      .parquet(path)
  }
}
