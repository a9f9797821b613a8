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

  /** Morton (Z-order) key: the low `bits` bits of `a` and `b` interleaved
    * (a on odd positions, b on even) — a space-filling curve mapping 2-D
    * proximity to 1-D proximity. Inputs must be non-negative and below
    * 2^bits (higher bits are dropped; rescale or rank first if not).
    * Plain shift/mask Column algebra — codegen'd, no UDF. */
  def mortonCol(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
                bits: Int = 21): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    import org.apache.spark.sql.functions._
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** 2-column Z-order clustered write — [[writeClustered]]'s
    * multi-dimension sibling: range-repartition + sort on the Morton key
    * of (colA, colB), so each file covers a compact Z-range and therefore
    * a SMALL BOUNDING BOX in (colA, colB) space. Parquet footer min/max
    * stats on BOTH columns then prune files for predicates on EITHER
    * column (or both) — where 1-D clustering only ever prunes its single
    * key. The curve key is computed for partition+sort only and is not
    * written.
    *
    * Both columns are first rescaled to the curve's bit width from their
    * write-time min/max (one cheap agg): interleaving RAW values gives
    * the wider-ranged column all the high bits and degenerates to 1-D
    * clustering. Linear rescale matches uniform-ish keys; heavily skewed
    * columns want quantile (range-id) normalization instead — the same
    * slot, different bucket function. This is the layout pass a 100 TB
    * store runs when two independent filter columns matter (date ×
    * source, key × time); pruning is proven at runtime in `BucketingSpec`
    * via scan numOutputRows, not plan text. */
  def writeClusteredZ(df: DataFrame, path: String, colA: String, colB: String,
                      files: Int, bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions._
    // Cast the bounds (not just the rows) to long so integer/date/short
    // cluster columns work as advertised; empty input fails loudly.
    val r = df.agg(min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).collect()(0)
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"writeClusteredZ: empty input or all-null cluster column ($colA/$colB)")
    def norm(c: String, lo: Long, hi: Long) = {
      val span = math.max(hi - lo, 1L)
      (((col(c) - lo).cast("double") * ((1L << bits) - 1)) / span).cast("long")
    }
    val z = mortonCol(norm(colA, r.getLong(0), r.getLong(1)),
      norm(colB, r.getLong(2), r.getLong(3)), bits)
    df.repartitionByRange(files, z)
      .sortWithinPartitions(z)
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
  }
}
