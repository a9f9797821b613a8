package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real registry lives in [[Catalog]]; each entry is a [[QueryDef]]
  * pairing the Spark implementation with its DuckDB oracle twin.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the reference's stateful enrichment pipeline (J1 interval lookup
    * join + dynamic categorization) over the events table via the
    * zero-shuffle first-match lookup.
    */
  def entry(spark: SparkSession): DataFrame =
    ops.EgvOps.lookupFirstMatch(
      Tables.events(spark, "/root/testdata/sf0.001"), model.Schemas.fixtureRanges)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Catalog.oracleSql
}
