package graft

import org.apache.spark.sql.types._

/** First line of defense against upstream testdata drift: asserts the loaded
  * schema of every `Tables.names` table at sf0.001. When the driver
  * regenerates `/root/testdata` with different physical types (as happened in
  * round 5, when `events.ts` moved from TIMESTAMP(NANOS) to timestamp[us]),
  * this fails with one readable diff instead of 27 opaque query errors.
  *
  * The assertions pin the LOGICAL contract downstream code relies on (names,
  * order, and the types queries compute with), not the parquet physical
  * encoding — `Tables.events` is expected to normalize `ts` to TIMESTAMP
  * whatever the export used.
  */
class SchemaSmokeSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def fields(name: String): Seq[(String, DataType)] = {
    val df = name match {
      case "events" => Tables.events(spark, d)
      case n        => Tables.table(spark, d, n)
    }
    df.schema.fields.toSeq.map(f => (f.name, f.dataType))
  }

  // timestamp[us] parquet columns read as NTZ or LTZ depending on the
  // export's isAdjustedToUTC flag; both behave identically under the
  // project-wide UTC session, so accept either for raw passthrough columns.
  private def ts(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  test("all tables load and events.ts is normalized to TIMESTAMP") {
    assert(fields("region") === Seq("r_regionkey" -> IntegerType, "r_name" -> StringType))
    assert(fields("nation") === Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType))
    assert(fields("customer") === Seq(
      "c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType))
    assert(fields("supplier") === Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType))
    assert(fields("part") === Seq(
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType))

    val ord = fields("orders")
    assert(ord.map(_._1) === Seq(
      "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
      "o_orderpriority"))
    assert(ts(ord.toMap.apply("o_orderdate")), s"o_orderdate: ${ord.toMap.apply("o_orderdate")}")

    val li = fields("lineitem")
    assert(li.map(_._1) === Seq(
      "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
      "l_shipdate"))
    assert(ts(li.toMap.apply("l_shipdate")), s"l_shipdate: ${li.toMap.apply("l_shipdate")}")

    // events is the normalization-sensitive one: whatever the physical export
    // (nanos-as-long or timestamp[us]), the loader must surface TIMESTAMP.
    assert(fields("events") === Seq(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))

    assert(fields("documents") === Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assert(fields("embeddings") === Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType))
  }

  test("every table is non-empty at sf0.001") {
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.events(spark, d) else Tables.table(spark, d, n)
      assert(df.head(1).nonEmpty, s"table $n is empty")
    }
  }
}
