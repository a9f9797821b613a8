package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: corpus
  * subsampling and per-class mixing that is REPRODUCIBLE — the same
  * (salt, id) always lands in or out of the sample, independent of
  * partitioning, task retries, or cluster size.
  *
  * Why not `df.sample()`/rand(): Spark's sampling draws from a
  * per-partition RNG stream, so the selected set changes with partition
  * layout and task re-execution — a lineage hazard for training data
  * (a retried task silently trains on different rows). Hashing the row
  * id is a pure narrow map: codegen'd, pushdown-friendly, and the
  * sample is a stable, auditable function of the data.
  *
  * The hash is the engine-wide 60-bit md5 ([[TextOps.hash64]]), bucketed
  * into 10000 permille-of-permille slots; rates are expressed as integer
  * thresholds out of 10000 so the predicate compares integers, not
  * floats, in both engines.
  */
object SampleOps {

  val Buckets = 10000

  /** Stable sample bucket in [0, 10000) for (salt, id). */
  def sampleBucket(idCol: Column, salt: String): Column =
    pmod(TextOps.hash64(concat(lit(salt), idCol.cast("string"))), lit(Buckets))

  def sampleBucketSql(idExpr: String, salt: String): String =
    s"${TextOps.hash64Sql(s"'$salt' || CAST($idExpr AS VARCHAR)")} % $Buckets"

  /** Keep ~rate10k/10000 of rows, deterministically. */
  def hashSample(df: DataFrame, idCol: String, rate10k: Int,
                 salt: String): DataFrame =
    df.filter(sampleBucket(col(idCol), salt) < rate10k)

  /** Per-stratum rates (class mixing): strata absent from `rates` are
    * dropped — the unrolled when-chain keeps the predicate a codegen'd
    * scalar, no join against a rates table. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Seq[(String, Int)], salt: String): DataFrame = {
    val threshold = rates.foldRight(lit(0)) { case ((stratum, r), acc) =>
      when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(sampleBucket(col(idCol), salt) < threshold)
  }

  def stratifiedThresholdSql(strataExpr: String, rates: Seq[(String, Int)]): String =
    rates.foldRight("0") { case ((stratum, r), acc) =>
      s"CASE WHEN $strataExpr = '$stratum' THEN $r ELSE $acc END"
    }
}
