package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.ops.SimOps

/** Similarity-search surface over `embeddings` (north star):
  * brute-force cosine top-k (exact baseline) and random-hyperplane
  * LSH-bucketed approximate top-k (the 100 TB scale path).
  */
object SimQueries {

  val K = 10
  /** Queries = the first 10 vectors; predicate kept SQL-expressible. */
  val QueryPredSql = "vec_id < 10"
  /** 6 hyperplanes → 64 buckets. */
  val Planes = SimOps.hyperplanes(planes = 6, dim = 64)
  /** IVF coarse quantizer: 16 cells, 4 probed per query (~25% of the
    * corpus scanned — recall/latency knob). */
  val Cells = 16
  val NProbe = 4

  val defs: Seq[QueryDef] = Seq(

    QueryDef("sim_topk_brute",
      (s, d) => {
        graft.catalyst.GraftFunctions.register(s)
        SimOps.topKBruteForce(Tables.embeddings(s, d), col("vec_id") < 10, K)
      },
      Some(SimOps.topKBruteForceSql("embeddings", QueryPredSql, K)),
      presentOrder = Seq("query_id", "rank")),

    QueryDef("sim_topk_lsh",
      (s, d) => {
        graft.catalyst.GraftFunctions.register(s)
        SimOps.topKLsh(Tables.embeddings(s, d), col("vec_id") < 10, K, Planes)
      },
      Some(SimOps.topKLshSql("embeddings", QueryPredSql, K, Planes)),
      presentOrder = Seq("query_id", "rank")),

    QueryDef("sim_topk_ivf",
      (s, d) => {
        graft.catalyst.GraftFunctions.register(s)
        SimOps.topKIvf(Tables.embeddings(s, d), col("vec_id") < 10, K,
          c = Cells, nprobe = NProbe)
      },
      Some(SimOps.topKIvfSql("embeddings", QueryPredSql, K,
        c = Cells, nprobe = NProbe)),
      presentOrder = Seq("query_id", "rank")),

    QueryDef("sim_quantize",
      (s, d) => SimOps.quantizeInt8(Tables.embeddings(s, d)),
      Some(SimOps.quantizeInt8Sql("embeddings")),
      presentOrder = Seq("vec_id"))
  )
}
