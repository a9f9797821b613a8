package graft.queries
import graft.QueryDef
object DedupQueries { val defs: Seq[QueryDef] = Seq.empty }
