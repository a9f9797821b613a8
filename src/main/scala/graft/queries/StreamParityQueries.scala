package graft.queries
import graft.QueryDef
object StreamParityQueries { val defs: Seq[QueryDef] = Seq.empty }
