package graft.queries
import graft.QueryDef
object SimQueries { val defs: Seq[QueryDef] = Seq.empty }
