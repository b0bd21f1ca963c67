package graft.queries

import graft.QueryDef

/** Streaming queries driven through the `reftable` DSv2 source (filled in
  * once the source lands — see graft.sources.reftable).
  */
object StreamingOps {
  val defs: Seq[QueryDef] = Seq()
}
