package graft.queries

/** Placeholder registries — filled in as the corresponding operator
  * families land (SURVEY.md §7.2 steps 5-8). */
object DedupQueries { def defs: Seq[QueryDef] = Seq.empty }
object SimilarityQueries { def defs: Seq[QueryDef] = Seq.empty }
object TextQueries { def defs: Seq[QueryDef] = Seq.empty }
object PipelineQueries { def defs: Seq[QueryDef] = Seq.empty }
