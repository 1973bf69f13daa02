package graft.queries

/** Placeholder registries — filled in as the corresponding operator
  * families land (SURVEY.md §7.2 steps 5-8). */
object PipelineQueries { def defs: Seq[QueryDef] = Seq.empty }
