package graft.queries

object PipelineQueries { def defs: Seq[QueryDef] = PipelineQueriesImpl.defs }
