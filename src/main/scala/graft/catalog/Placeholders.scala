package graft.catalog

/** Filled in by later build phases (SURVEY.md §7 step 5 extensions). */
object TextQueries { val all: Map[String, Q] = Map() }
object DedupQueries { val all: Map[String, Q] = Map() }
object SimilarityQueries { val all: Map[String, Q] = Map() }
object MultimodalQueries { val all: Map[String, Q] = Map() }
