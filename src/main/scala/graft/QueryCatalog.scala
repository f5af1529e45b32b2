package graft

import graft.analytics.{GoldQueries, LakeQueries, QueryDef, Relational}
import graft.dedup.DedupQueries
import graft.ml.MlQueries
import graft.similarity.SimilarityQueries
import graft.text.{TextQueries, UnigramLm}

/** Aggregated query catalog — one QueryDef per operator claimed in
  * SURVEY.md §2 plus the training-data-pipeline extensions. SparkEntry
  * derives the driver's `queries`/`oracleSql` maps from this. */
object QueryCatalog {
  val all: Seq[QueryDef] =
    Relational.defs ++ TextQueries.defs ++ UnigramLm.defs ++
      DedupQueries.defs ++ SimilarityQueries.defs ++ GoldQueries.defs ++
      MlQueries.defs ++ LakeQueries.defs

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")
}
