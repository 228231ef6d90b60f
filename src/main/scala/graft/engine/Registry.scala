package graft.engine

import graft.operators._

/** Single source of truth for the declared query inventory (SURVEY.md §2.B).
  * `SparkEntry` derives its `queries` / `oracleSql` maps from here.
  */
object Registry {
  def all: Seq[GQuery] =
    Scans.all ++ Joins.all ++ Aggregations.all ++ Windows.all ++
      SetOps.all ++ Functions.all ++ LlmOps.all ++ ScaleOps.all ++
      Partitioned.all ++ Formats.all ++ PipelineOps.all ++ CorpusStats.all ++
      EventOps.all ++ Analytics.all ++ TpchShapes.all ++ SeriesOps.all ++
      StatOps.all ++ QualityOps.all ++ GraphOps.all ++ MetricOps.all ++
      SearchOps.all ++ InferOps.all ++ RecOps.all ++ EvalOps.all ++
      NonparamOps.all ++ LinkOps.all ++ RankOps.all ++ CausalOps.all

  def byName: Map[String, GQuery] = all.map(q => q.name -> q).toMap
}
