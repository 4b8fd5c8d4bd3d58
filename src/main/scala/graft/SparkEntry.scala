package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticQueries, BehaviorQueries, CoreQueries, CurationQueries, ExtendedQueries, FunctionQueries, GovernanceQueries, GraphQueries, InsightQueries, MultimodalQueries, PipelineQueries, PlanningQueries, PretrainQueries, ResolutionQueries, SourceQueries, SqlDepthQueries, StatsQueries, StreamingQueries, TemporalQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY.md §2 plus the
  * training-data pipeline ops) to a DataFrame builder over the test tables
  * in `dir`; `oracleSql` carries the DuckDB-equivalent SQL for each entry
  * that is SQL-expressible (same column names, deterministic ordering).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q03RevenueByCustomer(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ PipelineQueries.queries ++ TextQueries.queries ++
      VectorQueries.queries ++ MultimodalQueries.queries ++ ExtendedQueries.queries ++
      FunctionQueries.queries ++ TemporalQueries.queries ++ AnalyticQueries.queries ++ StreamingQueries.queries ++ SourceQueries.queries ++ CurationQueries.queries ++ BehaviorQueries.queries ++ InsightQueries.queries ++ SqlDepthQueries.queries ++ PretrainQueries.queries ++ GraphQueries.queries ++ ResolutionQueries.queries ++ PlanningQueries.queries ++ StatsQueries.queries ++ GovernanceQueries.queries

  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ PipelineQueries.oracles ++ TextQueries.oracles ++
      VectorQueries.oracles ++ MultimodalQueries.oracles ++ ExtendedQueries.oracles ++
      FunctionQueries.oracles ++ TemporalQueries.oracles ++ AnalyticQueries.oracles ++ StreamingQueries.oracles ++ SourceQueries.oracles ++ CurationQueries.oracles ++ BehaviorQueries.oracles ++ InsightQueries.oracles ++ SqlDepthQueries.oracles ++ PretrainQueries.oracles ++ GraphQueries.oracles ++ ResolutionQueries.oracles ++ PlanningQueries.oracles ++ StatsQueries.oracles ++ GovernanceQueries.oracles
}
