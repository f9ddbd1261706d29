package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{Analytics, CohortQueries, Curation, CurationB, CurationC, Diagnostics, Evaluation, Extras, Fit, GraphB, Indexing, Lakehouse, Lifecycle, LlmData, Media, Operational, Privacy, Recommend, Relational, RelationalB, ScaleOps, ScaleOpsB, Stats, StatsB, StatsC, Training, TrainingB, TrainingC, TrainingD, TrainingE, TrainingF}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinBroadcast(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ RelationalB.queries ++ CohortQueries.queries ++
      Analytics.queries ++ LlmData.queries ++ Extras.queries ++ Curation.queries ++
      CurationB.queries ++ CurationC.queries ++ ScaleOps.queries ++ Operational.queries ++
      Stats.queries ++ StatsB.queries ++ Lifecycle.queries ++ Recommend.queries ++
      GraphB.queries ++ Diagnostics.queries ++ Privacy.queries ++ ScaleOpsB.queries ++
      StatsC.queries ++ Evaluation.queries ++ Fit.queries ++ Indexing.queries ++
      Training.queries ++ TrainingB.queries ++ TrainingC.queries ++
      TrainingD.queries ++ TrainingE.queries ++ TrainingF.queries ++ Media.queries ++
      Lakehouse.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ RelationalB.oracles ++ CohortQueries.oracles ++
      Analytics.oracles ++ LlmData.oracles ++ Extras.oracles ++ Curation.oracles ++
      CurationB.oracles ++ CurationC.oracles ++ ScaleOps.oracles ++ Operational.oracles ++
      Stats.oracles ++ StatsB.oracles ++ Lifecycle.oracles ++ Recommend.oracles ++
      GraphB.oracles ++ Diagnostics.oracles ++ Privacy.oracles ++ ScaleOpsB.oracles ++
      StatsC.oracles ++ Evaluation.oracles ++ Fit.oracles ++ Indexing.oracles ++
      Training.oracles ++ TrainingB.oracles ++ TrainingC.oracles ++
      TrainingD.oracles ++ TrainingE.oracles ++ TrainingF.oracles ++ Media.oracles ++
      Lakehouse.oracles
}
