package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are grouped per domain under graft.queries; this object merges
  * them. Every key present in `oracleSql` is hash-compared against DuckDB
  * on the same parquet tables; keys only in `queries` get a rows-only
  * check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_cosine_single")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    VectorQueries.queries ++
    RelationalQueries.queries ++
    TextQueries.queries ++
    RagQueries.queries ++
    EventQueries.queries ++
    DedupQueries.queries ++
    InfraQueries.queries ++
    MiscQueries.queries ++
    QualityQueries.queries ++
    FacadeQueries.queries ++
    PipelineQueries.queries ++
    UrlQueries.queries ++
    WebQueries.queries

  /** Build-vs-query phase splits for the bench-heavy cells (emitted by
    * Bench.scala as the JSON line's trailing `"phases"` map) — every
    * cell > ~3s at sf0.1 carries one, so drift triage reads phase maps
    * instead of re-running. */
  def phases: Map[String, (SparkSession, String) => Map[String, Double]] =
    FacadeQueries.phases ++ InfraQueries.phases ++ DedupQueries.phases ++
    PipelineQueries.phases ++ VectorQueries.phases ++ QualityQueries.phases ++
    EventQueries.phases ++ WebQueries.phases ++ TextQueries.phases

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    VectorQueries.oracleSql ++
    RelationalQueries.oracleSql ++
    TextQueries.oracleSql ++
    RagQueries.oracleSql ++
    EventQueries.oracleSql ++
    DedupQueries.oracleSql ++
    InfraQueries.oracleSql ++
    MiscQueries.oracleSql ++
    QualityQueries.oracleSql ++
    FacadeQueries.oracleSql ++
    PipelineQueries.oracleSql ++
    UrlQueries.oracleSql ++
    WebQueries.oracleSql
}
