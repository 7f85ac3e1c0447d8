package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the module registries; each entry pairs the
  * Spark implementation with its DuckDB oracle SQL (when SQL-expressible).
  */
object SparkEntry {

  def registry: Map[String, QueryDef] =
    graft.queries.Relational.defs ++
      graft.queries.Windows.defs ++
      graft.queries.Grouping.defs ++
      graft.queries.Functions.defs ++
      graft.queries.TimeWindows.defs ++
      graft.queries.Ingestion.defs ++
      graft.queries.Extra.defs ++
      graft.ext.Dedup.defs ++
      graft.ext.Similarity.defs ++
      graft.ext.TextAnalytics.defs ++
      graft.ext.Multimodal.defs ++
      graft.ext.Sampling.defs ++
      graft.ext.Assembly.defs ++
      graft.ext.Incremental.defs ++
      graft.ext.IvfPqIndex.defs ++
      graft.ext.Layout.defs ++
      graft.ext.Rollup.defs ++
      graft.ext.MergeTable.defs ++
      graft.ext.Ivm.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("q01_topk").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
