package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The query registry is assembled from the per-module `defs` sequences;
  * entries with an oracle feed the DuckDB hash-compare, the rest get the
  * driver's rows-only check.
  */
object SparkEntry {

  /** All declared capabilities (SURVEY §2B + LLM-pipeline extensions). */
  def all: Seq[(String, QueryDef)] =
    Relational.defs ++ TextAnalysis.defs ++ Dedup.defs ++ Similarity.defs ++
      MultiModal.defs ++ Reshape.defs ++ Analytic.defs ++ Stats.defs ++
      Pipeline.defs ++ Graph.defs ++ Learn.defs ++ Maintenance.defs ++
      Release.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_agg_tpchq1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, d) => name -> d.build }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (name, QueryDef(_, Some(sql))) => name -> sql }.toMap
}
