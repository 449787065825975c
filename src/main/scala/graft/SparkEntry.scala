package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ RelationalExt.queries ++ RelationalSupply.queries ++
      StatsOps.queries ++ StreamSemantics.queries ++
      EventAnalytics.queries ++ EventValue.queries ++ Joins.queries ++
      Dedup.queries ++ TextAnalysis.queries ++ TextCorpus.queries ++
      QualityClassifier.queries ++ Retrieval.queries ++
      Similarity.queries ++ Clustering.queries ++
      Multimodal.queries ++ Pipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ RelationalExt.oracleSql ++ RelationalSupply.oracleSql ++
      StatsOps.oracleSql ++ StreamSemantics.oracleSql ++
      EventAnalytics.oracleSql ++ EventValue.oracleSql ++ Joins.oracleSql ++
      Dedup.oracleSql ++ TextAnalysis.oracleSql ++ TextCorpus.oracleSql ++
      QualityClassifier.oracleSql ++ Retrieval.oracleSql ++
      Similarity.oracleSql ++ Clustering.oracleSql ++
      Multimodal.oracleSql ++ Pipeline.oracleSql
}
