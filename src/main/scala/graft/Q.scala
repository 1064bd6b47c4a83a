package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark DataFrame program plus (optionally) the
  * ANSI-SQL oracle the driver runs in DuckDB over the same parquet tables.
  *
  * Contract (SURVEY.md §5): results must be deterministic — stable orderBy
  * on unique keys, exact (decimal-backed) aggregates, column names aliased
  * identically on both sides.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def all: Seq[Q]
}
