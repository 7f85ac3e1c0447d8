package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query plus (optionally) the equivalent ANSI SQL the
  * driver runs in DuckDB over the same parquet tables (the correctness
  * oracle). Column names/aliases MUST match between `fn`'s output and the
  * oracle SQL — the driver sorts columns by name before hashing values.
  *
  * Queries without an oracle (hash-based ops, approx sketches) get a
  * weaker rows-only check from the driver; keep those to a minimum.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): QueryDef =
    QueryDef(fn, Some(sql.stripMargin.trim))

  def noOracle(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, None)
}
