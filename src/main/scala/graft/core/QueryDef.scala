package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query plus (optionally) the equivalent ANSI SQL the
  * driver runs in DuckDB over the same parquet tables (the correctness
  * oracle). Column names/aliases MUST match between `fn`'s output and the
  * oracle SQL — the driver sorts columns by name before hashing values.
  *
  * Every registry query carries an oracle as of round 9 (q20, the last
  * rows-only holdout, was restated as an acceptance row); `oracle` stays
  * an Option because Verify's dump contract distinguishes oracle-checked
  * dumps from rows-only ones, but new queries should never ship None —
  * restate the claim as a deterministic acceptance row instead.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): QueryDef =
    QueryDef(fn, Some(sql.stripMargin.trim))
}
