package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.Tables

/** One declared-inventory query (SURVEY.md §2): a Spark implementation plus
  * an optional ANSI-SQL oracle the driver runs in DuckDB over the same
  * parquet tables. `oracle = None` → the driver records a rows-only check.
  */
final case class Query(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline benchmark query (run at sf0.1 by Bench) */
    bench: Boolean = false)

object Catalog {

  lazy val all: Seq[Query] =
    Relational.queries ++ Aggregates.queries ++ Windows.queries ++
      SetOps.queries ++ Functions.queries ++ EventQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ MultimodalQueries.queries ++
      GraftFnQueries.queries

  lazy val byName: Map[String, Query] = all.map(q => q.name -> q).toMap

  // ---- shared helpers -----------------------------------------------------

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Register the named fixtures as temp views for `spark.sql` queries. */
  def registerViews(spark: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))

  /** Exact-decimal accumulation of a 2-decimal double measure: cast each row
    * to DECIMAL, sum exactly, return double. Bit-identical across engines
    * regardless of aggregation order (doubles would differ at ulp level
    * between Spark's partial-agg order and DuckDB's).
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum of a per-row double expression (deterministic IEEE result),
    * rounded to 4 decimals at the row level then summed exactly. */
  def dsum4(c: Column): Column = sum(c.cast(DecimalType(22, 4))).cast("double")

  /** Deterministic average: exact decimal sum divided by count, in double. */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 2))).cast("double") / count(lit(1)))

  /** SQL fragments mirroring the helpers above (DuckDB side). */
  object sqls {
    def dsum(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"
    def dsum4(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(22,4))) AS DOUBLE)"
    def davg(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1)"
  }
}
