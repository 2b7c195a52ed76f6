package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    Relational.queries ++ Relational2.queries ++ Relational3.queries ++
      TpcDsShapes.queries ++ TpcDsShapes2.queries ++
      TpcDsShapes3.queries ++ TpcDsShapes4.queries ++
      TpcDsShapes5.queries ++ TpcDsShapes6.queries ++
      TpcDsShapes7.queries ++ TpcDsShapes8.queries ++
      TpcDsShapes9.queries ++ TpcDsShapes10.queries ++
      TpcDsShapes11.queries ++ TpcDsShapes12.queries ++
      TpcDsShapes13.queries ++ TpcDsShapes14.queries ++
      Aggregates.queries ++
      Windows.queries ++ SetOps.queries ++
      Functions.queries ++ EventQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ MultimodalQueries.queries ++
      GraftFnQueries.queries ++ LookupQueries.queries ++
      IterateQueries.queries ++ PipelineQueries.queries ++
      RowOpsQueries.queries

  lazy val byName: Map[String, Query] = all.map(q => q.name -> q).toMap

  // ---- shared helpers -----------------------------------------------------

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Register the named fixtures as temp views for `spark.sql` queries. */
  def registerViews(spark: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))

  /** Round-half-away-from-zero to `scale` decimals as a scaled long — the
    * same value DECIMAL(p, d) casting produces for measures whose true
    * rational value has at most `d` decimals (TPC-H money columns: prices
    * and quantities are exact 2dp, price×(1−discount) is exact 4dp). All
    * arithmetic stays primitive inside whole-stage codegen; a per-row
    * double→DECIMAL cast goes through BigDecimal.valueOf(Double.toString)
    * and measures ~5× slower (see tools.BenchProbe).
    */
  private def scaledLong(c: Column, scale: Int): Column =
    (c * scale + when(c < 0, lit(-0.5)).otherwise(lit(0.5))).cast("long")

  /** Exact accumulation of a 2-decimal double measure: round each row to a
    * long count of hundredths, sum exactly, return double. Bit-identical
    * across engines regardless of aggregation order (double sums would
    * differ at ulp level between Spark's partial-agg order and DuckDB's),
    * and bit-identical to the DECIMAL(18,2) oracle formulation for 2dp
    * data. Long accumulation holds to ~9.2e16 in summed units; a
    * deployment whose group sums could exceed that should cast the scaled
    * long to DECIMAL(38,0) before the sum (cast-from-long is cheap — the
    * expensive path is only the double→decimal string cast).
    */
  def dsum(c: Column): Column = (sum(scaledLong(c, 100)) / 100.0)

  /** Exact sum of a per-row double expression rounded to 4 decimals at the
    * row level (matches the DECIMAL(22,4) oracle cast for ≤4dp rationals). */
  def dsum4(c: Column): Column = (sum(scaledLong(c, 10000)) / 10000.0)

  /** Deterministic average: exact scaled-long sum divided by count. */
  def davg(c: Column): Column =
    (sum(scaledLong(c, 100)) / 100.0 / count(lit(1)))

  /** SQL fragments mirroring the helpers above (DuckDB side). */
  object sqls {
    def dsum(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"
    def dsum4(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(22,4))) AS DOUBLE)"
    def davg(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1)"
  }
}
