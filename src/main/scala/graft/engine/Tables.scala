package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog of the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Mirrors the reference's table-source registration
  * (flink-table/.../exec/common/CommonExecTableSourceScan.java:51) via
  * Spark's built-in parquet DSv2 source — filter/projection/limit pushdown
  * (reference: flink-table-common/.../connector/source/abilities/) come for
  * free from `spark.read.parquet`.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts encoding varies across driver testdata generations:
      // TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — read
      // as raw long nanos under nanosAsLong and truncate to micros) or
      // TIMESTAMP(MICROS) NTZ. Normalize both to microsecond
      // TimestampType — with the session zone pinned to UTC the wall
      // clock is identical, matching the DuckDB oracle's
      // CAST(ts AS TIMESTAMP) (see FIXTURES.md protocol note).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize the events `ts` column to microsecond TimestampType from
    * whichever encoding the fixture generation used. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => // raw nanos via nanosAsLong
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => // micros NTZ: UTC session ⇒ same wall clock
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Register every fixture table as a temp view so `spark.sql` works
    * against the same names the DuckDB oracle sees. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
