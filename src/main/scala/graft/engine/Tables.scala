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
      // events.ts is TIMESTAMP(NANOS) in parquet, which Spark's vectorized
      // reader rejects outright; read it as raw long nanos and truncate to
      // microsecond TimestampType — the same truncation the DuckDB oracle
      // applies via CAST(ts AS TIMESTAMP) (see FIXTURES.md protocol note).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view so `spark.sql` works
    * against the same names the DuckDB oracle sees. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
