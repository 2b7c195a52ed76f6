package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.operators.LookupJoin

/** Catalog surface for the lookup join (reference
  * CommonExecLookupJoin.java:138): big orders probe a customer
  * "service" per row. The external store is REAL since round 6: the
  * customer fixture is loaded into the embedded Derby that ships with
  * the Spark distribution (in-process — the zero-egress constraint
  * holds) and each task's `JdbcLookupClient` runs batched
  * `WHERE key IN (…)` point reads against it, exactly the reference's
  * JDBC lookup connector shape (JdbcRowDataLookupFunction). The
  * operator under test is the distributed mapPartitions
  * batching/cache/prefetch machinery, which adds NO shuffle to the
  * probe side. */
object LookupQueries {

  private val lookupSql =
    """SELECT o_orderkey, o_custkey, c_name, c_mktsegment
      |FROM orders JOIN customer ON c_custkey = o_custkey
      |WHERE o_totalprice > 400000.0
      |ORDER BY o_orderkey""".stripMargin

  // FILE-backed Derby (not memory:): the database is a directory every
  // process on the host can open, so the staging write and the executor
  // lookups meet regardless of deployment — no isLocal fork, no
  // driver-side collect fallback. Per-JVM unique path: embedded Derby
  // grants the boot lock to ONE JVM at a time, so concurrent runs
  // (sbt test next to Verify) must not share a database directory. A
  // real deployment swaps this url for its networked store's.
  private lazy val derbyDir = java.nio.file.Files
    .createTempDirectory("graft_lookup_db").toString
  private lazy val derbyUrl = s"jdbc:derby:$derbyDir/db;create=true"

  val queries: Seq[Query] = Seq(
    Query(
      "q_lookup_join",
      (s, d) => {
        // stage the dimension into the external store (a production
        // deployment's store already exists; this write is the test
        // fixture's "ingest"). Distributed: tasks insert partitions
        // over JDBC; nothing is collected to the driver.
        val props = new java.util.Properties()
        props.setProperty("driver",
          "org.apache.derby.jdbc.EmbeddedDriver")
        // 4 writer tasks, 10k-row batches: embedded Derby serializes
        // same-table inserts behind page latches, so 32 concurrent
        // writers mostly wait on each other (the sf1 scale run measured
        // the 32-writer staging at 4.5 min for 150k rows); a handful of
        // fat-batch writers is the throughput shape for any
        // single-node-store ingest
        Catalog.t(s, d, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .coalesce(4)
          .write.mode("overwrite")
          .option("createTableColumnTypes",
            "c_name VARCHAR(64), c_mktsegment VARCHAR(32)")
          .option("batchsize", "10000")
          .jdbc(derbyUrl, "CUSTOMER_DIM", props)
        val client: LookupJoin.LookupClient =
          new LookupJoin.JdbcLookupClient(derbyUrl,
            "CUSTOMER_DIM", "c_custkey", Seq("c_name", "c_mktsegment"))
        val probes = Catalog.t(s, d, "orders")
          .where(col("o_totalprice") > 400000.0)
          .select(col("o_orderkey"), col("o_custkey"))
        LookupJoin.lookupJoin(probes, "o_custkey", client,
            StructType(Seq(StructField("c_name", StringType),
              StructField("c_mktsegment", StringType))),
            joinType = "inner", batchSize = 256)
          .orderBy(col("o_orderkey"))
      },
      Some(lookupSql)))
}
