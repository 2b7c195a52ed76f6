package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.operators.LookupJoin

/** Catalog surface for the lookup join (reference
  * CommonExecLookupJoin.java:138): big orders probe a customer
  * "service" per row. The external store is simulated by a driver-held
  * map of the customer fixture (`MapLookupClient`) — the one deliberate
  * driver-side materialization in the catalog, standing in for the
  * JDBC/HBase endpoint a production deployment would hit; the operator
  * under test is the distributed mapPartitions batching/cache/prefetch
  * machinery, which adds NO shuffle to the probe side. */
object LookupQueries {

  private val lookupSql =
    """SELECT o_orderkey, o_custkey, c_name, c_mktsegment
      |FROM orders JOIN customer ON c_custkey = o_custkey
      |WHERE o_totalprice > 400000.0
      |ORDER BY o_orderkey""".stripMargin

  val queries: Seq[Query] = Seq(
    Query(
      "q_lookup_join",
      (s, d) => {
        // TEST HARNESS, not the operator: this collect builds the
        // stand-in external store (no JDBC/HBase endpoint exists
        // in-container). A production deployment points LookupClient at
        // the real service; the operator itself never collects —
        // lookups run distributed inside mapPartitions on the probe
        // side's existing partitioning.
        val dim = Catalog.t(s, d, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .collect()
          .map(r => r.getLong(0) -> Seq[Any](r.getString(1), r.getString(2)))
          .toMap
        val client = new LookupJoin.MapLookupClient(dim)
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
