package graft.queries

import org.apache.spark.sql.functions._

import Catalog.t

/** Set-operation coverage (SURVEY.md §2.7): UNION [ALL], INTERSECT [ALL],
  * EXCEPT [ALL]. The reference rewrites INTERSECT→semi-join and
  * EXCEPT→anti-join (ReplaceIntersectWithSemiJoinRule.scala,
  * ReplaceMinusWithAntiJoinRule.scala); Catalyst has the identical rewrites
  * built in (`ReplaceIntersectWithSemiJoin`, `ReplaceExceptWithAntiJoin`),
  * so these compile to broadcastable joins, not full shuffles of both sides.
  */
object SetOps {

  val queries: Seq[Query] = Seq(

    Query(
      "q_union_all",
      (s, d) => {
        val big = t(s, d, "orders").where(col("o_totalprice") > 450000.0)
          .select(col("o_orderkey").as("k"), lit("big").as("tag"))
        val urgent = t(s, d, "orders")
          .where(col("o_orderpriority") === "1-URGENT"
            && col("o_totalprice") > 440000.0)
          .select(col("o_orderkey").as("k"), lit("urgent").as("tag"))
        big.union(urgent).orderBy(col("k"), col("tag"))
      },
      Some("""SELECT o_orderkey AS k, 'big' AS tag FROM orders
             |WHERE o_totalprice > 450000.0
             |UNION ALL
             |SELECT o_orderkey AS k, 'urgent' AS tag FROM orders
             |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 440000.0
             |ORDER BY k, tag""".stripMargin)),

    Query(
      "q_union_distinct",
      (s, d) => {
        val a = t(s, d, "customer").where(col("c_custkey") % 7 === 0)
          .select(col("c_custkey").as("k"))
        val b = t(s, d, "customer").where(col("c_custkey") % 5 === 0)
          .select(col("c_custkey").as("k"))
        a.union(b).distinct().orderBy(col("k"))
      },
      Some("""SELECT c_custkey AS k FROM customer WHERE c_custkey % 7 = 0
             |UNION
             |SELECT c_custkey AS k FROM customer WHERE c_custkey % 5 = 0
             |ORDER BY k""".stripMargin)),

    Query(
      "q_intersect",
      (s, d) => {
        val a = t(s, d, "customer").where(col("c_custkey") % 3 === 0)
          .select(col("c_custkey").as("k"))
        val b = t(s, d, "customer").where(col("c_custkey") % 2 === 0)
          .select(col("c_custkey").as("k"))
        a.intersect(b).orderBy(col("k"))
      },
      Some("""SELECT c_custkey AS k FROM customer WHERE c_custkey % 3 = 0
             |INTERSECT
             |SELECT c_custkey AS k FROM customer WHERE c_custkey % 2 = 0
             |ORDER BY k""".stripMargin)),

    Query(
      "q_except",
      (s, d) => {
        val a = t(s, d, "customer").where(col("c_custkey") % 3 === 0)
          .select(col("c_custkey").as("k"))
        val b = t(s, d, "customer").where(col("c_custkey") % 2 === 0)
          .select(col("c_custkey").as("k"))
        a.except(b).orderBy(col("k"))
      },
      Some("""SELECT c_custkey AS k FROM customer WHERE c_custkey % 3 = 0
             |EXCEPT
             |SELECT c_custkey AS k FROM customer WHERE c_custkey % 2 = 0
             |ORDER BY k""".stripMargin)),

    // ALL variants (reference RewriteIntersectAllRule / RewriteMinusAllRule).
    Query(
      "q_intersect_all",
      (s, d) => {
        val a = t(s, d, "lineitem").where(col("l_orderkey") < 400)
          .select(col("l_suppkey").as("k"))
        val b = t(s, d, "lineitem").where(col("l_orderkey") >= 200)
          .where(col("l_orderkey") < 600)
          .select(col("l_suppkey").as("k"))
        a.intersectAll(b).orderBy(col("k"))
      },
      Some("""SELECT l_suppkey AS k FROM lineitem WHERE l_orderkey < 400
             |INTERSECT ALL
             |SELECT l_suppkey AS k FROM lineitem
             |WHERE l_orderkey >= 200 AND l_orderkey < 600
             |ORDER BY k""".stripMargin)),

    Query(
      "q_except_all",
      (s, d) => {
        val a = t(s, d, "lineitem").where(col("l_orderkey") < 400)
          .select(col("l_suppkey").as("k"))
        val b = t(s, d, "lineitem").where(col("l_orderkey") >= 200)
          .where(col("l_orderkey") < 600)
          .select(col("l_suppkey").as("k"))
        a.exceptAll(b).orderBy(col("k"))
      },
      Some("""SELECT l_suppkey AS k FROM lineitem WHERE l_orderkey < 400
             |EXCEPT ALL
             |SELECT l_suppkey AS k FROM lineitem
             |WHERE l_orderkey >= 200 AND l_orderkey < 600
             |ORDER BY k""".stripMargin)))
}
