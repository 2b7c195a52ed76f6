package graft.queries

import org.apache.spark.sql.functions._

import Catalog.t
import graft.sources.{RowOps, StatsManifest}

/** Row-level operations on a manifested table, oracle-checked end to
  * end: each row materializes a manifested copy of a fixture table in a
  * per-sfDir temp dir, mutates it through [[graft.sources.RowOps]]
  * (copy-on-write at file granularity, manifest-pruned candidate
  * discovery, tombstoned replacements), then reads the FINAL state (or
  * the CDC changefeed) back through the pruned scan — which must equal
  * DuckDB computing the same mutation as a pure query over the original
  * fixture. RowOpsSpec pins the mechanics (pruning counters, untouched
  * files not rewritten, snapshots surviving the ops, vacuum); these
  * rows pin the SEMANTICS against an independent engine. */
object RowOpsQueries {

  private def tmp(tag: String, d: String): String =
    new java.io.File(
      System.getProperty("java.io.tmpdir"),
      tag + java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)).getAbsolutePath

  val queries: Seq[Query] = Seq(
    Query(
      // DELETE: z-order lineitem on (orderkey, partkey), delete a
      // partkey range; candidate discovery runs through the manifest
      // (files whose partkey range misses are never scanned), only
      // files holding matches rewrite, and the final pruned scan must
      // equal DuckDB's WHERE NOT(...) over the original table.
      "q_rowops_delete",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity")
        val dir = tmp("graft_rowops_del_", d)
        graft.operators.Layout.zorderWrite(
          li, Seq("l_orderkey", "l_partkey"), dir, 16)
        // orderkeys start near 1 at every SF, so the predicate both
        // matches rows and leaves rows at sf0.001 through sf1+
        RowOps.delete(s, dir, col("l_orderkey") < 100,
          Seq("l_orderkey", "l_partkey"))
        StatsManifest.scan(s, dir)
          .orderBy(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      },
      Some("""SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
             |WHERE NOT (l_orderkey < 100) ORDER BY 1, 2, 3""".stripMargin)),

    Query(
      // MERGE/upsert: replace matched keys with source rows (price
      // bumped), insert unmatched keys (offset ids). The final state is
      // the CASE-expression + UNION ALL the oracle computes directly.
      "q_rowops_upsert",
      (s, d) => {
        val o = t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val dir = tmp("graft_rowops_ups_", d)
        o.repartition(8).write.mode("overwrite").parquet(dir)
        StatsManifest.write(s, dir, Seq("o_orderkey"))
        val upd = o.where(col("o_orderkey") % 97 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000)
        val src = upd.unionByName(
          upd.withColumn("o_orderkey", col("o_orderkey") + 100000000L))
        RowOps.upsert(s, dir, src, Seq("o_orderkey"), Seq("o_orderkey"))
        StatsManifest.scan(s, dir).orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1000
             |       ELSE o_totalprice END AS o_totalprice
             |FROM orders
             |UNION ALL
             |SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey,
             |  o_totalprice + 1000 AS o_totalprice
             |FROM orders WHERE o_orderkey % 97 = 0
             |ORDER BY o_orderkey""".stripMargin)),

    Query(
      // SQL DML end-to-end: DELETE FROM + UPDATE statements over a
      // graft-manifest catalog table (GraftDmlRule rewrites Spark's
      // parsed plans onto RowOps before the v1-relation check); the
      // final table state must equal DuckDB computing the same
      // mutations as a pure query.
      "q_rowops_sql",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity")
        val dir = tmp("graft_sqldml_q_", d)
        li.repartition(8).write.mode("overwrite").parquet(dir)
        StatsManifest.write(s, dir, Seq("l_orderkey"))
        val tbl = "graft_dml_" + java.security.MessageDigest
          .getInstance("MD5").digest(d.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(10)
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
          s"OPTIONS (path '$dir')")
        s.sql(s"DELETE FROM $tbl WHERE l_quantity > 45")
        s.sql(s"UPDATE $tbl SET l_quantity = -1 WHERE l_orderkey % 500 = 0")
        s.table(tbl)
          .orderBy(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      },
      Some("""SELECT l_orderkey, l_partkey,
             |  CASE WHEN l_orderkey % 500 = 0 THEN CAST(-1 AS DOUBLE)
             |       ELSE l_quantity END AS l_quantity
             |FROM lineitem WHERE NOT (l_quantity > 45)
             |ORDER BY 1, 2, 3""".stripMargin)),

    Query(
      // FULL MERGE clause matrix as one SQL statement: conditional
      // matched DELETE + conditional matched partial UPDATE (unassigned
      // columns keep their target values), conditional INSERT with a
      // partial column list (unassigned → NULL), and NOT MATCHED BY
      // SOURCE UPDATE — first-true-wins per clause group (ANSI). The
      // oracle replays every clause as CASE + anti-join SQL over the
      // original fixture.
      "q_rowops_merge_full",
      (s, d) => {
        val o = t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val dir = tmp("graft_rowops_mf_", d)
        o.repartition(8).write.mode("overwrite").parquet(dir)
        StatsManifest.write(s, dir, Seq("o_orderkey"))
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(d.getBytes("UTF-8")).map("%02x".format(_))
          .mkString.take(10)
        val tbl = "graft_mf_" + h
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
          s"OPTIONS (path '$dir')")
        val matchedSrc = o.where(col("o_orderkey") % 97 === 0)
        matchedSrc.unionByName(matchedSrc
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L))
          .createOrReplaceTempView(s"graft_mfsrc_$h")
        s.sql(s"""MERGE INTO $tbl t USING graft_mfsrc_$h s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED AND s.o_totalprice > 150000 THEN DELETE
          |WHEN MATCHED AND t.o_custkey % 2 = 0
          |  THEN UPDATE SET o_totalprice = t.o_totalprice + s.o_totalprice
          |WHEN NOT MATCHED AND s.o_custkey % 3 = 0
          |  THEN INSERT (o_orderkey, o_totalprice)
          |       VALUES (s.o_orderkey, -1)
          |WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 113 = 0
          |  THEN UPDATE SET o_totalprice = 0
          |""".stripMargin)
        s.table(tbl).orderBy(col("o_orderkey"))
      },
      Some("""WITH tgt AS (
             |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
             |src AS (
             |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |  WHERE o_orderkey % 97 = 0
             |  UNION ALL
             |  SELECT o_orderkey + 100000000, o_custkey, o_totalprice
             |  FROM orders WHERE o_orderkey % 97 = 0),
             |merged AS (
             |  SELECT t.o_orderkey, t.o_custkey,
             |    CASE WHEN s.o_orderkey IS NOT NULL THEN
             |           CASE WHEN t.o_custkey % 2 = 0
             |                THEN t.o_totalprice + s.o_totalprice
             |                ELSE t.o_totalprice END
             |         WHEN t.o_orderkey % 113 = 0 THEN 0
             |         ELSE t.o_totalprice END AS o_totalprice,
             |    CASE WHEN s.o_orderkey IS NOT NULL
             |              AND s.o_totalprice > 150000
             |         THEN 1 ELSE 0 END AS del
             |  FROM tgt t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey)
             |SELECT o_orderkey, o_custkey, o_totalprice FROM merged
             |WHERE del = 0
             |UNION ALL
             |SELECT s.o_orderkey, CAST(NULL AS BIGINT) AS o_custkey,
             |  CAST(-1 AS DOUBLE) AS o_totalprice
             |FROM src s LEFT JOIN tgt t ON s.o_orderkey = t.o_orderkey
             |WHERE t.o_orderkey IS NULL AND s.o_custkey % 3 = 0
             |ORDER BY o_orderkey""".stripMargin)),

    Query(
      // Schema evolution: ADD COLUMN is one manifest commit (no file
      // rewritten — RowOpsSpec/SchemaEvolutionSpec pin that); old rows
      // serve NULL, appended rows carry values, and the final evolved
      // table must equal DuckDB computing the same shape directly.
      "q_schema_evolve",
      (s, d) => {
        val o = t(s, d, "orders").select("o_orderkey", "o_totalprice")
        val dir = tmp("graft_schev_q_", d)
        o.repartition(8).write.mode("overwrite").parquet(dir)
        StatsManifest.write(s, dir, Seq("o_orderkey"))
        RowOps.addColumn(s, dir, "o_flag",
          org.apache.spark.sql.types.LongType)
        o.where(col("o_orderkey") % 50 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
          .withColumn("o_flag", lit(1L))
          .write.mode("append").parquet(dir)
        StatsManifest.update(s, dir, Seq("o_orderkey"))
        StatsManifest.scan(s, dir).orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_totalprice,
             |  CAST(NULL AS BIGINT) AS o_flag FROM orders
             |UNION ALL
             |SELECT o_orderkey + 100000000 AS o_orderkey, o_totalprice,
             |  CAST(1 AS BIGINT) AS o_flag
             |FROM orders WHERE o_orderkey % 50 = 0
             |ORDER BY o_orderkey""".stripMargin)),

    Query(
      // DML subqueries (r10): DELETE ... WHERE key IN (SELECT ...) and
      // an UPDATE gated by a scalar subquery — evaluated once at
      // command time (uncorrelated); the oracle replays both as pure
      // SQL over the fixture.
      "q_rowops_subquery",
      (s, d) => {
        val o = t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val dir = tmp("graft_subq_q_", d)
        o.repartition(8).write.mode("overwrite").parquet(dir)
        StatsManifest.write(s, dir, Seq("o_orderkey"))
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(d.getBytes("UTF-8")).map("%02x".format(_))
          .mkString.take(10)
        val tbl = "graft_sq_" + h
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
          s"OPTIONS (path '$dir')")
        // the GDPR-erasure shape: keys from another relation
        t(s, d, "customer").select("c_custkey")
          .where(col("c_custkey") % 50 === 0)
          .createOrReplaceTempView(s"graft_erase_$h")
        s.sql(s"""DELETE FROM $tbl WHERE o_custkey IN
                 |(SELECT c_custkey FROM graft_erase_$h)""".stripMargin)
        // MAX is accumulation-order-free: the scalar threshold is
        // bit-identical in both engines (AVG would differ at ulp)
        s.sql(s"""UPDATE $tbl SET o_totalprice = -1
                 |WHERE o_totalprice >
                 |  (SELECT 0.9 * MAX(o_totalprice) FROM $tbl)""".stripMargin)
        s.table(tbl).orderBy(col("o_orderkey"))
      },
      Some("""WITH kept AS (
             |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |  WHERE o_custkey NOT IN (
             |    SELECT c_custkey FROM customer WHERE c_custkey % 50 = 0)),
             |thr AS (SELECT 0.9 * MAX(o_totalprice) AS t FROM kept)
             |SELECT o_orderkey, o_custkey,
             |  CASE WHEN o_totalprice > (SELECT t FROM thr)
             |       THEN CAST(-1 AS DOUBLE) ELSE o_totalprice END
             |    AS o_totalprice
             |FROM kept ORDER BY o_orderkey""".stripMargin)),

    Query(
      // CORRELATED DML subqueries (r11): DELETE ... WHERE EXISTS
      // (correlated on the target row) and an UPDATE gated by a
      // correlated NOT EXISTS — lowered onto the distributed join
      // machinery (GraftCorrelatedDmlCommand: the distinct satisfying
      // ref-combos become a merge/deleteKeys source, decorrelated by
      // Catalyst itself, never materialized on the driver). The oracle
      // replays both statements as correlated SQL over the fixture.
      "q_rowops_correlated",
      (s, d) => {
        val o = t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val dir = tmp("graft_corr_q_", d)
        o.repartition(8).write.mode("overwrite").parquet(dir)
        StatsManifest.write(s, dir, Seq("o_orderkey"))
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(d.getBytes("UTF-8")).map("%02x".format(_))
          .mkString.take(10)
        val tbl = "graft_corr_" + h
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
          s"OPTIONS (path '$dir')")
        t(s, d, "customer").select("c_custkey", "c_acctbal")
          .createOrReplaceTempView(s"graft_corrc_$h")
        // erase orders of negative-balance customers — correlated EXISTS
        s.sql(s"""DELETE FROM $tbl WHERE EXISTS (
                 |  SELECT 1 FROM graft_corrc_$h c
                 |  WHERE c.c_custkey = $tbl.o_custkey
                 |    AND c.c_acctbal < 0)""".stripMargin)
        // flag round orders of non-wealthy customers — correlated NOT
        // EXISTS mixed with a plain conjunct
        s.sql(s"""UPDATE $tbl SET o_totalprice = -1
                 |WHERE o_orderkey % 100 = 0 AND NOT EXISTS (
                 |  SELECT 1 FROM graft_corrc_$h c
                 |  WHERE c.c_custkey = $tbl.o_custkey
                 |    AND c.c_acctbal > 5000)""".stripMargin)
        s.table(tbl).orderBy(col("o_orderkey"))
      },
      Some("""WITH kept AS (
             |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
             |  WHERE NOT EXISTS (
             |    SELECT 1 FROM customer c
             |    WHERE c.c_custkey = o.o_custkey AND c.c_acctbal < 0))
             |SELECT o_orderkey, o_custkey,
             |  CASE WHEN o_orderkey % 100 = 0 AND NOT EXISTS (
             |      SELECT 1 FROM customer c
             |      WHERE c.c_custkey = kept.o_custkey
             |        AND c.c_acctbal > 5000)
             |    THEN CAST(-1 AS DOUBLE) ELSE o_totalprice END
             |    AS o_totalprice
             |FROM kept ORDER BY o_orderkey""".stripMargin)),

    Query(
      // CORRELATED MERGE clause subqueries (r12): a correlated EXISTS
      // in a DELETE clause condition AND a correlated scalar in a SET
      // value, plus a source-correlated insert condition — each lowers
      // to a per-distinct-refs lookup joined onto the merge frames
      // (GraftDml.MergeAuxSpec; Catalyst decorrelates the lookup).
      // The oracle replays the whole clause matrix as correlated SQL.
      "q_rowops_merge_corr",
      (s, d) => {
        val o = t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val dir = tmp("graft_mcorr_q_", d)
        o.repartition(8).write.mode("overwrite").parquet(dir)
        StatsManifest.write(s, dir, Seq("o_orderkey"))
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(d.getBytes("UTF-8")).map("%02x".format(_))
          .mkString.take(10)
        val tbl = "graft_mcorr_" + h
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
          s"OPTIONS (path '$dir')")
        t(s, d, "customer").select(col("c_custkey").as("o_custkey"),
          col("c_acctbal")).createOrReplaceTempView(s"graft_mcs_$h")
        t(s, d, "lineitem").select("l_orderkey", "l_partkey",
          "l_quantity").createOrReplaceTempView(s"graft_mcl_$h")
        s.sql(s"""MERGE INTO $tbl t USING graft_mcs_$h s
          |ON t.o_custkey = s.o_custkey
          |WHEN MATCHED AND EXISTS (
          |    SELECT 1 FROM graft_mcl_$h l
          |    WHERE l.l_orderkey = t.o_orderkey AND l.l_quantity > 49)
          |  THEN DELETE
          |WHEN MATCHED AND s.c_acctbal < 0
          |  THEN UPDATE SET o_totalprice = (
          |    SELECT MAX(l.l_quantity) FROM graft_mcl_$h l
          |    WHERE l.l_orderkey = t.o_orderkey)
          |WHEN NOT MATCHED AND EXISTS (
          |    SELECT 1 FROM graft_mcl_$h l
          |    WHERE l.l_partkey = s.o_custkey)
          |  THEN INSERT (o_orderkey, o_custkey, o_totalprice)
          |       VALUES (s.o_custkey + 500000000, s.o_custkey, 0)
          |""".stripMargin)
        s.table(tbl).orderBy(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"))
      },
      Some("""WITH tgt AS (
             |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
             |src AS (
             |  SELECT c_custkey AS o_custkey, c_acctbal FROM customer),
             |m AS (
             |  SELECT t.o_orderkey, t.o_custkey, t.o_totalprice,
             |    s.o_custkey IS NOT NULL AS matched, s.c_acctbal
             |  FROM tgt t LEFT JOIN src s ON t.o_custkey = s.o_custkey)
             |SELECT o_orderkey, o_custkey,
             |  CASE WHEN matched AND c_acctbal < 0
             |       THEN (SELECT MAX(l.l_quantity) FROM lineitem l
             |             WHERE l.l_orderkey = m.o_orderkey)
             |       ELSE o_totalprice END AS o_totalprice
             |FROM m
             |WHERE NOT (matched AND EXISTS (
             |  SELECT 1 FROM lineitem l
             |  WHERE l.l_orderkey = m.o_orderkey AND l.l_quantity > 49))
             |UNION ALL
             |SELECT s.o_custkey + 500000000, s.o_custkey,
             |  CAST(0 AS DOUBLE)
             |FROM src s
             |WHERE s.o_custkey NOT IN (SELECT o_custkey FROM tgt)
             |  AND EXISTS (SELECT 1 FROM lineitem l
             |              WHERE l.l_partkey = s.o_custkey)
             |ORDER BY 1, 2, 3""".stripMargin)),

    Query(
      // Correlated EXISTS in a SET/INSERT VALUE position (r13): the
      // last MERGE refusal deleted — EXISTS is two-valued, so the
      // condition hit-flag lowering coalesced to false is exact. The
      // oracle recomputes both values as plain correlated SQL.
      "q_rowops_merge_exists_val",
      (s, d) => {
        val o = t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val dir = tmp("graft_mev_q_", d)
        o.repartition(8).write.mode("overwrite").parquet(dir)
        StatsManifest.write(s, dir, Seq("o_orderkey"))
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(d.getBytes("UTF-8")).map("%02x".format(_))
          .mkString.take(10)
        val tbl = "graft_mev_" + h
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
          s"OPTIONS (path '$dir')")
        t(s, d, "customer").select(col("c_custkey").as("o_custkey"))
          .createOrReplaceTempView(s"graft_mevs_$h")
        t(s, d, "lineitem").select("l_orderkey", "l_partkey",
          "l_quantity").createOrReplaceTempView(s"graft_mevl_$h")
        s.sql(s"""MERGE INTO $tbl t USING graft_mevs_$h s
          |ON t.o_custkey = s.o_custkey
          |WHEN MATCHED THEN UPDATE SET o_totalprice =
          |  CASE WHEN EXISTS (
          |      SELECT 1 FROM graft_mevl_$h l
          |      WHERE l.l_orderkey = t.o_orderkey
          |        AND l.l_quantity > 45)
          |    THEN CAST(-1 AS DOUBLE) ELSE t.o_totalprice END
          |WHEN NOT MATCHED THEN
          |  INSERT (o_orderkey, o_custkey, o_totalprice)
          |  VALUES (s.o_custkey + 600000000, s.o_custkey,
          |    CASE WHEN EXISTS (
          |        SELECT 1 FROM graft_mevl_$h l
          |        WHERE l.l_partkey = s.o_custkey)
          |      THEN CAST(1 AS DOUBLE) ELSE CAST(2 AS DOUBLE) END)
          |""".stripMargin)
        s.table(tbl).orderBy(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"))
      },
      Some("""WITH tgt AS (
             |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
             |src AS (SELECT c_custkey AS o_custkey FROM customer)
             |SELECT t.o_orderkey, t.o_custkey,
             |  CASE WHEN t.o_custkey IN (SELECT o_custkey FROM src)
             |       THEN CASE WHEN EXISTS (
             |              SELECT 1 FROM lineitem l
             |              WHERE l.l_orderkey = t.o_orderkey
             |                AND l.l_quantity > 45)
             |            THEN CAST(-1 AS DOUBLE) ELSE t.o_totalprice END
             |       ELSE t.o_totalprice END AS o_totalprice
             |FROM tgt t
             |UNION ALL
             |SELECT s.o_custkey + 600000000, s.o_custkey,
             |  CASE WHEN EXISTS (SELECT 1 FROM lineitem l
             |                    WHERE l.l_partkey = s.o_custkey)
             |       THEN CAST(1 AS DOUBLE) ELSE CAST(2 AS DOUBLE) END
             |FROM src s
             |WHERE s.o_custkey NOT IN (SELECT o_custkey FROM tgt)
             |ORDER BY 1, 2, 3""".stripMargin)),

    Query(
      // CHECK constraints (r13): ALTER TABLE ... ADD CONSTRAINT CHECK
      // installs a write-path contract enforced INLINE in every write
      // job. The row proves both halves: a violating INSERT fails and
      // leaves no trace; a conforming one lands — the final state is
      // the fixture plus exactly the conforming row.
      "q_rowops_constraint",
      (s, d) => {
        val o = t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val dir = tmp("graft_chk_q_", d)
        o.repartition(8).write.mode("overwrite").parquet(dir)
        StatsManifest.write(s, dir, Seq("o_orderkey"))
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(d.getBytes("UTF-8")).map("%02x".format(_))
          .mkString.take(10)
        val tbl = "graft_chk_" + h
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
          s"OPTIONS (path '$dir')")
        s.sql(s"ALTER TABLE $tbl ADD CONSTRAINT price_pos " +
          "CHECK (o_totalprice >= 0)")
        var fired = false
        try s.sql(s"INSERT INTO $tbl VALUES (900000001, 1, -5.0)")
        catch { case _: Exception => fired = true }
        require(fired, "q_rowops_constraint: CHECK did not fire")
        s.sql(s"INSERT INTO $tbl VALUES (900000002, 2, 7.5)")
        s.table(tbl).orderBy(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |UNION ALL
             |SELECT 900000002, 2, CAST(7.5 AS DOUBLE)
             |ORDER BY 1, 2, 3""".stripMargin)),

    Query(
      // Static-partition INSERT OVERWRITE (r12): replace exactly one
      // Hive partition under ONE manifest commit (delete-matching +
      // append — RowOps.overwriteWhere); the oracle replays it as a
      // WHERE-swap over the fixture.
      "q_rowops_overwrite_part",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity")
          .withColumn("p", (col("l_orderkey") % 4).cast("int"))
        val dir = tmp("graft_iop_q_", d)
        li.repartition(4, col("p")).write.mode("overwrite")
          .partitionBy("p").parquet(dir)
        StatsManifest.write(s, dir, Seq("l_orderkey"))
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(d.getBytes("UTF-8")).map("%02x".format(_))
          .mkString.take(10)
        val tbl = "graft_iop_" + h
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
          s"OPTIONS (path '$dir')")
        li.createOrReplaceTempView(s"graft_iop_src_$h")
        s.sql(s"""INSERT OVERWRITE $tbl PARTITION (p = 1)
          |SELECT l_orderkey + 100000000, l_partkey, l_quantity + 0.5
          |FROM graft_iop_src_$h WHERE p = 1 AND l_quantity <= 10
          |""".stripMargin)
        s.table(tbl).orderBy(col("l_orderkey"), col("l_partkey"),
          col("l_quantity"), col("p"))
      },
      Some("""WITH base AS (
             |  SELECT l_orderkey, l_partkey, l_quantity,
             |    CAST(l_orderkey % 4 AS INT) AS p FROM lineitem)
             |SELECT * FROM base WHERE p <> 1
             |UNION ALL
             |SELECT l_orderkey + 100000000, l_partkey, l_quantity + 0.5,
             |  CAST(1 AS INT) AS p
             |FROM base WHERE p = 1 AND l_quantity <= 10
             |ORDER BY 1, 2, 3, 4""".stripMargin)),

    Query(
      // DYNAMIC-partition INSERT OVERWRITE (r13): PARTITION (p) with no
      // value — replace exactly the partitions PRESENT in the query's
      // output (p ∈ {1, 3} here), leave p ∈ {0, 2} untouched, one
      // 'replace' commit. The backfill workhorse: the oracle recomputes
      // the same per-partition replacement as a pure query.
      "q_rowops_overwrite_dyn",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity")
          .withColumn("p", (col("l_orderkey") % 4).cast("int"))
        val dir = tmp("graft_iod_q_", d)
        li.repartition(4, col("p")).write.mode("overwrite")
          .partitionBy("p").parquet(dir)
        StatsManifest.write(s, dir, Seq("l_orderkey"))
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(d.getBytes("UTF-8")).map("%02x".format(_))
          .mkString.take(10)
        val tbl = "graft_iod_" + h
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
          s"OPTIONS (path '$dir')")
        li.createOrReplaceTempView(s"graft_iod_src_$h")
        s.sql(s"""INSERT OVERWRITE $tbl PARTITION (p)
          |SELECT l_orderkey + 200000000, l_partkey, l_quantity + 0.25, p
          |FROM graft_iod_src_$h WHERE p IN (1, 3) AND l_quantity <= 5
          |""".stripMargin)
        s.table(tbl).orderBy(col("l_orderkey"), col("l_partkey"),
          col("l_quantity"), col("p"))
      },
      Some("""WITH base AS (
             |  SELECT l_orderkey, l_partkey, l_quantity,
             |    CAST(l_orderkey % 4 AS INT) AS p FROM lineitem)
             |SELECT * FROM base WHERE p NOT IN (1, 3)
             |UNION ALL
             |SELECT l_orderkey + 200000000, l_partkey,
             |  l_quantity + 0.25, p
             |FROM base WHERE p IN (1, 3) AND l_quantity <= 5
             |ORDER BY 1, 2, 3, 4""".stripMargin)),

    Query(
      // SQL INSERT (r10): INSERT INTO ... SELECT and a named-column
      // VALUES insert over a manifested catalog table — the rule
      // claims the parsed InsertIntoStatement so the files land WITH
      // a manifest commit (without it the rows would be silently
      // invisible to manifest-routed readers). Oracle = the fixture
      // plus both inserted row sets.
      "q_rowops_insert",
      (s, d) => {
        val o = t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val dir = tmp("graft_inssql_q_", d)
        o.repartition(8).write.mode("overwrite").parquet(dir)
        StatsManifest.write(s, dir, Seq("o_orderkey"))
        val tbl = "graft_ins_" + java.security.MessageDigest
          .getInstance("MD5").digest(d.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(10)
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
          s"OPTIONS (path '$dir')")
        s.sql(s"""INSERT INTO $tbl
          |SELECT o_orderkey + 100000000, o_custkey, o_totalprice + 1
          |FROM $tbl WHERE o_orderkey % 200 = 0""".stripMargin)
        s.sql(s"INSERT INTO $tbl (o_orderkey) VALUES (999999999)")
        s.table(tbl).orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |UNION ALL
             |SELECT o_orderkey + 100000000, o_custkey, o_totalprice + 1
             |FROM orders WHERE o_orderkey % 200 = 0
             |UNION ALL
             |SELECT CAST(999999999 AS BIGINT), CAST(NULL AS BIGINT),
             |  CAST(NULL AS DOUBLE)
             |ORDER BY o_orderkey""".stripMargin)),

    Query(
      // SQL time travel (r10): the same snapshot semantics as
      // q_time_travel, but reached through `VERSION AS OF` — the
      // hint-batch rule resolves the parsed RelationTimeTravel onto the
      // versioned manifest scan. v1 = the table, v2 = a SQL DELETE; the
      // v1 read must equal the untouched fixture.
      "q_time_travel_sql",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity")
        val dir = tmp("graft_ttsql_q_", d)
        li.repartition(8).write.mode("overwrite").parquet(dir)
        StatsManifest.write(s, dir, Seq("l_orderkey"))
        val tbl = "graft_tt_" + java.security.MessageDigest
          .getInstance("MD5").digest(d.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(10)
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
          s"OPTIONS (path '$dir')")
        s.sql(s"DELETE FROM $tbl WHERE l_quantity > 10")
        s.sql(s"""SELECT l_orderkey, l_partkey, l_quantity
                 |FROM $tbl VERSION AS OF 1
                 |ORDER BY 1, 2, 3""".stripMargin)
      },
      Some("""SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
             |ORDER BY 1, 2, 3""".stripMargin)),

    Query(
      // CDC through SQL (r10): the same changefeed as q_rowops_cdc read
      // back via the graft_changes TVF — the reference's changelog is
      // SQL-native end to end; the stored table's changefeed is too.
      "q_rowops_cdc_sql",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity")
        val dir = tmp("graft_cdcsql_q_", d)
        li.repartition(8).write.mode("overwrite").parquet(dir)
        StatsManifest.write(s, dir, Seq("l_orderkey"))
        val tbl = "graft_cdc_" + java.security.MessageDigest
          .getInstance("MD5").digest(d.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(10)
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
          s"OPTIONS (path '$dir')")
        s.sql(s"DELETE FROM $tbl WHERE l_quantity > 48")
        s.sql(s"UPDATE $tbl SET l_quantity = -1 WHERE l_partkey % 1000 = 0")
        s.sql(s"""SELECT * FROM graft_changes('$tbl', 1, 3)
                 |ORDER BY _commit_version, _change_type,
                 |  l_orderkey, l_partkey, l_quantity""".stripMargin)
      },
      Some("""WITH base AS (
             |  SELECT l_orderkey, l_partkey, l_quantity FROM lineitem),
             |d2 AS (
             |  SELECT l_orderkey, l_partkey, l_quantity,
             |    'delete' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
             |  FROM base WHERE l_quantity > 48),
             |rem AS (SELECT * FROM base WHERE NOT (l_quantity > 48)),
             |upd AS (SELECT * FROM rem WHERE l_partkey % 1000 = 0)
             |SELECT * FROM d2
             |UNION ALL
             |SELECT l_orderkey, l_partkey, l_quantity,
             |  'delete', CAST(3 AS BIGINT) FROM upd
             |UNION ALL
             |SELECT l_orderkey, l_partkey, CAST(-1 AS DOUBLE),
             |  'insert', CAST(3 AS BIGINT) FROM upd
             |ORDER BY _commit_version, _change_type,
             |  l_orderkey, l_partkey, l_quantity""".stripMargin)),

    Query(
      // CDC: v1 = the table, v2 = a DELETE, v3 = an UPDATE; the
      // row-level changefeed over (v1, v3] must surface EXACTLY the
      // deleted rows (@2) and the updated rows as delete+insert pairs
      // (@3) — every row a copy-on-write rewrite merely carried over
      // nets out. The oracle replays the mutations as pure SQL.
      "q_rowops_cdc",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity")
        val dir = tmp("graft_rowops_cdc_", d)
        li.repartition(8).write.mode("overwrite").parquet(dir)
        StatsManifest.write(s, dir, Seq("l_orderkey"))
        RowOps.delete(s, dir, col("l_quantity") > 48, Seq("l_orderkey"))
        RowOps.update(s, dir, col("l_partkey") % 1000 === 0,
          Seq("l_quantity" -> lit(-1)), Seq("l_orderkey"))
        RowOps.changes(s, dir, 1L, 3L)
          .orderBy(col("_commit_version"), col("_change_type"),
            col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      },
      Some("""WITH base AS (
             |  SELECT l_orderkey, l_partkey, l_quantity FROM lineitem),
             |d2 AS (
             |  SELECT l_orderkey, l_partkey, l_quantity,
             |    'delete' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
             |  FROM base WHERE l_quantity > 48),
             |rem AS (SELECT * FROM base WHERE NOT (l_quantity > 48)),
             |upd AS (SELECT * FROM rem WHERE l_partkey % 1000 = 0)
             |SELECT * FROM d2
             |UNION ALL
             |SELECT l_orderkey, l_partkey, l_quantity,
             |  'delete', CAST(3 AS BIGINT) FROM upd
             |UNION ALL
             |SELECT l_orderkey, l_partkey, CAST(-1 AS DOUBLE),
             |  'insert', CAST(3 AS BIGINT) FROM upd
             |ORDER BY _commit_version, _change_type,
             |  l_orderkey, l_partkey, l_quantity""".stripMargin)),

    Query(
      // RENAME COLUMN + type widening (r12): both metadata-only — the
      // rename maps logical→physical names at the parquet boundary
      // (column mapping; zero data rewrites), the widening relies on
      // the reader's native int→long upcast. DML then runs ON the
      // renamed column, and the final state must equal DuckDB
      // replaying the same mutations over aliased fixture columns.
      "q_catalog_rename",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity")
          .withColumn("l_partkey", col("l_partkey").cast("int"))
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(d.getBytes("UTF-8")).map("%02x".format(_))
          .mkString.take(10)
        val tbl = s"graft.default.ren_q_$h"
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        li.createOrReplaceTempView(s"ren_src_$h")
        s.sql(s"""CREATE TABLE $tbl
                 |TBLPROPERTIES ('statsCols' = 'l_orderkey,l_quantity')
                 |AS SELECT * FROM ren_src_$h""".stripMargin)
        s.sql(s"ALTER TABLE $tbl RENAME COLUMN l_quantity TO qty")
        s.sql(s"ALTER TABLE $tbl ALTER COLUMN l_partkey TYPE BIGINT")
        s.sql(s"DELETE FROM $tbl WHERE qty > 47")
        s.sql(s"UPDATE $tbl SET qty = -1 WHERE l_orderkey % 500 = 0")
        s.sql(s"""INSERT INTO $tbl
                 |SELECT l_orderkey + 100000000, l_partkey, 99.0
                 |FROM ren_src_$h WHERE l_orderkey % 1000 = 0""".stripMargin)
        s.table(tbl).orderBy(col("l_orderkey"), col("l_partkey"),
          col("qty"))
      },
      Some("""WITH base AS (
             |  SELECT l_orderkey, CAST(l_partkey AS BIGINT) AS l_partkey,
             |    l_quantity AS qty FROM lineitem),
             |kept AS (SELECT * FROM base WHERE NOT (qty > 47))
             |SELECT l_orderkey, l_partkey,
             |  CASE WHEN l_orderkey % 500 = 0 THEN CAST(-1 AS DOUBLE)
             |       ELSE qty END AS qty
             |FROM kept
             |UNION ALL
             |SELECT l_orderkey + 100000000, l_partkey,
             |  CAST(99.0 AS DOUBLE) AS qty
             |FROM base WHERE l_orderkey % 1000 = 0
             |ORDER BY 1, 2, 3""".stripMargin)),

    Query(
      // Catalog-native CRUD (r11): the whole life-cycle through the
      // graft TableCatalog — partitioned CTAS, manifest-committing
      // INSERT, DELETE and UPDATE — against a `graft.db.t` NAME with
      // zero OPTIONS plumbing (names are first-class; the resolution
      // rule swaps the v2 relation onto the pruned V1 scan, so the
      // read path is the same manifest-pruned machinery every other
      // front door uses). Oracle = DuckDB replaying CTAS + insert +
      // delete + update as a pure query over the fixture.
      "q_catalog_crud",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity")
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(d.getBytes("UTF-8")).map("%02x".format(_))
          .mkString.take(10)
        val tbl = s"graft.default.cat_q_$h"
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        li.createOrReplaceTempView(s"cat_src_$h")
        s.sql(s"""CREATE TABLE $tbl PARTITIONED BY (p)
                 |TBLPROPERTIES ('statsCols' = 'l_orderkey')
                 |AS SELECT l_orderkey, l_partkey, l_quantity,
                 |  CAST(l_orderkey % 4 AS INT) AS p
                 |FROM cat_src_$h""".stripMargin)
        s.sql(s"""INSERT INTO $tbl
                 |SELECT l_orderkey + 100000000, l_partkey,
                 |  l_quantity + 1, CAST(0 AS INT)
                 |FROM cat_src_$h WHERE l_orderkey % 300 = 0""".stripMargin)
        s.sql(s"DELETE FROM $tbl WHERE l_quantity > 47")
        s.sql(s"UPDATE $tbl SET l_quantity = -5 WHERE l_partkey % 700 = 0")
        s.table(tbl).orderBy(col("l_orderkey"), col("l_partkey"),
          col("l_quantity"), col("p"))
      },
      Some("""WITH base AS (
             |  SELECT l_orderkey, l_partkey, l_quantity,
             |    CAST(l_orderkey % 4 AS INT) AS p FROM lineitem
             |  UNION ALL
             |  SELECT l_orderkey + 100000000, l_partkey, l_quantity + 1,
             |    CAST(0 AS INT) FROM lineitem WHERE l_orderkey % 300 = 0),
             |kept AS (SELECT * FROM base WHERE NOT (l_quantity > 47))
             |SELECT l_orderkey, l_partkey,
             |  CASE WHEN l_partkey % 700 = 0 THEN CAST(-5 AS DOUBLE)
             |       ELSE l_quantity END AS l_quantity, p
             |FROM kept
             |ORDER BY 1, 2, 3, 4""".stripMargin)))
}
