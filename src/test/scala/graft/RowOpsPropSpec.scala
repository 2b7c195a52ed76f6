package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{RowOps, StatsManifest}

/** Randomized soundness fuzz for row-level ops: a deterministic random
  * sequence of DELETE / UPDATE / MERGE / erasure ops runs against both
  * the manifested table and a driver-side multiset model. After every
  * op the pruned scan must equal the model; every recorded snapshot
  * must replay its historical model; and the CDC feed between any two
  * recorded versions must satisfy the exact changefeed invariant
  * `model_i ⊎ inserts == model_j ⊎ deletes` (signed-multiset equality —
  * order-insensitive, catches both lost rows and phantom changes). */
class RowOpsPropSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private type RowT = (Long, Long)

  private def sortedSeq(v: Iterable[RowT]): Seq[RowT] = v.toSeq.sorted

  private def scanRows(dir: String): Seq[RowT] =
    sortedSeq(StatsManifest.scan(spark, dir)
      .select("k", "m").as[RowT].collect().toSeq)

  test("random op sequences: state, snapshots, and CDC all agree with " +
      "the model") {
    for (seed <- Seq(11, 23, 47)) runOne(seed)
  }

  private def runOne(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_rowprop_$seed").toString + "/t"
    var model: Vector[RowT] =
      (0 until 300).map(i => (i.toLong, (i % 5).toLong)).toVector
    model.toDF("k", "m").repartitionByRange(4, col("k")).write.parquet(dir)
    StatsManifest.write(spark, dir, Seq("k"))
    // half the predicate ops run as SQL DML statements against a
    // catalog table over the same dir — the fuzz then also covers the
    // parser-hook → resolution-rule → command path
    val tbl = s"rowprop_$seed"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING `graft-manifest` " +
      s"OPTIONS (path '$dir')")
    // version → model snapshot (v1 = the initial table)
    var snaps = Vector(1L -> model)

    for (step <- 0 until 8) {
      rnd.nextInt(5) match {
        case 0 => // range delete (Scala API or SQL, same semantics)
          val a = rnd.nextInt(400).toLong
          val b = a + rnd.nextInt(60) + 1
          if (rnd.nextBoolean())
            RowOps.delete(spark, dir,
              col("k") >= a && col("k") < b, Seq("k"))
          else spark.sql(s"DELETE FROM $tbl WHERE k >= $a AND k < $b")
          model = model.filterNot { case (k, _) => k >= a && k < b }
        case 1 => // modulo update
          val p = rnd.nextInt(7) + 2
          val r = rnd.nextInt(p)
          if (rnd.nextBoolean())
            RowOps.update(spark, dir, col("k") % p === r,
              Seq("m" -> lit(-(step + 1).toLong)), Seq("k"))
          else spark.sql(s"UPDATE $tbl SET m = ${-(step + 1)} " +
            s"WHERE k % $p = $r")
          model = model.map { case (k, m) =>
            if (k % p == r) (k, -(step + 1).toLong) else (k, m)
          }
        case 2 => // upsert: some existing keys, some new
          val keys = (Seq.fill(rnd.nextInt(8) + 1)(
            rnd.nextInt(320).toLong) ++
            Seq.fill(rnd.nextInt(3))(1000L + rnd.nextInt(50))).distinct
          val src = keys.map(k => (k, 100L * step + k % 9))
          RowOps.upsert(spark, dir, src.toDF("k", "m"), Seq("k"), Seq("k"))
          val srcKeys = src.map(_._1).toSet
          model = model.filterNot(r => srcKeys.contains(r._1)) ++ src
        case 3 => // erasure by key set
          val keys = Seq.fill(rnd.nextInt(6) + 1)(rnd.nextInt(350).toLong)
            .distinct
          RowOps.deleteKeys(spark, dir, keys.toDF("k"), Seq("k"), Seq("k"))
          val ks = keys.toSet
          model = model.filterNot(r => ks.contains(r._1))
        case 4 => // FULL merge: conditional clause matrix, first-true-wins
          val keys = (Seq.fill(rnd.nextInt(8) + 2)(
            rnd.nextInt(340).toLong) ++
            Seq.fill(rnd.nextInt(4))(1000L + rnd.nextInt(60))).distinct
          val src = keys.map(k => (k, 100L * step + k % 9))
          val srcMap = src.toMap
          val x = rnd.nextInt(200).toLong
          val tgtKeys = model.map(_._1).toSet
          if (rnd.nextBoolean()) {
            import graft.sources.RowOps.{MergeDelete, MergeInsert,
              MergeUpdate, srcCol}
            RowOps.merge(spark, dir, src.toDF("k", "m"), Seq("k"),
              Seq("k"),
              matched = Seq(
                MergeUpdate(Some(srcCol("m") % 3 === 0),
                  Seq("m" -> (col("m") + 1))),
                MergeDelete(Some(col("m") < 0))),
              notMatched = Seq(MergeInsert(Some(srcCol("m") % 2 === 0),
                Seq("k" -> srcCol("k"), "m" -> -srcCol("m")))),
              notMatchedBySource = Seq(MergeUpdate(Some(col("k") < x),
                Seq("m" -> lit(-77L)))))
          } else {
            src.toDF("k", "m").createOrReplaceTempView("rowprop_msrc")
            spark.sql(
              s"""MERGE INTO $tbl t USING rowprop_msrc s ON t.k = s.k
                 |WHEN MATCHED AND s.m % 3 = 0 THEN UPDATE SET m = t.m + 1
                 |WHEN MATCHED AND t.m < 0 THEN DELETE
                 |WHEN NOT MATCHED AND s.m % 2 = 0
                 |  THEN INSERT (k, m) VALUES (s.k, -s.m)
                 |WHEN NOT MATCHED BY SOURCE AND t.k < $x
                 |  THEN UPDATE SET m = -77
                 |""".stripMargin)
          }
          model = model.flatMap { case (k, m) =>
            srcMap.get(k) match {
              case Some(sm) =>
                if (sm % 3 == 0) Some((k, m + 1))
                else if (m < 0) None
                else Some((k, m))
              case None => if (k < x) Some((k, -77L)) else Some((k, m))
            }
          } ++ src.filter { case (k, sm) =>
            !tgtKeys.contains(k) && sm % 2 == 0
          }.map { case (k, sm) => (k, -sm) }
      }
      val v = StatsManifest.versions(spark, dir).last
      assert(scanRows(dir) === sortedSeq(model),
        s"seed=$seed step=$step: live state diverged from the model")
      if (v != snaps.last._1) snaps :+= v -> model

      // interleave content-neutral MAINTENANCE: deferDelete re-cluster /
      // compaction (layout churn the CDC invariant must net to zero)
      // and retention (vacuum) — the model is unchanged by all three
      if (rnd.nextInt(10) < 3) {
        rnd.nextInt(3) match {
          case 0 => graft.operators.Layout.optimize(spark, dir,
            Seq("k"), targetBytes = 1L << 20, deferDelete = true)
          case 1 => graft.operators.Layout.compactSmall(spark, dir,
            Seq("k"), targetBytes = 1L << 26, smallBytes = 1L << 26,
            deferDelete = true)
          case 2 =>
            StatsManifest.expire(spark, dir, keep = 6)
            val oldest = StatsManifest.versions(spark, dir).head
            snaps = snaps.filter(_._1 >= oldest)
        }
        assert(scanRows(dir) === sortedSeq(model),
          s"seed=$seed step=$step: maintenance changed the content")
      }
    }

    // every snapshot replays its historical state
    snaps.foreach { case (v, m) =>
      val got = sortedSeq(StatsManifest.scanAtVersion(spark, dir, v)._1
        .select("k", "m").as[RowT].collect().toSeq)
      assert(got === sortedSeq(m), s"seed=$seed: snapshot v$v diverged")
    }

    // CDC invariant over random version pairs: model_i ⊎ ins == model_j ⊎ del
    val pairs = Seq.fill(4)((rnd.nextInt(snaps.length),
      rnd.nextInt(snaps.length))).map { case (x, y) =>
      (math.min(x, y), math.max(x, y))
    }.filter(p => p._1 < p._2)
    pairs.foreach { case (i, j) =>
      val (vi, mi) = snaps(i)
      val (vj, mj) = snaps(j)
      val cdc = RowOps.changes(spark, dir, vi, vj)
        .select("k", "m", "_change_type")
        .as[(Long, Long, String)].collect()
      val ins = cdc.filter(_._3 == "insert").map(c => (c._1, c._2)).toSeq
      val del = cdc.filter(_._3 == "delete").map(c => (c._1, c._2)).toSeq
      assert(sortedSeq(mi ++ ins) === sortedSeq(mj ++ del),
        s"seed=$seed: CDC v$vi→v$vj violates the changefeed invariant")
    }
    spark.sql(s"DROP TABLE IF EXISTS rowprop_$seed")
  }
}
