package graft.tools

import graft.queries.Catalog

/** TWO-decade scale probe: extends the per-round bench's measured curve
  * (sf0.1 → sf1) one more decade to sf10 (~6M orders / 60M-row-scale
  * lineitem × 10 again — ~2 GB parquet) for a slice of headline queries,
  * and fits the ln(time)/ln(sf) exponent across all three points. A
  * sub-linear slope that HOLDS across two decades is much stronger
  * evidence for the 100 TB extrapolation than one step: any hidden
  * super-linear term (a broadcast that should have been a shuffle, a
  * driver-side collect, a quadratic candidate set) bends the second
  * decade even when the first absorbs it in parallel-slack.
  *
  * Deliberately NOT part of the per-round bench: sf10 generation writes
  * ~2 GB once (cached via the scale marker, like sf1) and the slice runs
  * tens of seconds per query. Run on demand:
  *   sbt "runMain graft.tools.ScaleProbe [sf01Dir]"
  * Prints one JSON line and writes target/scaleprobe.json.
  */
object ScaleProbe {

  /** Slice: one representative per family that is cheap enough at sf10 —
    * scan+agg, broadcast join, window Top-N, dedup shuffle, the curation
    * funnel, and a pure scan-local text pass. */
  private val slice = Seq("q_agg_tpch1", "q_join_inner", "q_topn",
    "q_dedup_exact", "q_pipeline_curate", "q_text_quality")

  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.local()
    val sf01 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sf1 = new java.io.File("target/scaledata/sf1").getAbsolutePath
    val sf10 = new java.io.File("target/scaledata/sf10").getAbsolutePath
    val gen1 = ScaleData.ensure(spark, sf01, sf1, 10)
    val gen10 = ScaleData.ensure(spark, sf1, sf10, 10)

    val dirs = Seq(0.1 -> sf01, 1.0 -> sf1, 10.0 -> sf10)
    val times: Map[String, Seq[(Double, Double)]] = slice.map { name =>
      val fn = Catalog.byName(name).run
      name -> dirs.map { case (sf, dir) =>
        def once(): Double = {
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warm
        sf -> Seq.fill(2)(once()).min
      }
    }.toMap

    def slope(pts: Seq[(Double, Double)]): Double = {
      val xs = pts.map(p => math.log(p._1)); val ys = pts.map(p => math.log(p._2))
      val mx = xs.sum / xs.size; val my = ys.sum / ys.size
      xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
        xs.map(x => (x - mx) * (x - mx)).sum
    }

    val qjson = slice.map { n =>
      val pts = times(n)
      val t = pts.map { case (sf, s) => f""""sf$sf%s":$s%.3f""" }.mkString(",")
      f""""$n%s":{$t%s,"slope":${slope(pts)}%.2f}"""
    }.mkString("{", ",", "}")
    val mjson = manifestedBlock(spark, dirs, slope)
    val line =
      f"""{"metric":"scaleprobe","decades":2,"gen_sf1_sec":$gen1%.1f,""" +
        f""""gen_sf10_sec":$gen10%.1f,"queries":$qjson%s,""" +
        f""""manifested":$mjson%s}"""
    val out = new java.io.File("target/scaleprobe.json")
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(line) finally w.close()
    println(line)
    spark.stop()
  }

  /** Lakehouse-family scale curve (VERDICT r9 #8): per sf, build ONE
    * z-ordered manifested lineitem copy (fresh each probe run — the ops
    * mutate it), then time the ops that must NOT scale with the corpus:
    * a manifest-pruned point-range scan (vs the full-scan aggregate that
    * legitimately scales ~linearly — the comparison line), a range
    * DELETE and a keyed upsert MERGE (each rewrites only the touched
    * files), the precomputed CDC read (O(changes)), and a pruned
    * time-travel read at v1. */
  private def manifestedBlock(spark: org.apache.spark.sql.SparkSession,
      dirs: Seq[(Double, String)],
      slope: Seq[(Double, Double)] => Double): String = {
    import org.apache.spark.sql.functions._
    import graft.sources.{RowOps, StatsManifest}
    val ops = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[(Double, Double)]]
    def record(op: String, sf: Double, sec: Double): Unit =
      ops(op) = ops.getOrElse(op, Vector.empty) :+ (sf -> sec)
    def timed[T](body: => T): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for ((sf, dir) <- dirs) {
      val tdir = new java.io.File(
        s"target/scaledata/manifested_sf$sf/lineitem").getAbsolutePath
      val root = new java.io.File(tdir).getParentFile
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(root)
      val li = graft.engine.Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity")
      val nFiles = if (sf < 0.5) 16 else if (sf < 5) 64 else 256
      record("build_zorder", sf, timed {
        graft.operators.Layout.zorderWrite(li,
          Seq("l_orderkey", "l_partkey"), tdir, nFiles)
      })
      def minOf(runs: Int)(body: => Unit): Double =
        { body; Seq.fill(runs)(timed(body)).min } // first call warms
      // pruned point-range scan vs the full-scan aggregate (double SUM
      // never metadata-folds, so both genuinely run; only the pruned
      // one should stay ~flat across the decades)
      record("scan_pruned", sf, minOf(2) {
        StatsManifest.scan(spark, tdir)
          .where(col("l_orderkey").between(5000L, 5999L))
          .agg(sum("l_quantity")).collect()
      })
      record("scan_full", sf, minOf(2) {
        StatsManifest.scan(spark, tdir)
          .agg(sum("l_quantity")).collect()
      })
      // range DELETE: distinct live key ranges per run so every run
      // finds and rewrites comparable work
      var delRun = 0
      record("rowops_delete", sf, minOf(2) {
        val base = 1000L + delRun * 2000L; delRun += 1
        RowOps.delete(spark, tdir,
          col("l_orderkey").between(base, base + 200L),
          Seq("l_orderkey", "l_partkey"))
      })
      // keyed upsert: replace a narrow live range + insert fresh keys
      var upsRun = 0
      record("rowops_upsert", sf, minOf(2) {
        val base = 20000L + upsRun * 2000L; upsRun += 1
        val src = li.where(col("l_orderkey").between(base, base + 100L))
          .dropDuplicates("l_orderkey", "l_partkey")
          .withColumn("l_quantity", lit(-1.0))
        RowOps.upsert(spark, tdir,
          src.unionByName(src
            .withColumn("l_orderkey", col("l_orderkey") + 2000000000L)),
          Seq("l_orderkey", "l_partkey"), Seq("l_orderkey", "l_partkey"))
      })
      // precomputed CDC read of the latest commit: O(changes)
      record("cdc_read", sf, minOf(2) {
        val vs = StatsManifest.versions(spark, tdir)
        RowOps.changes(spark, tdir, vs.last - 1, vs.last)
          .agg(count(lit(1))).collect()
      })
      // pruned snapshot read at v1 (before every mutation above)
      record("time_travel_pruned", sf, minOf(2) {
        StatsManifest.scanAtVersion(spark, tdir, 1L)._1
          .where(col("l_orderkey").between(5000L, 5999L))
          .agg(sum("l_quantity")).collect()
      })
    }
    ops.map { case (op, pts) =>
      val t = pts.map { case (sf, s) => f""""sf$sf%s":$s%.3f""" }
        .mkString(",")
      f""""$op%s":{$t%s,"slope":${slope(pts)}%.2f}"""
    }.mkString("{", ",", "}")
  }
}
