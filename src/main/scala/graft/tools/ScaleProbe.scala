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
    val line =
      f"""{"metric":"scaleprobe","decades":2,"gen_sf1_sec":$gen1%.1f,""" +
        f""""gen_sf10_sec":$gen10%.1f,"queries":$qjson%s}"""
    val out = new java.io.File("target/scaleprobe.json")
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(line) finally w.close()
    println(line)
    spark.stop()
  }
}
