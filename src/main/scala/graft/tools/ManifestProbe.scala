package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.sources.StatsManifest

/** Measures the stats-manifest file-skip ratio and its wall-clock payoff
  * on the sf0.1 lineitem fixture (VERDICT r9 ask #1's "Done" evidence):
  * z-order by (l_orderkey, l_partkey) into P files + manifest, then run
  * point/range predicates on BOTH clustered columns through (a) the
  * manifest-pruned scan and (b) a plain parquet scan of the same files,
  * printing files-read, rows delivered by the scan node, and min-of-3
  * times for each. Run on demand:
  *   sbt "runMain graft.tools.ManifestProbe [sfDir] [numFiles]"
  * Prints one JSON line and writes target/manifestprobe.json.
  */
object ManifestProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val p = if (args.length > 1) args(1).toInt else 64
    val spark = graft.engine.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    val li = graft.engine.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val dir = new java.io.File("target/manifestprobe/z").getAbsolutePath
    val t0 = System.nanoTime()
    Layout.zorderWrite(li, Seq("l_orderkey", "l_partkey"), dir, p)
    val writeSec = (System.nanoTime() - t0) / 1e9

    val (loMax, lpMax) = {
      val r = li.agg(max("l_orderkey"), max("l_partkey")).collect().head
      (r.getLong(0), r.getLong(1))
    }
    // point + 5%-range predicates on each clustered column, and a
    // two-column conjunction — the shapes a z-ordered layout exists for
    val preds = Seq(
      ("orderkey_point", col("l_orderkey") === loMax / 3),
      ("orderkey_range", col("l_orderkey").between(loMax / 3,
        loMax / 3 + loMax / 20)),
      ("partkey_point", col("l_partkey") === lpMax / 3),
      ("partkey_range", col("l_partkey").between(lpMax / 3,
        lpMax / 3 + lpMax / 20)),
      ("both_range", col("l_orderkey") < loMax / 4 &&
        col("l_partkey") < lpMax / 4))

    def timed(mk: () => org.apache.spark.sql.DataFrame): (Double, Long) = {
      def once(): (Double, Long) = {
        // metrics must be read from the EXECUTED QueryExecution — the
        // agg is part of the plan we collect, not a separate one
        val agg = mk()
          .agg(count(lit(1)), sum("l_quantity"), sum("l_extendedprice"))
        val t = System.nanoTime()
        agg.collect()
        ((System.nanoTime() - t) / 1e9,
          graft.engine.Observe.nodeMetrics(agg).collectFirst {
            case (n, m, v) if n.contains("Scan") &&
              m == "number of files read" => v
          }.getOrElse(-1L))
      }
      once() // warm (codegen + page cache)
      val rs = Seq.fill(3)(once())
      (rs.map(_._1).min, rs.head._2)
    }

    val entries = preds.map { case (name, pred) =>
      val (scanDf, idx) = StatsManifest.scanWithIndex(spark, dir)
      val (tPruned, filesPruned) = timed(() => scanDf.where(pred))
      val (tPlain, filesPlain) = timed(() =>
        spark.read.parquet(dir).where(pred))
      val (sel, tot) = (idx.selected.get(), idx.total.get())
      // equality guard: the pruned scan must return the same aggregate
      val a = StatsManifest.scan(spark, dir).where(pred)
        .agg(count(lit(1)), sum("l_quantity")).collect().head
      val b = spark.read.parquet(dir).where(pred)
        .agg(count(lit(1)), sum("l_quantity")).collect().head
      require(a == b, s"$name: pruned=$a plain=$b")
      f""""$name":{"manifest_selected":$sel,"manifest_total":$tot,""" +
        f""""files_pruned":$filesPruned,"files_plain":$filesPlain,""" +
        f""""sec_pruned":$tPruned%.3f,"sec_plain":$tPlain%.3f}"""
    }

    // Bloom point-lookup section: digest = md5(comment) is
    // hash-scattered, so per-file [min,max] spans the hex domain and
    // range stats refute nothing — the per-file bloom is the only
    // layer that can skip files for a point predicate.
    val bloomEntry = {
      val rows = graft.engine.Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), md5(concat_ws("|",
          col("l_orderkey"), col("l_linenumber"))).as("digest"))
      val bdir = new java.io.File("target/manifestprobe/bloom")
        .getAbsolutePath
      rows.repartition(p).write.mode("overwrite").parquet(bdir)
      val tb = System.nanoTime()
      StatsManifest.write(spark, bdir, Seq("digest"), Seq("digest"))
      val bloomWriteSec = (System.nanoTime() - tb) / 1e9
      val probe = rows.orderBy("l_orderkey").limit(1)
        .select("digest").collect().head.getString(0)
      def onceB(df: org.apache.spark.sql.DataFrame): (Double, Long) = {
        val agg = df.where(col("digest") === probe)
          .agg(count(lit(1)), sum("l_orderkey"))
        val t = System.nanoTime()
        agg.collect()
        ((System.nanoTime() - t) / 1e9,
          graft.engine.Observe.nodeMetrics(agg).collectFirst {
            case (n, m, v) if n.contains("Scan") &&
              m == "number of files read" => v
          }.getOrElse(-1L))
      }
      val (scanDf, idx) = StatsManifest.scanWithIndex(spark, bdir)
      onceB(scanDf) // warm
      val prunedRuns = Seq.fill(3)(onceB(scanDf))
      val plain = spark.read.parquet(bdir)
      onceB(plain)
      val plainRuns = Seq.fill(3)(onceB(plain))
      f""""bloom_point":{"manifest_selected":${idx.selected.get()},""" +
        f""""manifest_total":${idx.total.get()},""" +
        f""""files_pruned":${prunedRuns.head._2},""" +
        f""""files_plain":${plainRuns.head._2},""" +
        f""""bloom_write_sec":$bloomWriteSec%.1f,""" +
        f""""sec_pruned":${prunedRuns.map(_._1).min}%.3f,""" +
        f""""sec_plain":${plainRuns.map(_._1).min}%.3f}"""
    }

    // Row-level op section: how much of the table does a targeted
    // DELETE / MERGE actually rewrite on the z-ordered layout? The
    // manifest prunes candidate discovery (files scanned for matches)
    // and copy-on-write bounds the rewrite to files holding matches —
    // candidates/touched/total are the evidence, sec is end-to-end
    // (find + stage + commit + rename).
    val rowopsEntry = {
      val rdir = new java.io.File("target/manifestprobe/rowops")
        .getAbsolutePath
      Layout.zorderWrite(li, Seq("l_orderkey", "l_partkey"), rdir, p)
      val t1 = System.nanoTime()
      val del = graft.sources.RowOps.delete(spark, rdir,
        col("l_orderkey").between(loMax / 3, loMax / 3 + loMax / 100),
        Seq("l_orderkey", "l_partkey"))
      val delSec = (System.nanoTime() - t1) / 1e9
      // upsert: 1000 keys in a narrow range — the CDC-apply batch shape
      val src = StatsManifest.scan(spark, rdir)
        .where(col("l_orderkey").between(loMax / 2,
          loMax / 2 + loMax / 200))
        .groupBy("l_orderkey", "l_partkey")
        .agg(max("l_quantity").as("l_quantity"),
          max("l_extendedprice").as("l_extendedprice"))
        .limit(1000)
      val srcRows = src.collect()
      val srcDf = spark.createDataFrame(
        spark.sparkContext.parallelize(srcRows.toIndexedSeq, 4), src.schema)
        .withColumn("l_quantity", lit(-1.0))
      val t2 = System.nanoTime()
      val ups = graft.sources.RowOps.upsert(spark, rdir, srcDf,
        Seq("l_orderkey", "l_partkey"), Seq("l_orderkey", "l_partkey"))
      val upsSec = (System.nanoTime() - t2) / 1e9
      f""""rowops":{"delete":{"candidates":${del.candidateFiles},""" +
        f""""touched":${del.touchedFiles},"total":${del.totalFiles},""" +
        f""""matched_rows":${del.matchedRows},"sec":$delSec%.2f},""" +
        f""""upsert":{"candidates":${ups.candidateFiles},""" +
        f""""touched":${ups.touchedFiles},"total":${ups.totalFiles},""" +
        f""""matched_rows":${ups.matchedRows},"sec":$upsSec%.2f}}"""
    }

    // CDC read cost: the same changefeed served from the ops'
    // PRECOMPUTED netted change files vs re-derived by file-diff
    // netting (exceptAll over the touched files' old+new bytes). The
    // precomputed path is what a CDC subscriber pays per poll.
    val cdcEntry = {
      val rdir = new java.io.File("target/manifestprobe/rowops")
        .getAbsolutePath // reuse the rowops table: v1..v3 committed above
      def timeChanges(): (Double, Long) = {
        val t = System.nanoTime()
        val n = graft.sources.RowOps.changes(spark, rdir, 1L, 3L).count()
        ((System.nanoTime() - t) / 1e9, n)
      }
      timeChanges() // warm
      val (tPre, nPre) = Seq.fill(3)(timeChanges()).minBy(_._1)
      // drop the change files → same rows via fallback netting
      val fs = new org.apache.hadoop.fs.Path(rdir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.globStatus(new org.apache.hadoop.fs.Path(rdir,
        "_graft_cdc/v*.parquet")).foreach(st => fs.delete(st.getPath, false))
      timeChanges() // warm
      val (tFall, nFall) = Seq.fill(3)(timeChanges()).minBy(_._1)
      require(nPre == nFall, s"cdc probe: $nPre != $nFall")
      f""""cdc_read":{"rows":$nPre,"sec_precomputed":$tPre%.3f,""" +
        f""""sec_fallback_netting":$tFall%.3f}"""
    }

    val line = s"""{"sf":"$sfDir","files":$p,""" +
      f""""zorder_write_sec":$writeSec%.1f,${entries.mkString(",")},""" +
      bloomEntry + "," + rowopsEntry + "," + cdcEntry + "}"
    val out = new java.io.File("target/manifestprobe.json")
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(line) finally w.close()
    println(line)
    spark.stop()
  }
}
