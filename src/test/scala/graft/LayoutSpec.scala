package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Observe
import graft.operators.Layout

/** Z-order layout: the write-path clustering that makes parquet min/max
  * pruning work on every clustered column (SCALE.md · Scans). The pin is
  * the geometry itself — per-partition value extents — because that is
  * exactly what a parquet footer's min/max records and what a reader
  * prunes on; no timing.
  *
  * ORDER-DEPENDENCE, pinned (r13): `repartitionByRange` seeds its
  * reservoir sample from the GLOBAL rdd-id counter, so the exact range
  * boundaries — and with them every geometry number below — shift by a
  * few percent depending on how many RDDs earlier suites created
  * (measured: partsPerLang 4.50–4.88 across counter offsets, against a
  * 5.2 threshold). Isolated runs are stable; a full-suite run draws a
  * different sample. The marginal assertions therefore take the MEDIAN
  * of three independent layouts — three fresh samples — which turns a
  * ~2σ single-draw tail into a pass unless the geometry is actually
  * broken. */
class LayoutSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sf

  /** Median of three evaluations — each re-layout draws a fresh range
    * sample (the global rdd-id counter advances), de-flaking
    * single-draw geometry without loosening any threshold. */
  private def med3(f: => Double): Double =
    Seq(f, f, f).sorted.apply(1)

  private def lineitem = graft.engine.Tables
    .load(spark, sf, "lineitem")
    .select("l_orderkey", "l_partkey", "l_quantity")

  /** Mean per-partition (max − min) of `c` under df's CURRENT physical
    * partitioning (spark_partition_id is captured before the agg
    * shuffles). */
  private def meanExtent(df: DataFrame, c: String): Double =
    df.withColumn("pid", spark_partition_id())
      .groupBy("pid").agg((max(col(c)) - min(col(c))).cast("double").as("ext"))
      .agg(avg("ext")).collect().head.getDouble(0)

  private def range(df: DataFrame, c: String): Double =
    df.agg((max(col(c)) - min(col(c))).cast("double")).collect().head.getDouble(0)

  test("zorder bounds EVERY clustered column's per-partition extent; linear sort does not") {
    val li = lineitem
    val P = 16
    def z = Layout.zorder(li, Seq("l_orderkey", "l_partkey"), P)
    val linear = li.repartitionByRange(P, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")

    val rOrder = range(li, "l_orderkey")
    val rPart = range(li, "l_partkey")

    // the control: a linear layout leaves the NON-sort column's extent at
    // ~the full domain in every partition — a filter on it prunes nothing
    assert(meanExtent(linear, "l_partkey") > 0.7 * rPart)

    // z-order: BOTH columns' extents shrink to ~domain/√P (the 2-dim
    // Morton rectangle); assert the halving with slack for bucket-edge
    // effects and duplicate quantile boundaries (median of three
    // layouts — range-sample seed drift, see the class doc)
    val zOrderExt = med3(meanExtent(z, "l_orderkey"))
    val zPartExt = med3(meanExtent(z, "l_partkey"))
    assert(zPartExt < 0.5 * rPart,
      f"partkey extent $zPartExt%.0f !< half of $rPart%.0f")
    assert(zOrderExt < 0.5 * rOrder,
      f"orderkey extent $zOrderExt%.0f !< half of $rOrder%.0f")

    // the documented trade: the leading column's extent grows vs the
    // linear layout (domain/P → ~domain/√P) but stays bounded
    assert(meanExtent(linear, "l_orderkey") < zOrderExt)
  }

  test("zorder is a pure re-layout: row multiset unchanged, partitions balanced") {
    val li = lineitem
    val P = 8
    val z = Layout.zorder(li, Seq("l_orderkey", "l_partkey"), P)
    assert(z.count() === li.count())
    // content fingerprint (order-insensitive; XOR can't overflow ANSI longs)
    def fp(df: DataFrame): Long = df
      .agg(expr("bit_xor(xxhash64(l_orderkey, l_partkey, l_quantity))"))
      .collect().head.getLong(0)
    assert(fp(z) === fp(li))
    // range partitioning on the sampled z keeps output files balanced:
    // no partition more than 3× the mean (reservoir-sampled boundaries;
    // median of three samples — see the class doc)
    val sizes = z.withColumn("pid", spark_partition_id())
      .groupBy("pid").count().collect().map(_.getLong(1))
    assert(sizes.length === P)
    def balance: Double = {
      val s = Layout.zorder(li, Seq("l_orderkey", "l_partkey"), P)
        .withColumn("pid", spark_partition_id())
        .groupBy("pid").count().collect().map(_.getLong(1))
      s.max.toDouble / (s.sum.toDouble / s.length)
    }
    val b = med3(balance)
    assert(b < 3.0, f"unbalanced: median-of-3 max/mean = $b%.2f")
  }

  test("nulls rank lowest and never crash the interleave") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (null, 5L), (1L, null), (2L, 2L), (3L, 7L), (null, null))
      .toDF("a", "b")
    val z = Layout.zorder(df, Seq("a", "b"), 2)
    assert(z.count() === 5)
    // the all-null row carries z = 0: it sorts into the FIRST partition,
    // exactly where a linear sort layout puts nulls
    val firstPart = z.withColumn("pid", spark_partition_id())
      .where(col("a").isNull && col("b").isNull)
      .select("pid").collect().head.getInt(0)
    assert(firstPart === 0)
  }

  test("string columns cluster by hash surrogate: equal values co-locate") {
    import spark.implicits._
    // a plain cast("double") on strings yields null and would rank every
    // row 0; the xxhash64 surrogate keeps equal values adjacent in
    // z-space, which is what point-predicate pruning needs
    val langs = Seq("en", "de", "fr", "ja", "pt", "zh", "ru", "es")
    val df = (0 until 8000)
      .map(i => (langs(i % langs.size), (i * 37) % 1000)).toDF("lang", "n")
    val P = 8
    def partsPerLang(d: DataFrame): Double = {
      val counts = d.withColumn("pid", spark_partition_id())
        .groupBy("lang").agg(countDistinct("pid").cast("double").as("p"))
        .agg(avg("p")).collect().head.getDouble(0)
      counts
    }
    val random = df.repartition(P)
    // random placement puts every language in ~all partitions; z-order
    // confines each language to the partitions its z-slab touches. With
    // two interleaved dims the slab still crosses the OTHER dim's bits,
    // so the geometric expectation at P=8 is ~P/2 (+ range-boundary
    // straddle) — assert a clear win over random, not the exact number.
    // Median of three layouts: the measured single-draw spread is
    // 4.50–4.88 against the 5.2 bound (class doc).
    val pplRandom = partsPerLang(random)
    val pplZ = med3(partsPerLang(Layout.zorder(df, Seq("lang", "n"), P)))
    assert(pplRandom > 0.9 * P)
    assert(pplZ <= 0.65 * P, f"langs span $pplZ%.1f of $P partitions")
    assert(pplZ * 1.4 < pplRandom)
  }

  test("z-order pays on the real read path: footers prune files, reader skips row groups") {
    // Two storage-level proofs on top of the in-memory extent pin:
    //  (a) the WRITTEN parquet footers' min/max statistics — what a
    //      footer-indexing reader or lakehouse table format prunes files
    //      on — admit only a fraction of z-ordered files for a filter on
    //      the NON-leading column, where the linear layout admits ALL;
    //  (b) Spark's own reader: pushed filters drop whole row groups, so
    //      the scan node DELIVERS fewer rows under the z layout for the
    //      same two-column filter and the same final answer
    //      (Observe.nodeMetrics reads the scan's output-rows metric).
    val li = lineitem
    val P = 16
    val dir = java.nio.file.Files.createTempDirectory("graft_zread_").toString
    Layout.zorder(li, Seq("l_orderkey", "l_partkey"), P)
      .write.parquet(s"$dir/z")
    li.repartitionByRange(P, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.parquet(s"$dir/linear")
    val loT = (range(li, "l_orderkey") * 0.2).toLong
    val lpT = (range(li, "l_partkey") * 0.2).toLong

    // (a) footer statistics: files whose l_partkey [min, max] intersects
    // partkey < lpT — the file-skip set of any stats-indexed reader
    def admittedFiles(path: String): (Int, Int) = {
      import scala.jdk.CollectionConverters._
      val hconf = spark.sparkContext.hadoopConfiguration
      val files = new java.io.File(path).listFiles
        .filter(_.getName.endsWith(".parquet"))
      val admitted = files.count { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), hconf)
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try rd.getFooter.getBlocks.asScala.exists { b =>
          val st = b.getColumns.asScala
            .find(_.getPath.toDotString == "l_partkey").get.getStatistics
          st.genericGetMin.asInstanceOf[Number].longValue < lpT
        } finally rd.close()
      }
      (admitted, files.length)
    }
    val (zAdm, zN) = admittedFiles(s"$dir/z")
    val (linAdm, linN) = admittedFiles(s"$dir/linear")
    assert(linAdm === linN, // linear: partkey spans the domain everywhere
      s"linear layout unexpectedly prunable on partkey: $linAdm/$linN")
    assert(zAdm * 2 <= zN, // z-order: ≥ half the files are skippable
      s"z-order footers admit $zAdm of $zN files for partkey<$lpT")

    // (b) runtime row-group pruning through Spark's scan metrics
    def scanDelivered(path: String): (Long, Long) = {
      val df = spark.read.parquet(path)
        .where(col("l_orderkey") < loT && col("l_partkey") < lpT)
      // execute THIS QueryExecution: count() would build its own plan
      // and leave df's metrics untouched
      val result = df.collect().length.toLong
      val delivered = Observe.nodeMetrics(df)
        .collectFirst { case (n, m, v)
          if n.contains("Scan") && m == "number of output rows" => v }
        .getOrElse(fail(s"no scan output-rows metric for $path"))
      (delivered, result)
    }
    val (zRows, zCnt) = scanDelivered(s"$dir/z")
    val (linRows, linCnt) = scanDelivered(s"$dir/linear")
    assert(zCnt === linCnt) // same answer
    assert(zRows < linRows, // fewer row groups survive under z
      s"z scan delivered $zRows rows, linear $linRows")
  }

  test("zorderValue rejects bit widths that overflow a long") {
    val li = lineitem
    intercept[IllegalArgumentException] {
      Layout.zorderValue(li, Seq("l_orderkey", "l_partkey"), bits = 32)
    }
  }
}
