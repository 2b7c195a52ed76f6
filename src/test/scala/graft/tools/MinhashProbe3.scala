package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level timing of q_dedup_minhash_lsh + an explode/hash-agg
  * reformulation (everything codegen, min() makes dedup unnecessary). */
object MinhashProbe3 {
  private val NumHashes = 8
  private val BandSize = 2
  private val P = 4294967311L
  private def aCoef(i: Int) = 1L + i * 7368787L
  private def bCoef(i: Int) = 12345L + i * 104729L

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-34s best=${runs.min}%.3f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.engine.Tables.load(spark, sfDir, "documents")
    docs.count()

    val toks = split(col("text"), " ")
    val shArr = array_distinct(transform(
      sequence(lit(0), size(toks) - 3),
      i => concat_ws(" ", element_at(toks, i + 1),
        element_at(toks, i + 2), element_at(toks, i + 3))))
    val xs = transform(shArr,
      sh => conv(substring(md5(sh), 1, 8), 16, 10).cast("long"))
    val n = spark.sparkContext.defaultParallelism

    val p1 = docs.where(size(toks) >= 3).repartition(n)
      .select(col("doc_id"), xs.as("xs"))
    time("p1 xs array (interpreted)")(noop(p1))
    val minhashes = (0 until NumHashes).map(i =>
      array_min(transform(col("xs"),
        x => pmod(lit(aCoef(i)) * x + lit(bCoef(i)), lit(P)))).as(s"h$i"))
    val sig = p1.repartition(n, col("doc_id"))
      .select(col("doc_id") +: minhashes: _*)
    time("p2 sig (current)")(noop(sig))
    time("full current")(noop(
      graft.queries.Catalog.byName("q_dedup_minhash_lsh").run(spark, sfDir)))

    // explode + codegen md5 + hash-agg min
    def sigExplode: DataFrame = {
      docs.where(size(toks) >= 3).repartition(n)
        .select(col("doc_id"), explode(shArr).as("sh"))
        .select(col("doc_id"),
          conv(substring(md5(col("sh")), 1, 8), 16, 10).cast("long").as("x"))
        .groupBy(col("doc_id"))
        .agg(min(pmod(lit(aCoef(0)) * col("x") + lit(bCoef(0)), lit(P))).as("h0"),
          (1 until NumHashes).map(i =>
            min(pmod(lit(aCoef(i)) * col("x") + lit(bCoef(i)), lit(P))).as(s"h$i")): _*)
    }
    time("p2b sig explode+hashagg")(noop(sigExplode))
    def fullExplode: DataFrame = {
      val stackArgs = (0 until NumHashes / BandSize).map { b =>
        s"$b, h${BandSize * b}, h${BandSize * b + 1}"
      }.mkString(", ")
      val bands = sigExplode.selectExpr("doc_id",
        s"stack(${NumHashes / BandSize}, $stackArgs) AS (band, k1, k2)")
      bands.groupBy(col("band"), col("k1"), col("k2"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .where(size(col("ids")) > 1)
        .select(explode(flatten(transform(col("ids"), (a, i) =>
          transform(slice(col("ids"), i + lit(2), size(col("ids"))),
            b => struct(a.as("a"), b.as("b")))))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .distinct()
        .orderBy(col("a"), col("b"))
    }
    time("full explode+hashagg")(noop(fullExplode))
    // shingle via explode of split positions (no array_distinct/transform)
    def sigExplode2: DataFrame = {
      docs.where(size(toks) >= 3).repartition(n)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumn("sh", concat_ws(" ", col("col"),
          lead(col("col"), 1).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id")).orderBy(col("pos"))),
          lead(col("col"), 2).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id")).orderBy(col("pos")))))
        .groupBy(col("doc_id"))
        .agg(min(pmod(lit(aCoef(0)) * conv(substring(md5(col("sh")), 1, 8), 16, 10)
            .cast("long") + lit(bCoef(0)), lit(P))).as("h0"),
          (1 until NumHashes).map(i =>
            min(pmod(lit(aCoef(i)) * conv(substring(md5(col("sh")), 1, 8), 16, 10)
              .cast("long") + lit(bCoef(i)), lit(P))).as(s"h$i")): _*)
    }
    time("p2c sig window-lead")(noop(sigExplode2))
    spark.stop()
  }
}
