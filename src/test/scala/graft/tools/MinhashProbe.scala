package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.{GraftSession, Tables}

/** Dev probe: stage-by-stage timing of the minhash pipeline. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val P = 4294967311L
    val toks = split(col("text"), " ")
    val shArr = array_distinct(transform(
      sequence(lit(0), size(toks) - 3),
      i => concat_ws(" ", element_at(toks, i + 1),
        element_at(toks, i + 2), element_at(toks, i + 3))))
    val xs = transform(shArr,
      sh => conv(substring(md5(sh), 1, 8), 16, 10).cast("long"))
    val minhashes = (0 until 8).map(i =>
      array_min(transform(col("xs"),
        x => pmod(lit(1L + i * 7368787L) * x + lit(12345L + i * 104729L),
          lit(P)))).as(s"h$i"))
    val docs = Tables.load(spark, d, "documents")
    time("scan")(docs.count())
    time("scan2")(docs.count())
    val sh = docs.select(col("doc_id"), shArr.as("sh"))
    time("shingles")(sh.count())
    val x = docs.select(col("doc_id"), xs.as("xs"))
    time("md5s")(x.count())
    val sig0 = docs
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .where(size(toks) >= 3)
      .select(col("doc_id"), xs.as("xs"))
      .select(col("doc_id") +: minhashes: _*)
    time("sig")(sig0.count())
    time("sig2")(sig0.count())
    val sig = sig0.repartition(col("doc_id"))
    val stackArgs = (0 until 4).map(b => s"$b, h${2 * b}, h${2 * b + 1}")
      .mkString(", ")
    val all = sig.selectExpr("doc_id", s"stack(4, $stackArgs) AS (band, k1, k2)")
    time("bands")(all.count())
    val joined = all.as("x").join(all.as("y"),
        col("x.band") === col("y.band") && col("x.k1") === col("y.k1")
          && col("x.k2") === col("y.k2") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    time("join")(joined.count())
    time("join2")(joined.count())
    spark.stop()
  }
}
