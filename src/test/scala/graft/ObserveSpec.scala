package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Observe
import graft.queries.{Catalog, PipelineQueries}

/** Observability layer: one-pass pipeline counters via CollectMetrics
  * (`observe`), per-micro-batch observed metrics via the listener, and
  * post-execution plan-node SQL metrics. The batch funnel counters are
  * pinned against the oracle-checked q_pipeline_curate aggregation — the
  * observed numbers must be THE SAME numbers the report query computes,
  * or the production write path and the report would disagree. */
class ObserveSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("observed funnel counters match q_pipeline_curate (one pass)") {
    val docs = graft.engine.Tables.load(spark, SparkFixture.sf, "documents")
      .select("doc_id", "source", "text")
    val fl = PipelineQueries.flagged(docs)
    val metrics = Seq(
      count(lit(1)).as("n_docs"),
      sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"),
      sum(when(!col("is_dup") && col("keep_q"), 1L).otherwise(0L))
        .as("n_accepted"),
      sum(when(!col("is_dup") && col("keep_q"),
        col("n_tokens").cast("long")).otherwise(0L)).as("tok_accepted"))
    // the "action" is the production write; count() stands in for it
    val (outRows, m) = Observe.observed(fl, "funnel", metrics)(_.count())

    val report = Catalog.byName("q_pipeline_curate")
      .run(spark, SparkFixture.sf)
      .agg(sum("n_docs"), sum("n_dup"), sum("n_accepted"),
        sum("tok_accepted"))
      .as[(Long, Long, Long, Long)].head()
    assert(outRows === report._1)
    assert(m("n_docs") === report._1)
    assert(m("n_dup") === report._2)
    assert(m("n_accepted") === report._3)
    assert(m("tok_accepted") === report._4)
  }

  test("curatedDocs emits exactly the accepted documents, text unshuffled") {
    val docs = graft.engine.Tables.load(spark, SparkFixture.sf, "documents")
      .select("doc_id", "source", "text")
    val cur = PipelineQueries.curatedDocs(docs)
    val fl = PipelineQueries.flagged(docs)
    val expected = fl.where(!col("is_dup") && col("keep_q"))
      .select("doc_id").as[Long].collect().toSet
    assert(cur.select("doc_id").as[Long].collect().toSet === expected)
    assert(expected.nonEmpty)
    // full document schema survives (it is the corpus scan's row)
    assert(cur.columns.toSeq === Seq("doc_id", "source", "text"))
    // and no exchange in the plan carries the text column
    val p = cur.queryExecution.executedPlan.toString
    "Exchange [a-z]+partitioning\\([^)]*\\)".r.findAllIn(p).foreach { ex =>
      assert(!ex.contains("text#"), s"text crosses an exchange: $ex")
    }
  }

  test("StreamObserver harvests per-batch observed metrics") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val obs = Observe.StreamObserver.listen(spark, "ingest")
    val observedDf = mem.toDF().toDF("v")
      .observe("ingest", count(lit(1)).as("n"), sum(col("v")).as("s"))
    val q = observedDf.writeStream.format("noop").start()
    try {
      mem.addData(1L, 2L, 3L); q.processAllAvailable()
      mem.addData(10L); q.processAllAvailable()
      // listener events are async — wait for both batches to land
      val deadline = System.nanoTime() + 10e9.toLong
      while (obs.rows.size < 2 && System.nanoTime() < deadline)
        Thread.sleep(20)
    } finally { q.stop(); q.awaitTermination(); obs.stop() }
    assert(obs.rows.size === 2, obs.rows.toString)
    assert(obs.sumLong("n") === 4L)
    assert(obs.sumLong("s") === 16L)
  }

  test("nodeMetrics exposes executed-plan SQL metrics after an action") {
    val df = graft.engine.Tables.load(spark, SparkFixture.sf, "nation")
      .groupBy("n_regionkey").agg(count(lit(1)).as("n"))
    df.collect()
    val ms = Observe.nodeMetrics(df)
    assert(ms.nonEmpty)
    // the scan and the aggregate both report output rows
    val rowMetrics = ms.filter(_._2 == "number of output rows")
    assert(rowMetrics.exists { case (_, _, v) => v >= 25 },
      s"no scan-sized output-rows metric in:\n${ms.mkString("\n")}")
    assert(ms.exists(_._1.toLowerCase.contains("aggregate")), ms.toString)
  }
}
