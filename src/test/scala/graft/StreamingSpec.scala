package graft

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.fries.{EpochReconfig, ReconfigController}
import graft.queries.Catalog
import graft.streaming.Streams

/** Streaming layer: the same event-table operators as the batch catalog,
  * run through Structured Streaming with Trigger.AvailableNow, must agree
  * with their batch equivalents (micro-batch recomputation semantics,
  * SURVEY §1 changelog note). Plus the Fries epoch-reconfiguration hooks.
  */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sf

  test("streaming tumble agg equals batch window agg") {
    val stream = Streams.tumbleAgg(Streams.events(spark, sf))
    val got = Streams.runToTable(spark, stream, "t_tumble", "complete")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    val want = Catalog.byName("q_window_tumble").run(spark, sf)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming dedup keeps one row per event_id") {
    val events = Streams.events(spark, sf)
    val total = Streams.runToTable(spark,
      Streams.dedup(events), "t_dedup", "append").count()
    val distinct = graft.engine.Tables.load(spark, sf, "events")
      .select("event_id").distinct().count()
    assert(total === distinct)
  }

  test("epoch reconfiguration: config re-read at micro-batch boundaries") {
    val ctrl = new ReconfigController[Int](10)
    @volatile var seen = Vector.empty[(Long, Int)]
    val body = EpochReconfig.withConfig(ctrl) { (df, batchId, cfg) =>
      seen = seen :+ (batchId, cfg)
      df.count(): Unit
    }
    def runOnce(): Unit = {
      val q = Streams.events(spark, sf).writeStream
        .foreachBatch(body)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(seen.nonEmpty && seen.forall(_._2 == 10))
    val before = seen.size
    ctrl.publish(99)
    runOnce()
    // every batch after the publish epoch sees the new config, none before
    assert(seen.take(before).forall(_._2 == 10))
    assert(seen.drop(before).nonEmpty && seen.drop(before).forall(_._2 == 99))
    assert(ctrl.roundTripsMs.size == 2)
  }
}
