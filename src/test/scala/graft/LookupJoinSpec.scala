package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LookupJoin

/** Instrumented client: static (JVM-wide) counters survive the task
  * closure serialization in local mode, so the spec can pin round-trip
  * counts (batching) and re-request behavior (cache). */
object CountingClient {
  val calls = new java.util.concurrent.atomic.AtomicLong
  val keysRequested = new java.util.concurrent.atomic.AtomicLong
  def reset(): Unit = { calls.set(0); keysRequested.set(0) }
}
final class CountingClient(table: Map[Long, Seq[Any]])
    extends LookupJoin.LookupClient {
  override def lookup(keys: Seq[Long]): Map[Long, Seq[Any]] = {
    CountingClient.calls.incrementAndGet()
    CountingClient.keysRequested.addAndGet(keys.length)
    keys.iterator.flatMap(k => table.get(k).map(k -> _)).toMap
  }
}

/** A store whose value is its own round-trip counter: every fetch
  * observes a strictly newer version, making cache staleness visible. */
object VersionedClient {
  val version = new java.util.concurrent.atomic.AtomicLong
  def reset(): Unit = version.set(0)
}
final class VersionedClient extends LookupJoin.LookupClient {
  override def lookup(keys: Seq[Long]): Map[Long, Seq[Any]] = {
    val v = VersionedClient.version.incrementAndGet()
    keys.iterator.map(k => k -> Seq[Any](v)).toMap
  }
}

class LookupJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark

  private val valueSchema = StructType(Seq(
    StructField("name", StringType), StructField("seg", StringType)))
  private val dim: Map[Long, Seq[Any]] =
    (0L until 50L).map(k => k -> Seq[Any](s"name_$k", s"seg_${k % 3}")).toMap

  private def probes(n: Int, parts: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, (i % 100).toLong))
      .toDF("row_id", "k").repartition(parts)
  }

  test("left lookup join fills nulls on miss; inner drops") {
    val df = probes(200, 2)
    val left = LookupJoin.lookupJoin(df, "k",
      new LookupJoin.MapLookupClient(dim), valueSchema, "left")
    assert(left.count() === 200)
    assert(left.where(col("name").isNull).count() === 100) // keys 50..99
    val inner = LookupJoin.lookupJoin(df, "k",
      new LookupJoin.MapLookupClient(dim), valueSchema, "inner")
    assert(inner.count() === 100)
    // values line up with the store
    val row = left.where(col("k") === 7L).select("name", "seg").head()
    assert((row.getString(0), row.getString(1)) === ("name_7", "seg_1"))
  }

  test("equals a broadcast join on the same dimension") {
    import spark.implicits._
    val df = probes(500, 4)
    val got = LookupJoin.lookupJoin(df, "k",
        new LookupJoin.MapLookupClient(dim), valueSchema, "inner")
      .select("row_id", "k", "name", "seg").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    val dimDf = dim.toSeq.map { case (k, v) =>
      (k, v(0).asInstanceOf[String], v(1).asInstanceOf[String])
    }.toDF("dk", "name", "seg")
    val want = df.join(broadcast(dimDf), col("k") === col("dk"))
      .select("row_id", "k", "name", "seg").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("batching bounds round trips; cache suppresses repeat keys") {
    // single partition so the static counters tell a deterministic story
    val df = probes(1000, 1)
    CountingClient.reset()
    LookupJoin.lookupJoin(df, "k", new CountingClient(dim), valueSchema,
      "left", batchSize = 100, cacheCapacity = 100000,
      prefetch = false).count()
    // 10 batches of 100 rows; every distinct key (100) is requested
    // exactly once — later batches are full cache hits (incl. misses)
    assert(CountingClient.calls.get() === 1,
      "all distinct keys seen in batch 1; later batches must not call")
    assert(CountingClient.keysRequested.get() === 100)

    // cache off (capacity 0): every batch pays a round trip
    CountingClient.reset()
    LookupJoin.lookupJoin(df, "k", new CountingClient(dim), valueSchema,
      "left", batchSize = 100, cacheCapacity = 0, prefetch = false).count()
    assert(CountingClient.calls.get() === 10)
    assert(CountingClient.keysRequested.get() === 1000)
  }

  test("prefetch overlaps lookup latency and preserves order") {
    val df = probes(400, 1)
    val got = LookupJoin.lookupJoin(df, "k",
        new LookupJoin.MapLookupClient(dim, latencyMs = 5), valueSchema,
        "left", batchSize = 50, prefetch = true)
      .select("row_id").collect().map(_.getLong(0)).toSeq
    assert(got === (0L until 400L)) // single partition keeps row order
  }

  test("streaming probe side: each micro-batch observes the store " +
      "fresh (staleness bounded by the micro-batch interval)") {
    // the documented streaming bound: micro-batches run fresh tasks, so
    // a cached key's age never exceeds one micro-batch — the same key
    // probed in consecutive batches observes advancing store versions
    // even with caching ON
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val vs = StructType(Seq(StructField("v", LongType)))
    VersionedClient.reset()
    val mem = MemoryStream[Long]
    val probe = mem.toDF().toDF("k").coalesce(1)
    val joined = LookupJoin.lookupJoin(probe, "k", new VersionedClient,
      vs, batchSize = 16, cacheCapacity = 100, prefetch = false)
    val q = joined.writeStream.format("memory").queryName("t_lookup_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(1L, 2L, 1L); q.processAllAvailable()
    mem.addData(1L, 2L); q.processAllAvailable()
    val rows = spark.table("t_lookup_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    q.stop()
    val byVersion = rows.groupBy(_._2).view.mapValues(_.length).toMap
    // batch 1: one fetch (version 1) serves all three probes from the
    // cache; batch 2's fresh task re-fetches (version 2)
    assert(byVersion === Map(1L -> 3, 2L -> 2), s"rows=${rows.toSeq}")
  }

  test("staleness contract: cached keys hold the task's first-fetch " +
      "version; capacity 0 re-queries per batch") {
    // the documented bound (LookupJoin scaladoc): with caching, a key's
    // joined value is the task's FIRST fetch of that key — never older
    // than the task start; with cacheCapacity = 0 every batch observes
    // the store fresh (the reference's cache-off async lookup).
    import spark.implicits._
    val df = Seq(1L, 2L, 1L, 2L).toDF("k").coalesce(1)
    val vs = StructType(Seq(StructField("v", LongType)))
    VersionedClient.reset()
    val cached = LookupJoin.lookupJoin(df, "k", new VersionedClient, vs,
        batchSize = 2, cacheCapacity = 100, prefetch = false)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    // batch 2's probes are cache hits: they observe batch 1's version
    assert(cached.toSeq ===
      Seq((1L, 1L), (2L, 1L), (1L, 1L), (2L, 1L)))
    VersionedClient.reset()
    val fresh = LookupJoin.lookupJoin(df, "k", new VersionedClient, vs,
        batchSize = 2, cacheCapacity = 0, prefetch = false)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    // capacity 0: batch 2 re-queries and observes the newer version
    assert(fresh.toSeq ===
      Seq((1L, 1L), (2L, 1L), (1L, 2L), (2L, 2L)))
  }
}
