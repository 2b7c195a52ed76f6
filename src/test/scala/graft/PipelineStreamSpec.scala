package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Observe
import graft.queries.PipelineQueries
import graft.streaming.NearDupStream

/** Streaming curation — the live-feed twin of the batch funnel: the
  * exact-dup index filter admits first-seen documents only, and the
  * composed quality-gate + dedup stream admits EXACTLY the set the batch
  * `curatedDocs` admits on the same corpus (id-ordered feed ⇒ first-seen
  * == min-id, the batch window's winner), with the funnel counters
  * riding the query as observed metrics. */
class PipelineStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("exactDupFilter admits only the first-seen doc per digest") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_exdup_").toString
    val mem = MemoryStream[(Long, String)]
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val q = NearDupStream.exactDupFilter(spark,
      mem.toDF().toDF("doc_id", "text"), s"$root/idx",
      out = (df: DataFrame, _: Long) =>
        df.collect().foreach(r => emitted.add(r.getLong(0))))
    try {
      // batch 1: 1 novel, 2 = intra-batch exact copy of 1, 3 novel
      mem.addData((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
        (3L, "delta epsilon zeta"))
      q.processAllAvailable()
      // batch 2: 4 = cross-batch exact copy of 3; 5 NEAR copy of 1 (one
      // word changed — near-dup would drop it, exact must ADMIT it)
      mem.addData((4L, "delta epsilon zeta"), (5L, "alpha beta theta"))
      q.processAllAvailable()
    } finally { q.stop(); q.awaitTermination() }
    import scala.jdk.CollectionConverters._
    assert(emitted.asScala.toSet === Set(1L, 3L, 5L))
  }

  test("packByTokenBudgetStream equals the batch packer on id-ordered shards") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Ops._
    import graft.streaming.Streams
    implicit val sqlCtx = spark.sqlContext
    // two shards, deterministic token counts, some docs above the budget
    val rows = (0L until 120L).map(i =>
      (i % 2, i, (i * 37) % 90 + 10)) // (shard, id, n_tokens) — n in [10, 99]
    val budget = 120L

    // batch reference per shard: buckets=1 → a single block whose local
    // bin sequence is exactly the shard fold (bin_id low bits)
    val expected = (0L to 1L).flatMap { s =>
      val df = rows.filter(_._1 == s).map { case (_, id, n) => (id, n) }
        .toDF("id", "n")
      df.packByTokenBudget(col("id"), col("n"), budget, buckets = 1)
        .collect().map(r => r.getLong(0) -> ((s << 32) | r.getLong(2)))
    }.toMap

    val mem = MemoryStream[(Long, Long, Long)]
    val got = scala.collection.concurrent.TrieMap.empty[Long, Long]
    val stream = Streams.packByTokenBudgetStream(
      mem.toDF().toDF("shard", "doc_id", "n_tokens"), budget)
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => got.put(r.getLong(1), r.getLong(3)))
      }.start()
    try {
      // id-ordered feed split across three micro-batches
      rows.grouped(40).foreach { c =>
        mem.addData(c.toIndexedSeq); q.processAllAvailable()
      }
    } finally { q.stop(); q.awaitTermination() }

    assert(got.size === 120)
    assert(got.toMap === expected)
    // and every bin respects the budget (single-doc overflows aside)
    val binTotals = rows.map { case (_, id, n) => (got(id), n) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
    assert(binTotals.forall { case (_, t) => t <= budget },
      s"overfull bins: ${binTotals.filter(_._2 > budget)}")
  }

  test("streaming curation == batch curatedDocs; observed funnel counters") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.engine.Tables.load(spark, SparkFixture.sf, "documents")
      .select("doc_id", "source", "text")
    val rows = docs.orderBy("doc_id")
      .as[(Long, String, String)].collect()
    assert(rows.length > 10)
    val chunks = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq

    val root = Files.createTempDirectory("graft_curate_").toString
    val mem = MemoryStream[(Long, String, String)]
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val obsIn = Observe.StreamObserver.listen(spark, "curate_in")
    val obsQ = Observe.StreamObserver.listen(spark, "curate_q")
    val q = PipelineQueries.curateStream(spark,
      mem.toDF().toDF("doc_id", "source", "text"), s"$root/idx",
      out = (df: DataFrame, _: Long) =>
        df.collect().foreach(r => emitted.add(r.getLong(0))))
    try {
      chunks.foreach { c => mem.addData(c.toIndexedSeq); q.processAllAvailable() }
      val deadline = System.nanoTime() + 10e9.toLong
      while (obsIn.rows.size < chunks.size && System.nanoTime() < deadline)
        Thread.sleep(20)
    } finally { q.stop(); q.awaitTermination(); obsIn.stop(); obsQ.stop() }

    // accepted set == the batch funnel's accepted set
    val expected = PipelineQueries.curatedDocs(docs)
      .select("doc_id").as[Long].collect().toSet
    import scala.jdk.CollectionConverters._
    assert(emitted.asScala.toSet === expected)
    assert(expected.nonEmpty)

    // funnel counters: all docs arrived; gate survivors match the batch
    // quality column (dups included — the gate runs before dedup)
    val qualityPass = PipelineQueries.flagged(docs)
      .where(col("keep_q")).count()
    assert(obsIn.sumLong("n_in") === rows.length.toLong)
    assert(obsQ.sumLong("n_q") === qualityPass)
  }
}
