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
