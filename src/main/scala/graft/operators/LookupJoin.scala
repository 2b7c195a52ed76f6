package graft.operators

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}

/** Lookup join against an external key-value system (reference
  * CommonExecLookupJoin.java:138 + AsyncLookupJoinRunner.java:44):
  * each probe row fetches its dimension value by key at processing
  * time — the pattern for dimension tables too large or too hot to
  * snapshot-broadcast.
  *
  * Spark-side shape: `mapPartitions`, so one client per partition (the
  * reference's per-task `LookupFunction` open/close lifecycle), with
  *   - BATCHING: keys accumulate to `batchSize` before one round trip
  *     (the reference's async batch window);
  *   - an LRU CACHE per partition (the reference's
  *     `LookupCacheManager`) — hot keys skip the round trip entirely;
  *   - DOUBLE-BUFFERED PREFETCH (`prefetch = true`): while batch N's
  *     rows stream out, batch N+1's lookup is already in flight on a
  *     background thread — the bounded-in-flight essence of the
  *     reference's AsyncWaitOperator without unordered-emit complexity.
  *
  * At 100 TB the probe side stays fully distributed (no shuffle is
  * added at all — lookups ride the existing partitioning) and the
  * external store carries the point-read load; cache capacity and
  * batch size are the backpressure knobs. For a small, cold dimension,
  * prefer a broadcast snapshot join (see `q_agg_having`) — this
  * operator is for stores that can't be materialized.
  *
  * STALENESS CONTRACT (processing-time semantics, like the reference's
  * async lookup — AsyncLookupJoinRunner.java:44 with
  * LookupCacheManager): the value joined to a probe row is whatever the
  * store returned for that key's MOST RECENT fetch within the current
  * task. Bounds: with caching on, a key is fetched at most once per
  * task, so a joined value is never older than the first appearance of
  * its key in the task — on a STREAMING probe side, where each
  * micro-batch runs fresh tasks, that means staleness is bounded by the
  * micro-batch interval (capacity evictions only tighten it). With
  * `cacheCapacity = 0` every batch of `batchSize` rows re-queries —
  * freshness = one round trip, the reference's cache-off mode. There is
  * NO event-time versioning: two probe rows with different timestamps
  * in the same task may observe the same dimension version (and a row
  * processed twice under task retry may observe a newer one — lookups
  * are read-only, so retries stay safe). For time-versioned semantics
  * use the temporal/as-of join (`Ops.asofJoin`), which joins each row
  * to the dimension version at its OWN event time from a changelog.
  * Pinned by LookupJoinSpec ("staleness contract").
  */
object LookupJoin {

  /** A batched point-lookup client. Implementations must be
    * serializable (constructed on the driver, opened per partition).
    * `lookup` returns values ALIGNED to `valueSchema` for each found
    * key; absent keys are simply missing from the result map.
    * `close()` runs once per task when the partition completes (or is
    * abandoned by a LIMIT/failure) — release connections there. */
  trait LookupClient extends Serializable {
    def lookup(keys: Seq[Long]): Map[Long, Seq[Any]]
    def close(): Unit = ()
  }

  /** Left/inner lookup join: for each row of `df`, fetch
    * `valueSchema`-shaped columns by `keyCol` from `client`.
    * `joinType` = "left" (miss → nulls) or "inner" (miss → dropped).
    * Output schema = df.schema ++ valueSchema. */
  def lookupJoin(df: DataFrame, keyCol: String, client: LookupClient,
      valueSchema: StructType, joinType: String = "left",
      batchSize: Int = 1024, cacheCapacity: Int = 100000,
      prefetch: Boolean = true): DataFrame = {
    require(joinType == "left" || joinType == "inner",
      s"lookupJoin supports left|inner, got $joinType")
    require(batchSize >= 1 && cacheCapacity >= 0)
    val keyIdx = df.schema.fieldNames.indexOf(keyCol)
    require(keyIdx >= 0, s"no column $keyCol in ${df.columns.mkString(",")}")
    val outSchema = StructType(df.schema.fields ++ valueSchema.fields)
    val nVals = valueSchema.length
    val inner = joinType == "inner"
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)

    df.mapPartitions { it =>
      // LRU over key → Option[values]: negative results are cached too
      // (a missing dimension row is as hot as a present one)
      val cache = new java.util.LinkedHashMap[Long, Option[Seq[Any]]](
        16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[Long, Option[Seq[Any]]]): Boolean =
          size() > cacheCapacity
      }
      val exec =
        if (prefetch)
          java.util.concurrent.Executors.newSingleThreadExecutor(r => {
            val t = new Thread(r, "graft-lookup-prefetch")
            t.setDaemon(true) // never pin the JVM
            t
          })
        else null
      // a LIMIT / failure can abandon the iterator before it drains —
      // tie the pool's and the client's lifetime to the task, not to
      // full consumption
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ =>
          if (exec != null) exec.shutdownNow()
          // best-effort: an abandoned task may close while a prefetch
          // round trip is still in flight — a close-time error must not
          // fail the (already finished) task
          try client.close() catch { case _: Exception => }
        })

      def resolve(batch: Array[Row]): Iterator[Row] = {
        // per-batch resolution map: cache hits + one round trip for the
        // rest (the cache may evict immediately at capacity 0, so batch
        // emission never reads back through it)
        val resolved = scala.collection.mutable.LongMap
          .empty[Option[Seq[Any]]]
        val distinct = batch.map(_.getLong(keyIdx)).distinct
        val misses = distinct.filter { k =>
          val hit = cache.get(k)
          if (hit != null) { resolved(k) = hit; false } else true
        }
        if (misses.nonEmpty) {
          val found = client.lookup(misses.toSeq)
          misses.foreach { k =>
            val v = found.get(k)
            resolved(k) = v
            cache.put(k, v)
          }
        }
        batch.iterator.flatMap { r =>
          resolved(r.getLong(keyIdx)) match {
            case Some(vals) =>
              Iterator.single(Row.fromSeq(r.toSeq ++ vals))
            case None if inner => Iterator.empty
            case None =>
              Iterator.single(Row.fromSeq(
                r.toSeq ++ Seq.fill[Any](nVals)(null)))
          }
        }
      }

      val batches = it.grouped(batchSize).map(_.toArray)
      val out: Iterator[Row] =
        if (!prefetch) batches.flatMap(resolve)
        else new Iterator[Row] {
          // double buffering: submit batch N+1 before draining batch N
          private var inFlight: java.util.concurrent.Future[Iterator[Row]] =
            if (batches.hasNext) {
              val b = batches.next()
              exec.submit(() => resolve(b))
            } else null
          private var current: Iterator[Row] = Iterator.empty
          private def advance(): Unit = {
            while (!current.hasNext && inFlight != null) {
              current = inFlight.get()
              inFlight =
                if (batches.hasNext) {
                  val b = batches.next()
                  exec.submit(() => resolve(b))
                } else null
            }
            if (!current.hasNext && inFlight == null && exec != null)
              exec.shutdown()
          }
          override def hasNext: Boolean = { advance(); current.hasNext }
          override def next(): Row = { advance(); current.next() }
        }
      out
    }
  }

  /** A LookupClient over a driver-held map — the unit-test harness
    * client (deterministic, latency-injectable, no store to stand up).
    * The oracle-checked catalog entry uses [[JdbcLookupClient]] against
    * file-backed Derby on EVERY deployment since round 7; this class
    * remains for specs that test the batching/cache/prefetch machinery
    * in isolation. The map is captured in the task closure (broadcast
    * by Spark with the task). */
  final class MapLookupClient(table: Map[Long, Seq[Any]],
      latencyMs: Long = 0L) extends LookupClient {
    override def lookup(keys: Seq[Long]): Map[Long, Seq[Any]] = {
      if (latencyMs > 0) Thread.sleep(latencyMs)
      keys.iterator.flatMap(k => table.get(k).map(k -> _)).toMap
    }
  }

  /** A real JDBC point-lookup client (reference
    * JdbcRowDataLookupFunction — flink-connector-jdbc's lookup path):
    * one connection per task, opened lazily on the first batch and
    * closed by the task-completion hook; each batch becomes ONE
    * `WHERE key IN (?,…)` round trip (chunked to `inClauseLimit` to
    * respect statement parameter caps). Column types must align with
    * the `valueSchema` passed to [[lookupJoin]] (`getObject` returns
    * the driver's boxed mapping — BIGINT→Long, INTEGER→Integer,
    * VARCHAR→String). Identifiers are ANSI double-quoted and
    * interpolated — pass trusted case-exact names, not user input
    * (Spark's JDBC writer creates quoted case-sensitive columns, so
    * names here must match what the writer emitted). Tested against
    * embedded Derby (in-process, zero egress); any JDBC url with its
    * driver on the executor classpath works the same. */
  final class JdbcLookupClient(url: String, table: String,
      keyCol: String, valueCols: Seq[String], inClauseLimit: Int = 256)
      extends LookupClient {
    require(valueCols.nonEmpty, "JdbcLookupClient needs value columns")
    // lifecycle is cross-thread: lookups may run on the prefetch thread
    // while close() fires on the task thread (completion listener after
    // an abandoning LIMIT). The lock + closed flag stop a racing lookup
    // from re-opening a connection AFTER the only close hook has fired
    // (which would leak it for the JVM lifetime).
    @transient private var conn: java.sql.Connection = _
    @transient private var closed: Boolean = false
    private def connection(): java.sql.Connection = synchronized {
      require(!closed, "JdbcLookupClient is closed (task completed)")
      if (conn == null) conn = java.sql.DriverManager.getConnection(url)
      conn
    }
    private def q(id: String): String = "\"" + id + "\""
    override def lookup(keys: Seq[Long]): Map[Long, Seq[Any]] = {
      if (keys.isEmpty) return Map.empty
      val out = Map.newBuilder[Long, Seq[Any]]
      keys.grouped(inClauseLimit).foreach { chunk =>
        val ph = Seq.fill(chunk.size)("?").mkString(",")
        val ps = connection().prepareStatement(
          s"SELECT ${q(keyCol)}, ${valueCols.map(q).mkString(", ")} " +
            s"FROM ${q(table)} WHERE ${q(keyCol)} IN ($ph)")
        try {
          chunk.zipWithIndex.foreach { case (k, i) => ps.setLong(i + 1, k) }
          val rs = ps.executeQuery()
          try while (rs.next()) out += rs.getLong(1) ->
            valueCols.indices.map(i => rs.getObject(i + 2))
          finally rs.close()
        } finally ps.close()
      }
      out.result()
    }
    override def close(): Unit = synchronized {
      closed = true
      if (conn != null) { conn.close(); conn = null }
    }
  }
}
