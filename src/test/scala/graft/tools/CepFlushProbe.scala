package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.cep.Cep
import graft.engine.GraftSession

/** Dev probe: event-time horizon flush in the streaming NFA. */
object CepFlushProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "secs", "event_id", "event_type")
      .select(col("user_id"), col("secs").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
      .withWatermark("ts", "0 seconds")
    val steps = Seq(
      Cep.Step("A", (r: org.apache.spark.sql.Row) => r.getString(3) == "signup"),
      Cep.Step("B", (r: org.apache.spark.sql.Row) => r.getString(3) == "error", Cep.Plus))
    val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id", steps,
        withinMicros = Some(60L * 1000000L), flushOnHorizon = true)
      .writeStream.format("memory").queryName("t_probe")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData((1L, 100L, 1L, "signup"), (1L, 110L, 2L, "error"))
    q.processAllAvailable()
    println(s"[probe] after batch1: ${spark.table("t_probe").count()} rows")
    mem.addData((2L, 500L, 10L, "view"))
    q.processAllAvailable()
    println(s"[probe] after batch2: ${spark.table("t_probe").count()} rows")
    mem.addData((3L, 1000L, 20L, "view"))
    q.processAllAvailable()
    println(s"[probe] after batch3: ${spark.table("t_probe").count()} rows")
    spark.table("t_probe").show()
    println(q.lastProgress)
    q.stop()
    spark.stop()
  }
}
