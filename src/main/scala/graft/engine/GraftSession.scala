package graft.engine

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Spark-native counterpart of the reference's `TableEnvironment` +
  * `StreamExecutionEnvironment` pair (reference:
  * flink-table/flink-table-api-java/.../internal/TableEnvironmentImpl.java:703;
  * flink-streaming-java/.../environment/StreamExecutionEnvironment.java:1831).
  * One SparkSession serves batch and streaming — Catalyst replaces the Blink
  * planner, Structured Streaming replaces the DataStream runtime.
  *
  * Scale notes: AQE on (runtime re-plan, skew-join splitting, SMJ->BHJ
  * conversion); shuffle partitions sized for the local harness via
  * SPARK_GRAFT_CPUS — on a real cluster this would be set to ~2-3x total
  * cores and AQE coalescing handles the rest.
  */
object GraftSession {

  def builder(master: Option[String] = None): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession
      .builder()
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_warehouse")
      // the graft TableCatalog: CREATE/DROP/ALTER/DML/time travel on
      // graft.db.t names, backed by manifested table dirs under the
      // warehouse (override per-deployment via
      // spark.sql.catalog.graft.warehouse)
      .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
      .config("spark.ui.enabled", "false")
    master.fold(b)(m => b.master(m))
  }

  /** Local session for tests/benchmarks. Task retries ON (`local[n, 2]`):
    * a real cluster retries failed tasks (spark.task.maxFailures=4), and
    * fault-tolerance tests (sink convergence under a mid-partition task
    * failure) need the scheduler to actually retry — plain `local[n]`
    * pins maxFailures=1 and turns every transient fault into a job
    * failure no production deployment would see. */
  def local(cores: Int = 0): SparkSession = {
    val n =
      if (cores > 0) cores.toString
      else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = builder(Some(s"local[$n, 2]"))
      .config("spark.sql.shuffle.partitions", n)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
