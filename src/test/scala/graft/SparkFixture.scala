package graft

import org.apache.spark.sql.SparkSession

import graft.engine.GraftSession

/** One shared local SparkSession for the whole ScalaTest run (forked JVM
  * exits at the end — never stopped mid-run so suites can share it). */
object SparkFixture {
  lazy val spark: SparkSession = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"
}
