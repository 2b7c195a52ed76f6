package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister,
  RelationProvider}

/** `spark.read.format(...)` facade over [[StatsManifest.scan]], so the
  * manifest-pruned read path is reachable from the generic source API
  * and SQL DDL — not just the Scala helper:
  *
  * {{{
  *   spark.read.format("graft-manifest").load(dir)
  *   // or: CREATE TABLE t USING `graft-manifest` OPTIONS (path '<dir>')
  * }}}
  *
  * The relation is the same `HadoopFsRelation` + `ManifestFileIndex`
  * pair `scan` builds — FileSourceStrategy hands it the pushed data
  * filters at planning time and files the stats refute never become
  * tasks. Reference analogue: the pluggable-source registration surface
  * (`flink-table-common/.../factories/DynamicTableSourceFactory.java`),
  * where a factory id in DDL resolves to the connector. */
final class ManifestSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-manifest"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-manifest: 'path' option required"))
    val (df, _) = StatsManifest.scanWithIndex(sqlContext.sparkSession, path)
    df.queryExecution.logical
      .collectFirst {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation
      }
      .getOrElse(throw new IllegalStateException(
        "graft-manifest: scan did not produce a file relation"))
  }
}
