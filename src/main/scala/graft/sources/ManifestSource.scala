package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.sources.{BaseRelation,
  CreatableRelationProvider, DataSourceRegister, RelationProvider}

/** `spark.read.format(...)` / `df.write.format(...)` facade over the
  * stats-manifest table layout, so the pruned read path AND the
  * manifest-maintaining write path are reachable from the generic
  * source API and SQL DDL — not just the Scala helpers:
  *
  * {{{
  *   spark.read.format("graft-manifest").load(dir)
  *   df.write.format("graft-manifest")
  *     .option("zorderBy", "a,b")      // optional: cluster on write
  *     .option("statsCols", "a,b,c")   // default: zorderBy
  *     .option("bloomCols", "digest")  // optional: equality blooms
  *     .option("numFiles", "64")       // with zorderBy
  *     .mode("overwrite").save(dir)    // or append → incremental update
  *   // or: CREATE TABLE t USING `graft-manifest` OPTIONS (path '<dir>')
  * }}}
  *
  * The read relation is the same `HadoopFsRelation` + `ManifestFileIndex`
  * pair `StatsManifest.scan` builds — FileSourceStrategy hands it the
  * pushed data filters at planning time and files the stats refute never
  * become tasks. Writes land as plain parquet plus a VERSIONED manifest
  * commit: `overwrite` rewrites the directory (z-ordered when `zorderBy`
  * is given) and computes fresh stats; `append` adds files and
  * reconciles the manifest INCREMENTALLY (only the new files scan).
  * Reference analogue: the pluggable-source registration surface
  * (`flink-table-common/.../factories/DynamicTableSourceFactory.java` +
  * `DynamicTableSinkFactory.java`), where a factory id in DDL resolves
  * to both halves of a connector. */
final class ManifestSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-manifest"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-manifest: 'path' option required"))
    // time travel from the generic API / SQL DDL:
    //   spark.read.format("graft-manifest").option("version", "3")
    //   CREATE TABLE t_asof USING `graft-manifest`
    //     OPTIONS (path '<dir>', version '3')
    // CDC from the generic API: the row-level changefeed over
    // (changesFrom, changesTo] — table columns + _change_type +
    // _commit_version (see RowOps.changes):
    //   .option("changesFrom", "1").option("changesTo", "4")
    val sqlContext0 = sqlContext
    (parameters.get("changesFrom"), parameters.get("changesTo")) match {
      case (Some(a), b) =>
        val spark = sqlContext.sparkSession
        val to = b.map(_.toLong).getOrElse(
          StatsManifest.versions(spark, path).last)
        val cdc = RowOps.changes(spark, path, a.toLong, to)
        return new BaseRelation
          with org.apache.spark.sql.sources.TableScan {
          override def sqlContext: SQLContext = sqlContext0
          override def schema = cdc.schema
          override def buildScan(): org.apache.spark.rdd.RDD[
            org.apache.spark.sql.Row] = cdc.rdd
        }
      case _ =>
    }
    // `timestampAsOf` resolves to the newest commit at or before the
    // timestamp — the reader-option twin of SQL `TIMESTAMP AS OF`,
    // sharing its Catalyst Cast parse (session time zone, all offset
    // forms) so the two surfaces can never resolve differently.
    val version: Option[Long] = parameters.get("version").map(_.toLong)
      .orElse(parameters.get("timestampAsOf").map { ts =>
        val spark = sqlContext.sparkSession
        StatsManifest.versionAtMillis(spark, path,
          StatsManifest.parseTsMillis(spark, ts), ts)
      })
    val (df, _) = version match {
      case Some(v) =>
        StatsManifest.scanAtVersion(sqlContext.sparkSession, path, v)
      case None =>
        StatsManifest.scanWithIndex(sqlContext.sparkSession, path)
    }
    df.queryExecution.logical
      .collectFirst {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation
      }
      .getOrElse(throw new IllegalStateException(
        "graft-manifest: scan did not produce a file relation"))
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-manifest: 'path' option required"))
    def cols(k: String): Seq[String] = parameters.get(k)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val zorderBy = cols("zorderBy")
    val statsCols = {
      val s = cols("statsCols")
      if (s.nonEmpty) s else zorderBy
    }
    val bloomCols = cols("bloomCols")
    require(statsCols.nonEmpty || bloomCols.nonEmpty,
      "graft-manifest write: set at least one of zorderBy / statsCols / " +
        "bloomCols — a manifested table needs columns to keep stats for")
    def writeOverwrite(): Unit = {
      val out =
        if (zorderBy.nonEmpty) {
          val n = parameters.get("numFiles").map(_.toInt)
            .getOrElse(data.rdd.getNumPartitions.max(1))
          graft.operators.Layout.zorder(data, zorderBy, n)
        } else data
      out.write.mode(SaveMode.Overwrite).parquet(path)
      StatsManifest.write(spark, path, statsCols, bloomCols)
    }
    mode match {
      case SaveMode.Overwrite => writeOverwrite()
      // CTAS arrives as ErrorIfExists: create when absent, refuse to
      // clobber an existing manifested table — or ANY pre-existing
      // content (writeOverwrite would silently wipe a directory of
      // plain parquet, violating the ErrorIfExists contract)
      case SaveMode.ErrorIfExists =>
        require(StatsManifest.versions(spark, path).isEmpty,
          s"graft-manifest: a manifested table already exists at $path")
        val p = new org.apache.hadoop.fs.Path(path)
        val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        require(!fsys.exists(p) || fsys.listStatus(p).isEmpty,
          s"graft-manifest: $path already exists and is not empty " +
            "(not a manifested table — refusing to overwrite it; " +
            "use mode overwrite to replace the contents)")
        writeOverwrite()
      case SaveMode.Ignore =>
        if (StatsManifest.versions(spark, path).isEmpty) writeOverwrite()
      case SaveMode.Append =>
        // appends never re-cluster (that is Layout.optimize's job) and
        // never rescan the table: only the new files get stats.
        // CHECK constraints validate inline in the write job (r13)
        Constraints.enforce(spark, path, data)
          .write.mode(SaveMode.Append).parquet(path)
        StatsManifest.update(spark, path, statsCols,
          bloomCols = bloomCols)
      case other =>
        throw new UnsupportedOperationException(
          s"graft-manifest write: SaveMode $other not supported " +
            "(use overwrite or append)")
    }
    createRelation(sqlContext, parameters)
  }
}
