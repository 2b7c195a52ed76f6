package graft.engine

import org.apache.spark.sql.{GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier
import org.apache.spark.sql.catalyst.expressions.{AttributeReference,
  Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.StatsManifest

/** The seam between the graft [[GraftCatalog]] (DSv2 naming layer) and
  * the engine's ONE read/write path:
  *
  *  - a resolved `DataSourceV2Relation(GraftTable)` becomes the pruned
  *    V1 scan (`HadoopFsRelation` + `ManifestFileIndex`) with the SAME
  *    output attribute ids, so parents' references survive and every
  *    downstream piece — [[GraftDmlRule]] DML, metadata-only
  *    aggregates, snapshot reads — works identically for `graft.db.t`
  *    and path/session-catalog tables. This is the same conversion
  *    shape Spark itself uses for Hive relations
  *    (`RelationConversions` keeps output attrs while swapping the
  *    relation).
  *  - `INSERT INTO graft.db.t` arrives as `AppendData` (the built-in
  *    ResolveInsertInto converts before extension rules run) and
  *    becomes the manifest-committing [[GraftDml.GraftInsertCommand]];
  *    `INSERT OVERWRITE` arrives as `OverwriteByExpression`.
  *  - `CREATE TABLE graft.db.t [PARTITIONED BY (…)] AS SELECT` becomes
  *    [[GraftCatalogRule.GraftCtasCommand]]: data lands (partitioned,
  *    optionally z-ordered via TBLPROPERTIES) and the manifest + table
  *    props commit in one command. */
final case class GraftCatalogRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def graftTable(plan: LogicalPlan): Option[GraftTable] =
    plan match {
      case SubqueryAlias(_, child) => graftTable(child)
      case r: DataSourceV2Relation => r.table match {
        case t: GraftTable => Some(t)
        case _ => None
      }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      // write commands first: their table field is not a child, so the
      // relation swap below never rewrites inside them
      case a: AppendData if graftTable(a.table).isDefined && a.resolved =>
        val t = graftTable(a.table).get
        // ResolveOutputRelation already aligned the query to the table
        // schema positionally (casts + reorder) — byName = false
        GraftDml.GraftInsertCommand(t.dir, a.query, overwrite = false,
          userCols = Nil, byName = false, table = Some(t.tableName))

      case o: OverwriteByExpression
          if graftTable(o.table).isDefined && o.resolved =>
        val t = graftTable(o.table).get
        o.deleteExpr match {
          case Literal(true, _) =>
            GraftDml.GraftInsertCommand(t.dir, o.query, overwrite = true,
              userCols = Nil, byName = false, table = Some(t.tableName))
          case expr =>
            // r12: a static PARTITION spec (or any delete expression)
            // lowers to delete-matching + append under ONE commit
            GraftDml.GraftOverwriteWhereCommand(t.dir, o.query,
              GraftDml.Held(expr), Some(t.tableName))
        }

      // r13: dynamic-partition overwrite (partitionOverwriteMode=
      // dynamic, or PARTITION (p) with no value) — replace exactly
      // the partitions present in the query, one 'replace' commit
      case o: OverwritePartitionsDynamic
          if graftTable(o.table).isDefined && o.resolved =>
        val t = graftTable(o.table).get
        GraftDml.GraftDynamicOverwriteCommand(t.dir, o.query,
          Some(t.tableName))

      case ctas: CreateTableAsSelect if ctas.query.resolved =>
        ctas.name match {
          case ResolvedIdentifier(catalog: GraftCatalog, ident) =>
            val partCols = ctas.partitioning.map(GraftCatalog.identityCol)
            val props = ctas.tableSpec match {
              case ts: TableSpec => ts.properties
              case _ => Map.empty[String, String]
            }
            GraftCtasCommand(catalog, ident.namespace, ident.name,
              ctas.query, partCols, props, ctas.ignoreIfExists)
          case _ => ctas
        }

      // streaming CDC read by NAME: the relation's output was fixed
      // from the table schema at resolution, but a readChangeFeed scan
      // emits the CDC envelope — widen the relation's output so the
      // plan and the stream agree (the scan itself comes from
      // GraftTable.newScanBuilder, which routes on the same option)
      case r: org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
          if r.table.isInstanceOf[GraftTable] &&
            r.extraOptions.getBoolean("readChangeFeed", false) &&
            !r.output.exists(_.name == "_change_type") =>
        val full = r.table.asInstanceOf[GraftTable].schema
        // pushColumns projects the table columns (envelope always
        // rides) — mirror the scan's own output or the plan disagrees
        val proj = Option(r.extraOptions.get("pushColumns")) match {
          case Some(cs) =>
            val names = cs.split(",").map(_.trim).filter(_.nonEmpty)
            org.apache.spark.sql.types.StructType(
              full.filter(f => names.contains(f.name)))
          case None => full
        }
        val cdc = graft.sources.RowOps.cdcSchema(proj)
        r.copy(output = org.apache.spark.sql.catalyst.types.DataTypeUtils
          .toAttributes(cdc).map(_.asInstanceOf[AttributeReference]))

      // read path: swap to the manifest-pruned V1 scan, keeping the
      // exact output attribute ids
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        val t = r.table.asInstanceOf[GraftTable]
        val (df, _) = t.timeTravelVersion match {
          case Some(v) => StatsManifest.scanAtVersion(spark, t.dir, v)
          case None => StatsManifest.scanWithIndex(spark, t.dir)
        }
        val lr = df.queryExecution.logical.collectFirst {
          case l: LogicalRelation => l
        }.getOrElse(throw new IllegalStateException(
          s"graft catalog: scan of ${t.dir} produced no file relation"))
        require(lr.output.map(_.name) == r.output.map(_.name),
          s"graft catalog: schema of ${t.name} changed between " +
            s"resolution and scan (${r.output.map(_.name)} vs " +
            s"${lr.output.map(_.name)}) — retry the query")
        lr.copy(output = r.output.map(_.asInstanceOf[AttributeReference]))
    }
}

/** CTAS into the graft catalog: write the query result (partitioned,
  * optionally z-ordered via `zorder`/`numFiles` TBLPROPERTIES), then
  * commit the manifest and create-time table props — one command, so a
  * failure leaves either no table or a complete one (the manifest
  * commit is the publish point; stray data files without a manifest
  * are not a table). */
final case class GraftCtasCommand(catalog: GraftCatalog,
    namespace: Array[String], tableName: String, query: LogicalPlan,
    partCols: Seq[String], props: Map[String, String],
    ignoreIfExists: Boolean) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(namespace, tableName)
    if (catalog.tableExists(ident)) {
      if (ignoreIfExists) return Seq.empty
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    }
    val dir = catalog.tableDir(ident)
    val df = GraftSqlBridge.ofRows(spark, query)
    val missing = partCols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"graft CTAS: PARTITIONED BY columns not in the query output: " +
        missing.mkString(", "))
    val (statsCols, bloomCols) =
      GraftCatalog.statsConfig(df.schema, props)
    val zorderBy = props.get("zorder")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val clustered =
      if (zorderBy.isEmpty) df
      else graft.operators.Layout.zorder(df, zorderBy,
        props.get("numFiles").map(_.toInt)
          .getOrElse(df.rdd.getNumPartitions.max(1)))
    val writer0 = clustered.write.mode("errorifexists")
    val writer =
      if (partCols.isEmpty) writer0 else writer0.partitionBy(partCols: _*)
    writer.parquet(dir)
    StatsManifest.write(spark, dir, statsCols, bloomCols)
    StatsManifest.writeTableProps(spark, dir,
      GraftCatalog.userProps(props) ++ Map(
        "partitionCols" -> partCols.mkString(","),
        "statsCols" -> statsCols.mkString(","),
        "bloomCols" -> bloomCols.mkString(",")))
    Seq.empty
  }
}
