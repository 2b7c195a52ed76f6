package graft.engine

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException,
  NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.StatsManifest

/** A real DSv2 `TableCatalog` for manifested tables — names become
  * first-class:
  *
  * {{{
  *   CREATE TABLE graft.db.t (k BIGINT, m BIGINT)
  *     TBLPROPERTIES (statsCols 'k', bloomCols 'digest')
  *   CREATE TABLE graft.db.t2 PARTITIONED BY (p) AS SELECT …
  *   INSERT INTO graft.db.t …        -- manifest-committing append
  *   DELETE FROM graft.db.t WHERE …  -- the whole DML matrix
  *   SELECT * FROM graft.db.t VERSION AS OF 3      -- catalog-native
  *   ALTER TABLE graft.db.t ADD COLUMNS (x INT)    -- metadata-only
  *   DROP TABLE graft.db.t           -- removes data + manifest
  * }}}
  *
  * Layout: `warehouse/<namespace>/<table>` — each table dir IS the
  * manifested table; the manifest (versions, schema sidecar, stats,
  * `_table.props`) is the authoritative metadata, so there is no second
  * metastore to drift from the data (the catalog is a NAMING layer, the
  * way the reference's catalog API is a naming layer over connector
  * factories — `flink-table-common/…/catalog/Catalog.java`).
  *
  * Reads and DML do NOT go through a from-scratch DSv2 scan: the
  * resolution rule [[GraftCatalogRule]] swaps a resolved
  * `DataSourceV2Relation(GraftTable)` for the existing pruned V1 scan
  * (`HadoopFsRelation` + `ManifestFileIndex`), PRESERVING the relation's
  * output attribute ids — one read path, one DML path
  * ([[GraftDmlRule]]), one metadata-only-aggregate rule, for both
  * `USING graft-manifest` session-catalog tables and `graft.*` names.
  * Streaming reads stay native DSv2: `spark.readStream.table("graft.db.t")`
  * serves the version-offset micro-batch stream.
  *
  * Register with
  * `spark.sql.catalog.graft = graft.engine.GraftCatalog` (+ optional
  * `spark.sql.catalog.graft.warehouse = <dir>`) — [[GraftSession]] does. */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = "graft"
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      SparkSession.active.sessionState.conf.warehousePath
        .stripSuffix("/") + s"/$name")
  }
  override def name(): String = catalogName

  private def spark = SparkSession.active
  private def hconf = spark.sparkContext.hadoopConfiguration
  private def fs = new Path(warehouse).getFileSystem(hconf)

  private def nsDir(ns: Array[String]): Path = {
    require(ns.length == 1,
      s"graft catalog: one-level namespaces only, got ${ns.mkString(".")}")
    new Path(warehouse, ns.head)
  }
  private[engine] def tableDir(ident: Identifier): String =
    new Path(nsDir(ident.namespace), ident.name).toString

  private def isTableDir(p: Path): Boolean =
    fs.exists(new Path(p, "_graft_manifest"))

  // ---------------------------------------------------------------- //
  //  Namespaces                                                       //
  // ---------------------------------------------------------------- //

  override def defaultNamespace(): Array[String] = Array("default")

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    val listed =
      if (!fs.exists(root)) Array.empty[Array[String]]
      else fs.listStatus(root).filter(_.isDirectory)
        .map(st => Array(st.getPath.getName))
    if (listed.exists(_.head == "default")) listed
    else listed :+ Array("default") // implicit, like a default database
  }
  override def listNamespaces(
      namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(name() +: namespace.toSeq)
    Array.empty // one level deep
  }
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 &&
      (namespace.head == "default" || fs.exists(nsDir(namespace)))
  override def loadNamespaceMetadata(
      namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(name() +: namespace.toSeq)
    Map("location" -> nsDir(namespace).toString).asJava
  }
  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    fs.mkdirs(nsDir(namespace))
    ()
  }
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: ALTER NAMESPACE is not supported")
  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val d = nsDir(namespace)
    if (!fs.exists(d)) return false
    if (!cascade && fs.listStatus(d).nonEmpty)
      throw new IllegalStateException(
        s"graft catalog: namespace ${namespace.head} is not empty " +
          "(use CASCADE)")
    fs.delete(d, true)
  }

  // ---------------------------------------------------------------- //
  //  Tables                                                           //
  // ---------------------------------------------------------------- //

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(name() +: namespace.toSeq)
    val d = nsDir(namespace)
    if (!fs.exists(d)) return Array.empty
    fs.listStatus(d).filter(st => st.isDirectory && isTableDir(st.getPath))
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.length == 1 && isTableDir(new Path(tableDir(ident)))

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    GraftTable(s"$catalogName.${ident.namespace.head}.${ident.name}",
      tableDir(ident), None)
  }

  /** `VERSION AS OF <v>` — catalog-native time travel (the analyzer
    * calls this overload for versioned reads of v2 catalog tables). */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val v =
      try version.toLong
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"graft catalog: VERSION AS OF wants a version number, " +
              s"got '$version'")
      }
    GraftTable(s"$catalogName.${ident.namespace.head}.${ident.name}",
      tableDir(ident), Some(v))
  }

  /** `TIMESTAMP AS OF <ts>` — `timestamp` arrives in MICROseconds;
    * resolves to the newest version committed at or before it, the same
    * rule as every other time-travel surface. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDir(ident)
    val v = StatsManifest.versionAtMillis(spark, dir,
      Math.floorDiv(timestamp, 1000L), s"timestamp micros=$timestamp")
    GraftTable(s"$catalogName.${ident.namespace.head}.${ident.name}",
      dir, Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val props = properties.asScala.toMap
    val dir = tableDir(ident)
    fs.mkdirs(nsDir(ident.namespace))
    val partCols = partitions.toSeq.map(GraftCatalog.identityCol)
    val (statsCols, bloomCols) = GraftCatalog.statsConfig(schema, props)
    StatsManifest.createEmpty(spark, dir, schema, statsCols, bloomCols,
      partCols, extraProps = GraftCatalog.userProps(props))
    GraftTable(s"$catalogName.${ident.namespace.head}.${ident.name}",
      dir, None)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDir(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          "graft catalog: nested ADD COLUMN is not supported")
        graft.sources.RowOps.addColumn(spark, dir,
          add.fieldNames.head, add.dataType)
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1,
          "graft catalog: nested DROP COLUMN is not supported")
        graft.sources.RowOps.dropColumn(spark, dir, del.fieldNames.head)
      case rn: TableChange.RenameColumn =>
        require(rn.fieldNames.length == 1,
          "graft catalog: nested RENAME COLUMN is not supported")
        // metadata-only via column mapping — see RowOps.renameColumn
        graft.sources.RowOps.renameColumn(spark, dir,
          rn.fieldNames.head, rn.newName)
      case ut: TableChange.UpdateColumnType =>
        require(ut.fieldNames.length == 1,
          "graft catalog: nested ALTER COLUMN TYPE is not supported")
        // metadata-only widening (int-family up, float -> double)
        graft.sources.RowOps.widenColumn(spark, dir,
          ut.fieldNames.head, ut.newDataType)
      case sp: TableChange.SetProperty =>
        // policy properties (autoCompact.*, retention.*, manifest.*)
        // round-trip through the sidecar; layout keys are the table's
        // physical identity and refuse to change after create
        require(!GraftCatalog.ReservedProps.contains(sp.property),
          s"graft catalog: table property '${sp.property}' is fixed " +
            "at CREATE TABLE")
        // raw property writes would skip existing-data validation
        require(!sp.property.startsWith(
          graft.sources.Constraints.Prefix),
          "graft catalog: install CHECK constraints with ALTER TABLE " +
            "... ADD CONSTRAINT (existing rows must validate), not " +
            "raw TBLPROPERTIES")
        StatsManifest.writeTableProps(spark, dir,
          StatsManifest.tableProps(spark, dir) +
            (sp.property -> sp.value))
      case rp: TableChange.RemoveProperty =>
        require(!GraftCatalog.ReservedProps.contains(rp.property),
          s"graft catalog: table property '${rp.property}' is fixed " +
            "at CREATE TABLE")
        StatsManifest.writeTableProps(spark, dir,
          StatsManifest.tableProps(spark, dir) - rp.property)
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER TABLE change $other " +
          "(ADD COLUMNS / DROP COLUMN / RENAME COLUMN / widening " +
          "ALTER COLUMN TYPE / SET-UNSET TBLPROPERTIES are)")
    }
    spark.catalog.refreshByPath(dir)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    val dir = new Path(tableDir(ident))
    spark.catalog.refreshByPath(dir.toString)
    fs.delete(dir, true)
  }
  override def purgeTable(ident: Identifier): Boolean = dropTable(ident)

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent))
      throw new TableAlreadyExistsException(newIdent)
    fs.mkdirs(nsDir(newIdent.namespace))
    spark.catalog.refreshByPath(tableDir(oldIdent))
    require(fs.rename(new Path(tableDir(oldIdent)),
      new Path(tableDir(newIdent))),
      s"graft catalog: rename $oldIdent -> $newIdent failed")
  }

  override def invalidateTable(ident: Identifier): Unit =
    spark.catalog.refreshByPath(tableDir(ident))
}

private[graft] object GraftCatalog {
  /** The column behind an identity PARTITIONED BY transform — the only
    * partitioning shape a Hive-layout table dir can realize. */
  def identityCol(t: Transform): String = {
    require(t.name == "identity" && t.references.length == 1 &&
      t.references.head.fieldNames.length == 1,
      "graft catalog: only identity PARTITIONED BY columns are " +
        s"supported, got $t")
    t.references.head.fieldNames.head
  }

  /** Layout keys the engine derives itself, plus the keys Spark
    * injects into every CREATE — everything else in TBLPROPERTIES is
    * a user property persisted to the `_table.props` sidecar (policy
    * keys like `autoCompact.minFiles` — StatsManifest.tablePolicy). */
  private[engine] val ReservedProps = Set("partitionCols", "statsCols",
    "bloomCols", "zorder", "numFiles", "provider", "location", "owner",
    "comment", "external")

  private[engine] def userProps(
      props: Map[String, String]): Map[String, String] =
    props.filterNot { case (k, _) =>
      ReservedProps.contains(k) || k.startsWith("option.") }

  /** (statsCols, bloomCols) for a new table: `statsCols`/`bloomCols`
    * TBLPROPERTIES when given, else stats on every column with an
    * order-exact domain — pruning-ready by default. */
  def statsConfig(schema: StructType,
      props: Map[String, String]): (Seq[String], Seq[String]) = {
    def split(k: String): Seq[String] = props.get(k)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val stats = split("statsCols") match {
      case Nil => StatsManifest.statsEligible(schema)
      case s => s
    }
    (stats, split("bloomCols"))
  }
}

/** The catalog's Table handle. Batch reads never build a DSv2 scan from
  * this (see [[GraftCatalogRule]]); streaming reads serve the
  * version-offset micro-batch stream. */
private[graft] final case class GraftTable(tableName: String, dir: String,
    timeTravelVersion: Option[Long]) extends Table with SupportsRead {
  private def spark = SparkSession.active
  override def name(): String = tableName
  override lazy val schema: StructType = timeTravelVersion match {
    case Some(v) => StatsManifest.scanAtVersion(spark, dir, v)._1.schema
    case None => StatsManifest.scanWithIndex(spark, dir)._1.schema
  }
  override def partitioning(): Array[Transform] =
    StatsManifest.tablePartitionCols(spark, dir)
      .map(n => org.apache.spark.sql.connector.expressions.Expressions
        .identity(n)).toArray
  override def properties(): JMap[String, String] =
    (StatsManifest.tableProps(spark, dir) ++
      Map("provider" -> "graft-manifest", "location" -> dir)).asJava
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    require(timeTravelVersion.isEmpty,
      "graft catalog: streaming from a time-travel snapshot is not " +
        "supported — use startingVersion")
    graft.sources.ManifestStreamSource.streamScanBuilder(schema, dir,
      options)
  }
}
