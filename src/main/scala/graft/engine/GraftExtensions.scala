package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarity

/** Catalyst extension point for the graft engine: injects the native
  * expressions at session build time, so `cosine_similarity` resolves in
  * every context (SQL, views, thrift) without per-session registerAll.
  *
  * Usage: `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.engine.GraftExtensions`. This is
  * the Spark-native analogue of the reference's operator-table extension
  * (flink-table-planner-blink/.../FlinkSqlOperatorTable.java) — new
  * built-ins enter through the planner's function catalog, not UDF
  * wrappers, so they stay visible to the optimizer.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // SQL MATCH_RECOGNIZE surface (reference StreamExecMatch.java:90):
    // the parser rewrites `t MATCH_RECOGNIZE (...)` onto the graft NFA
    // and delegates everything else to the default parser
    ext.injectParser((_, delegate) =>
      new graft.cep.MatchRecognizeParser(delegate))
    // OPTIMIZE [ZORDER BY] / VACUUM maintenance statements for
    // manifested tables (GraftMaintenance)
    ext.injectParser((_, delegate) =>
      new GraftMaintenanceParser(delegate))
    // metadata-only aggregates over manifested scans: count/min/max from
    // the stats manifest, zero scan tasks (ManifestMetadataOnly gates)
    ext.injectOptimizerRule(_ => ManifestMetadataOnly)
    // SQL DML (DELETE/UPDATE/MERGE) over manifested tables → RowOps
    // commands; fires during resolution, before the v1-relation check
    ext.injectResolutionRule(spark => GraftDmlRule(spark))
    // graft TableCatalog seam: swap resolved graft.db.t relations onto
    // the pruned V1 scan (same attr ids), route catalog INSERT/CTAS
    // through the manifest-committing commands
    ext.injectResolutionRule(spark => GraftCatalogRule(spark))
    // VERSION AS OF / TIMESTAMP AS OF on manifested tables — must run
    // BEFORE the Resolution batch (ResolveRelations throws for v1 time
    // travel instead of leaving the node), hence the hint batch
    ext.injectHintResolutionRule(spark => GraftTimeTravelRule(spark))
    // row-level changefeed TVF: SELECT * FROM graft_changes('t', 1, 4)
    ext.injectTableFunction((
      FunctionIdentifier("graft_changes"),
      new ExpressionInfo(GraftTimeTravel.getClass.getName,
        "graft_changes"),
      (args: Seq[Expression]) => GraftTimeTravel.changesTvf(args)))
    // file-level observability TVF: SELECT * FROM graft_files('t')
    ext.injectTableFunction((
      FunctionIdentifier("graft_files"),
      new ExpressionInfo(GraftTimeTravel.getClass.getName,
        "graft_files"),
      (args: Seq[Expression]) => GraftTimeTravel.filesTvf(args)))
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_similarity"),
      (children: Seq[Expression]) =>
        CosineSimilarity(children.head, children(1))))
  }
}
