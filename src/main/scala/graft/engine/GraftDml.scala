package graft.engine

import org.apache.spark.sql.{GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference,
  EqualTo, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

import graft.sources.{RowOps, StatsManifest}

/** SQL DML over manifested tables: the analyzer rule [[GraftDmlRule]]
  * (injected by [[GraftExtensions]]) recognizes Spark's parsed
  * `DELETE FROM` / `UPDATE` / `MERGE INTO` plans whose target resolves
  * to a graft-manifest relation (the scan's `FileIndex` is a
  * [[StatsManifest.ManifestFileIndex]]) and rewrites them into eager
  * commands backed by [[graft.sources.RowOps]] — so
  *
  * {{{
  *   spark.sql("DELETE FROM t WHERE k < 100")
  *   spark.sql("UPDATE t SET m = -1 WHERE k % 10 = 0")
  *   spark.sql("MERGE INTO t USING s ON t.k = s.k " +
  *     "WHEN MATCHED THEN UPDATE SET * " +
  *     "WHEN NOT MATCHED THEN INSERT *")
  *   spark.sql("MERGE INTO t USING s ON t.k = s.k " +
  *     "WHEN MATCHED THEN DELETE")
  * }}}
  *
  * run end-to-end with the manifest-pruned copy-on-write machinery
  * (tombstones, snapshots, CDC, vacuum) on a plain-parquet-backed
  * table. Without this rule the same statements fail Spark's v2-only
  * check — the rule fires during resolution, before CheckAnalysis.
  * The stats configuration is reconstructed from the manifest itself
  * ([[StatsManifest.manifestColumns]]); the commands refresh the
  * relation cache by path so subsequent reads of the catalog table see
  * the new version.
  *
  * Surface (round 10): full CRUD. `INSERT INTO` / `INSERT OVERWRITE`
  * (append = incremental manifest reconciliation; overwrite = rebuild),
  * `DELETE` / `UPDATE`, and the complete ANSI MERGE clause matrix —
  * conditional and multiple WHEN MATCHED UPDATE/DELETE (the exact
  * unconditional SET-star/INSERT-star shapes keep the narrower upsert
  * / delete-by-key fast paths), conditional multi-clause WHEN NOT
  * MATCHED INSERT, WHEN NOT MATCHED BY SOURCE UPDATE/DELETE.
  * Conditions and SET/VALUES expressions accept UNCORRELATED
  * subqueries, evaluated once at command run time ([[GraftDml
  * .evalSubqueries]]). DELETE/UPDATE WHERE conditions additionally
  * accept CORRELATED subqueries (EXISTS / NOT EXISTS / IN / NOT IN /
  * scalar compares referencing the target row), lowered onto the
  * distributed join machinery ([[GraftDml.GraftCorrelatedDmlCommand]]);
  * and (r12) MERGE clause conditions and SET/INSERT values accept
  * them too, lowered to per-distinct-refs lookups ([[MergeAuxSpec]])
  * the merge frames left-join — including (r13) correlated EXISTS in
  * a SET/INSERT VALUE (the condition hit-flag coalesced to false:
  * EXISTS is two-valued, so the lowering is exact). The one remaining
  * refusal: three-valued IN in a VALUE position (its UNKNOWN result
  * has no hit-flag form — rewrite as EXISTS), with a clear error.
  *
  * Reference analogue: DML statements enter the reference through the
  * planner's DDL/DML converter
  * (`flink-table-planner-blink/…/operations/SqlToOperationConverter.java`);
  * here the same surface rides Spark's own parser, with only the
  * target-resolution seam customized. */
object GraftDml {

  /** Resolved attrs → unresolved by name, so the condition re-resolves
    * against the fresh scan RowOps builds (resolved attribute ids are
    * plan-local and would not survive the crossing). `With`
    * common-expression nodes (Spark's BETWEEN/NULLIF parse shape) are
    * inlined first: held inside an opaque command field they escape the
    * analyzer's RewriteWithExpression, and a With with unresolved
    * children can't be rebuilt (its dataType comes from the def). */
  private def unresolve(e: Expression): Expression =
    inlineWith(e).transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    }

  private def inlineWith(e: Expression): Expression = e.transformUp {
    case w: org.apache.spark.sql.catalyst.expressions.With =>
      val defs = w.defs.map(d => d.id -> d.child).toMap
      w.child.transformUp {
        case r: org.apache.spark.sql.catalyst.expressions
            .CommonExpressionRef => defs(r.id)
      }
  }

  private[engine] def checkNoSubquery(e: Expression, stmt: String): Unit =
    require(!e.exists(_.isInstanceOf[PlanExpression[_]]),
      s"graft $stmt: subqueries in the condition are not supported")

  /** Defense-in-depth: positions whose correlated forms route through
    * the join/lookup lowerings ([[GraftCorrelatedDmlCommand]],
    * [[MergeAuxSpec]]) call this on the REMAINING expression — any
    * correlated subquery still present here slipped past a lowering
    * and would evaluate wrongly, so it fails loudly. */
  private[engine] def checkUncorrelated(e: Expression,
      stmt: String): Unit = e.foreach {
    case s: org.apache.spark.sql.catalyst.expressions
        .SubqueryExpression =>
      require(s.getOuterAttrs.isEmpty,
        s"graft $stmt: a correlated subquery in this position is not " +
          "supported — pre-join it into a source table")
    case _ => ()
  }

  /** Does the expression contain a CORRELATED subquery (one that
    * references the target row)? */
  private[engine] def hasCorrelated(e: Expression): Boolean = e.exists {
    case s: org.apache.spark.sql.catalyst.expressions
        .SubqueryExpression => s.getOuterAttrs.nonEmpty
    case _ => false
  }

  /** IN-subquery materialization cap: past this, the right tool is
    * MERGE … WHEN MATCHED THEN DELETE (deleteKeys — a distributed
    * semi-join), not an IN-list literal. */
  private[engine] val MaxInList = 100000

  /** Evaluate every (uncorrelated) subquery in a DELETE/UPDATE
    * condition ONCE, at command run time, against the current catalog
    * state: scalar → its value as a literal, `IN (SELECT …)` → an
    * IN-list (bounded by [[MaxInList]], loud past it), EXISTS → a
    * boolean literal. Runs BEFORE the unresolve crossing, while the
    * subquery plans are still resolved. */
  private[engine] def evalSubqueries(spark: SparkSession,
      e: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Exists, In,
      InSubquery, ListQuery, Literal, ScalarSubquery}
    e.transformUp {
      case s: ScalarSubquery =>
        val rows = GraftSqlBridge.ofRows(spark, s.plan).limit(2).collect()
        require(rows.length <= 1,
          "graft DML: scalar subquery returned more than one row")
        Literal.create(if (rows.isEmpty) null else rows.head.get(0),
          s.dataType)
      case InSubquery(values, q: ListQuery) =>
        require(values.length == 1 && q.plan.output.length == 1,
          "graft DML: multi-column IN subqueries are not supported")
        val rows = GraftSqlBridge.ofRows(spark, q.plan)
          .limit(MaxInList + 1).collect()
        require(rows.length <= MaxInList,
          s"graft DML: IN-subquery materialized more than $MaxInList " +
            "rows — use MERGE … WHEN MATCHED THEN DELETE (a " +
            "distributed semi-join) for large key sets")
        val dt = q.plan.output.head.dataType
        In(values.head,
          rows.map(r => Literal.create(r.get(0), dt)).toIndexedSeq)
      case ex: Exists =>
        Literal(GraftSqlBridge.ofRows(spark, ex.plan)
          .limit(1).collect().nonEmpty)
    }
  }

  private def cond(e: Expression): org.apache.spark.sql.Column =
    GraftSqlBridge.column(unresolve(e))

  /** The manifested-table directory (and catalog identifier, for the
    * post-DML relation-cache refresh) behind a resolved DML target, if
    * the target is a graft-manifest relation. */
  private[engine] def manifestedDir(
      plan: LogicalPlan): Option[(String, Option[String])] =
    plan match {
      case SubqueryAlias(_, child) => manifestedDir(child)
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location match {
          case m: StatsManifest.ManifestFileIndex =>
            Some((m.rootPaths.head.toString,
              lr.catalogTable.map(_.identifier.unquotedString)))
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }

  /** The v1 relation cache captures the ManifestFileIndex (stats + file
    * listing) at resolution time — refresh both the by-path data cache
    * and the catalog entry so the next read resolves the new version. */
  private def refreshRelation(spark: SparkSession, dir: String,
      table: Option[String]): Unit = {
    spark.catalog.refreshByPath(dir)
    // best-effort: graft-catalog idents resolve to a FRESH scan on
    // every query (the swap rule reads the manifest per resolution),
    // so a refreshTable miss on a v2 ident costs nothing
    table.foreach(t =>
      try spark.catalog.refreshTable(t)
      catch { case _: Exception => () })
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** Equi-join keys of a merge condition: every conjunct must be
    * `t.col = s.col` on the SAME column name. */
  private[engine] def mergeKeys(e: Expression): Seq[String] =
    conjuncts(e).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if a.name.equalsIgnoreCase(b.name) => a.name
      case other => throw new IllegalArgumentException(
        "graft MERGE: the ON clause must be a conjunction of " +
          s"t.col = s.col equalities on matching names; got: ${other.sql}")
    }

  /** Is this assignment list the identity by name over ALL `arity`
    * target columns (the expansion of `SET *` / `INSERT *`)? The arity
    * check matters: a partial name-identical list like `SET v = s.v`
    * is a partial UPDATE, not a row replace — treating it as the
    * upsert fast path would silently overwrite the unassigned target
    * columns with source values. */
  private[engine] def isIdentity(as: Seq[Assignment],
      arity: Int): Boolean =
    as.length == arity && as.forall { a =>
      (a.key, a.value) match {
        case (k: AttributeReference, v: AttributeReference) =>
          k.name.equalsIgnoreCase(v.name)
        case _ => false
      }
    }

  /** Opaque expression holder: a bare `Expression` constructor field
    * on a command is auto-collected by `QueryPlan.expressions`, so
    * CheckAnalysis would re-reject a held subquery ("IN/EXISTS
    * predicate subqueries can only be used in …") even though the
    * command evaluates it once at run time. The wrapper is invisible
    * to that reflection. */
  final case class Held(e: Expression)

  final case class GraftDeleteCommand(dir: String,
      condition: Held,
      table: Option[String]) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val (sc, bc) = StatsManifest.manifestColumns(spark, dir)
      RowOps.delete(spark, dir, cond(evalSubqueries(spark, condition.e)),
        sc, bc)
      refreshRelation(spark, dir, table)
      Seq.empty
    }
  }

  final case class GraftUpdateCommand(dir: String,
      set: Seq[(String, Held)],
      condition: Held,
      table: Option[String]) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val (sc, bc) = StatsManifest.manifestColumns(spark, dir)
      RowOps.update(spark, dir, cond(evalSubqueries(spark, condition.e)),
        set.map { case (n, h) => n -> cond(evalSubqueries(spark, h.e)) },
        sc, bc)
      refreshRelation(spark, dir, table)
      Seq.empty
    }
  }

  final case class GraftMergeCommand(dir: String, source: LogicalPlan,
      keys: Seq[String], deleteMatched: Boolean,
      table: Option[String]) extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = Seq(source)
    override def run(spark: SparkSession): Seq[Row] = {
      val (sc, bc) = StatsManifest.manifestColumns(spark, dir)
      val src = GraftSqlBridge.ofRows(spark, source)
      if (deleteMatched)
        RowOps.deleteKeys(spark, dir,
          src.select(keys.map(org.apache.spark.sql.functions.col)
            .toIndexedSeq: _*), keys, sc, bc)
      else RowOps.upsert(spark, dir, src, keys, sc, bc)
      refreshRelation(spark, dir, table)
      Seq.empty
    }
  }

  /** One WHEN clause carried from the parsed plan to [[RowOps.merge]]:
    * expressions are unresolved-by-name with source attributes under
    * [[RowOps.SrcPrefix]] ([[GraftDmlRule.unresolveMerge]]) so they
    * re-resolve against the joined frame the merge builds. `set` =
    * None means DELETE; for a not-matched clause it holds the INSERT
    * values. */
  final case class MergeClauseSpec(cond: Option[Expression],
      set: Option[Seq[(String, Expression)]])

  /** A correlated-subquery LOOKUP lowered out of a MERGE clause at
    * rule time (the r11 DELETE/UPDATE join lowering extended to the
    * clause matrix): `plan` computes, per DISTINCT combination of the
    * referenced target/source columns, either a `true` hit flag (a
    * correlated CONDITION — the combinations where it held) or a
    * scalar value (a correlated scalar in a SET/INSERT value). Built
    * from the RESOLVED statement so it shares attribute ids and
    * Catalyst DECORRELATES it into joins when the command runs; the
    * clause expression references the result by the marker attribute
    * `flag`, which [[RowOps.merge]] left-joins onto its frames
    * ([[RowOps.MergeAux]]). `joinOn` maps the lookup's renamed ref
    * columns to the merge-frame columns they key on. */
  final case class MergeAuxSpec(plan: LogicalPlan, flag: String,
      joinOn: Seq[(String, String)])

  /** SQL `INSERT INTO` / `INSERT OVERWRITE` on a manifested table —
    * the write statement the read/DML surfaces were missing. Without
    * this, Spark's own InsertIntoHadoopFsRelationCommand would land
    * the files but leave the manifest stale, making the inserted rows
    * SILENTLY invisible to every manifest-routed reader. Append =
    * parquet append + one INCREMENTAL manifest reconciliation (only
    * the new files scan — a commit costs O(inserted), never
    * O(table)); overwrite = rewrite + full manifest rebuild (which,
    * like physical OPTIMIZE, invalidates older snapshots — the
    * VACUUM-vs-time-travel trade). Hive-partitioned layouts write
    * back partitioned. Append commits are reconciliation commits:
    * like streaming appends they land no precomputed CDC files, and
    * `changes()` falls back to file-diff netting for them. */
  final case class GraftInsertCommand(dir: String, query: LogicalPlan,
      overwrite: Boolean, userCols: Seq[String], byName: Boolean,
      table: Option[String]) extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = Seq(query)
    override def run(spark: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.{col, lit}
      val (sc, bc) = StatsManifest.manifestColumns(spark, dir)
      val schema = StatsManifest.tableSchema(spark, dir)
      val src = GraftSqlBridge.ofRows(spark, query)
      // align to the table schema: by NAME for named/userCols inserts
      // (missing columns → NULL), by POSITION otherwise (SQL default)
      val aligned =
        if (byName || userCols.nonEmpty) {
          val provided =
            if (userCols.nonEmpty) {
              require(userCols.length == src.columns.length,
                s"graft INSERT: ${userCols.length} target columns but " +
                  s"${src.columns.length} query columns")
              src.toDF(userCols: _*)
            } else src
          val have = provided.columns.map(_.toLowerCase).toSet
          provided.select(schema.map { f =>
            if (have.contains(f.name.toLowerCase))
              col(f.name).cast(f.dataType).as(f.name)
            else lit(null).cast(f.dataType).as(f.name)
          }.toIndexedSeq: _*)
        } else {
          require(src.columns.length == schema.length,
            s"graft INSERT: table has ${schema.length} columns but the " +
              s"query produced ${src.columns.length}")
          src.toDF(schema.fieldNames.toIndexedSeq: _*)
            .select(schema.map(f =>
              col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
        }
      // create-time props first: an EMPTY table (CREATE then INSERT)
      // has no directory layout to infer partition columns from
      val partCols = StatsManifest.tablePartitionCols(spark, dir)
      // CHECK constraints validate inline in the write job (r13);
      // a full overwrite replaces the table and its properties, so
      // only appends enforce
      val checked =
        if (overwrite) aligned
        else graft.sources.Constraints.enforce(spark, dir, aligned)
      // append writes carry the table's PHYSICAL names (rename
      // mapping); a full overwrite REPLACES the table — the manifest
      // (and any mapping) is wiped with the dir, so it writes the
      // logical names and the rebuilt table starts with a clean map
      val toWrite =
        if (overwrite) checked
        else StatsManifest.writePhysical(checked, schema)
      val writer0 = toWrite.write.mode(
        if (overwrite) "overwrite" else "append")
      val writer = if (partCols.isEmpty) writer0
        else writer0.partitionBy(partCols: _*)
      writer.parquet(dir)
      if (overwrite) StatsManifest.write(spark, dir, sc, bc)
      else StatsManifest.update(spark, dir, sc, bloomCols = bc)
      refreshRelation(spark, dir, table)
      Seq.empty
    }
  }

  /** DYNAMIC-partition overwrite core — the backfill workhorse:
    * replace EXACTLY the partitions present in the incoming frame,
    * leave every other partition untouched, all under ONE 'replace'
    * commit (old partitions or new, never the gap; the version-offset
    * streams skip it like any other replace). The replaced set derives
    * from one `distinct()` over the dynamic partition columns —
    * O(partitions touched) on the driver, the lakehouse convention
    * (bounded by partition cardinality, never row-scale); the incoming
    * frame is persisted for the op so a non-deterministic query can't
    * disagree between the partition derivation and the written rows.
    * Reference analogue: the partitioned FileSystem sink's dynamic
    * partition commit
    * (flink-table-runtime-blink/…/filesystem/PartitionLoader.java). */
  private[engine] def dynamicOverwrite(spark: SparkSession, dir: String,
      aligned: org.apache.spark.sql.DataFrame,
      staticCond: Option[org.apache.spark.sql.Column],
      dynCols: Seq[String], sc: Seq[String], bc: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    val pinned = aligned.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val vs = pinned.select(dynCols.map(col): _*).distinct().collect()
      // Hive's own semantics: no rows → no partitions replaced, no-op
      if (vs.isEmpty) return
      require(vs.length <= 4096,
        s"graft INSERT OVERWRITE: the query carries ${vs.length} " +
          "distinct dynamic partitions (max 4096) — backfill in slices " +
          "or overwrite with an explicit WHERE")
      // null-safe per-tuple equality: a NULL partition value addresses
      // the null partition dir, exactly like the write side lands it
      val dynCond = vs.iterator.map(r =>
        dynCols.zipWithIndex.map { case (c, i) =>
          col(c) <=> lit(r.get(i))
        }.reduce(_ && _)).reduce(_ || _)
      val cond = staticCond.map(_ && dynCond).getOrElse(dynCond)
      RowOps.overwriteWhere(spark, dir, cond, pinned, sc, bc)
      ()
    } finally { pinned.unpersist(false); () }
  }

  /** Partition-spec'd INSERT: `INSERT INTO|OVERWRITE t PARTITION
    * (p = v[, q][, …]) SELECT …`. STATIC columns (`p = v`) inject as
    * literals cast to their stored types and the query supplies the
    * rest in table-schema order; DYNAMIC columns (`q`, no value — r13)
    * stay query-supplied and must be table partition columns. OVERWRITE
    * replaces under ONE manifest commit: the static form deletes the
    * spec'd partition ([[RowOps.overwriteWhere]]); the dynamic form
    * replaces exactly the partitions PRESENT IN THE DATA
    * ([[dynamicOverwrite]] — always the dynamic semantics on a graft
    * table, never static mode's silent delete-everything-matching).
    * INTO is the ordinary manifest-committing append either way. */
  final case class GraftInsertPartitionCommand(dir: String,
      query: LogicalPlan, overwrite: Boolean,
      spec: Seq[(String, Option[String])], table: Option[String])
      extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = Seq(query)
    override def run(spark: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.{col, lit}
      val (sc, bc) = StatsManifest.manifestColumns(spark, dir)
      val schema = StatsManifest.tableSchema(spark, dir)
      val specMap = spec.collect {
        case (n, Some(v)) => n.toLowerCase -> v }.toMap
      val dynCols = spec.collect { case (n, None) => n }
      val bad = spec.map(_._1).filterNot(n =>
        schema.fieldNames.exists(_.equalsIgnoreCase(n)))
      require(bad.isEmpty, "graft INSERT: PARTITION columns not in " +
        s"the table: ${bad.mkString(", ")}")
      val partCols = StatsManifest.tablePartitionCols(spark, dir)
      val badDyn = dynCols.filterNot(n =>
        partCols.exists(_.equalsIgnoreCase(n)))
      require(badDyn.isEmpty, "graft INSERT: dynamic PARTITION " +
        s"columns must be table partition columns; " +
        s"${badDyn.mkString(", ")} is not (table partitions: " +
        s"${partCols.mkString(", ")})")
      val rest = schema.filterNot(f =>
        specMap.contains(f.name.toLowerCase))
      val src = GraftSqlBridge.ofRows(spark, query)
      require(src.columns.length == rest.length,
        s"graft INSERT: expected ${rest.length} query columns (the " +
          s"table minus the static PARTITION columns), got " +
          s"${src.columns.length}")
      val named = src.toDF(rest.map(_.name).toIndexedSeq: _*)
      val aligned = named.select(schema.map { f =>
        specMap.get(f.name.toLowerCase) match {
          case Some(v) => lit(v).cast(f.dataType).as(f.name)
          case None => col(f.name).cast(f.dataType).as(f.name)
        }
      }.toIndexedSeq: _*)
      if (overwrite && dynCols.nonEmpty) {
        val staticCond = spec.collect { case (n, Some(v)) =>
          val f = schema.find(_.name.equalsIgnoreCase(n)).get
          col(f.name) === lit(v).cast(f.dataType)
        }.reduceOption(_ && _)
        val dynNames = dynCols.map(n =>
          schema.find(_.name.equalsIgnoreCase(n)).get.name)
        dynamicOverwrite(spark, dir, aligned, staticCond, dynNames,
          sc, bc)
      } else if (overwrite) {
        val cond = spec.map { case (n, v) =>
          val f = schema.find(_.name.equalsIgnoreCase(n)).get
          col(f.name) === lit(v.get).cast(f.dataType)
        }.reduce(_ && _)
        RowOps.overwriteWhere(spark, dir, cond, aligned, sc, bc)
        ()
      } else {
        // the overwrite forms enforce CHECK constraints inside
        // overwriteWhere's rewrite; the append form enforces here
        val writer0 = StatsManifest.writePhysical(
          graft.sources.Constraints.enforce(spark, dir, aligned), schema)
          .write.mode("append")
        val writer = if (partCols.isEmpty) writer0
          else writer0.partitionBy(partCols: _*)
        writer.parquet(dir)
        StatsManifest.update(spark, dir, sc, bloomCols = bc)
        ()
      }
      refreshRelation(spark, dir, table)
      Seq.empty
    }
  }

  /** DSv2 dynamic-partition overwrite (r13): the catalog's
    * `OverwritePartitionsDynamic` node (`INSERT OVERWRITE graft.db.t
    * PARTITION (p) …` under partitionOverwriteMode=dynamic, or a
    * bare `INSERT OVERWRITE` in dynamic mode) — replace exactly the
    * partitions present in the query via [[dynamicOverwrite]]. */
  final case class GraftDynamicOverwriteCommand(dir: String,
      query: LogicalPlan, table: Option[String])
      extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = Seq(query)
    override def run(spark: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.col
      val (sc, bc) = StatsManifest.manifestColumns(spark, dir)
      val schema = StatsManifest.tableSchema(spark, dir)
      val partCols = StatsManifest.tablePartitionCols(spark, dir)
      require(partCols.nonEmpty,
        "graft INSERT OVERWRITE (dynamic): the table has no partition " +
          "columns — use a plain INSERT OVERWRITE")
      val src = GraftSqlBridge.ofRows(spark, query)
        .toDF(schema.fieldNames.toIndexedSeq: _*)
      val aligned = src.select(schema.map(f =>
        col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
      dynamicOverwrite(spark, dir, aligned, None, partCols, sc, bc)
      refreshRelation(spark, dir, table)
      Seq.empty
    }
  }

  /** DSv2 `INSERT OVERWRITE … WHERE`-shaped overwrite (r12): the
    * catalog's `OverwriteByExpression` with a non-trivial delete
    * expression — e.g. a static PARTITION spec on a `graft.db.t` name —
    * lowered to [[RowOps.overwriteWhere]]'s single-commit
    * delete-matching + append. */
  final case class GraftOverwriteWhereCommand(dir: String,
      query: LogicalPlan, condition: Held, table: Option[String])
      extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = Seq(query)
    override def run(spark: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.col
      val (sc, bc) = StatsManifest.manifestColumns(spark, dir)
      val schema = StatsManifest.tableSchema(spark, dir)
      // ResolveOutputRelation aligned the query positionally
      val src = GraftSqlBridge.ofRows(spark, query)
        .toDF(schema.fieldNames.toIndexedSeq: _*)
      val aligned = src.select(schema.map(f =>
        col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
      RowOps.overwriteWhere(spark, dir,
        cond(evalSubqueries(spark, condition.e)), aligned, sc, bc)
      refreshRelation(spark, dir, table)
      Seq.empty
    }
  }

  /** CORRELATED DELETE/UPDATE — the join lowering. A correlated WHERE
    * condition (`EXISTS (SELECT … WHERE s.x = t.y)`, `k IN (SELECT …
    * WHERE …= t.…)`, `m < (SELECT … WHERE … = t.k)`, any boolean
    * combination incl. NOT) is a deterministic function of exactly the
    * target columns it references. So the statement lowers to:
    *
    *  1. `source` = the DISTINCT combinations of those referenced
    *     columns that satisfy the condition — built at RULE time as
    *     `Distinct(Project(refs, Filter(cond, target)))`, a fully
    *     resolved self-contained plan that Spark's own optimizer
    *     DECORRELATES into joins when the command runs (no driver-side
    *     materialization, unlike the uncorrelated IN-list path);
    *  2. the row change = [[RowOps.deleteKeys]] (DELETE) or a
    *     [[RowOps.merge]] with one unconditional WHEN MATCHED UPDATE
    *     (UPDATE), keyed on the referenced columns — manifest-pruned,
    *     distributed, CDC-correct.
    *
    * Exactness guard: the equi-join cannot address a target row whose
    * referenced column is NULL, and for such a row the condition is
    * almost always NULL (three-valued logic) — but shapes like
    * `t.y IS NULL OR EXISTS(…)` can make it TRUE. If any satisfying
    * combination carries a NULL, the command fails LOUDLY instead of
    * silently skipping those rows. Non-deterministic conditions are
    * rejected at rule time (the two-pass evaluation would see
    * different rows). */
  final case class GraftCorrelatedDmlCommand(dir: String,
      source: LogicalPlan, keys: Seq[String],
      /** None = DELETE; Some(set) = UPDATE assignments (values cross
        * unresolved-by-name; correlated SET values stay declared
        * out). */
      set: Option[Seq[(String, Held)]],
      table: Option[String]) extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = Seq(source)
    override def run(spark: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.col
      val (sc, bc) = StatsManifest.manifestColumns(spark, dir)
      val src = GraftSqlBridge.ofRows(spark, source)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val nullKeyed = src.where(keys.map(col(_).isNull)
          .reduce(_ || _)).limit(1).collect()
        require(nullKeyed.isEmpty,
          "graft DML: the correlated condition matched a row with " +
            s"NULL in a referenced column (${keys.mkString(", ")}) — " +
            "the join lowering cannot address such rows; add an IS " +
            "NOT NULL conjunct or run MERGE directly")
        set match {
          case None =>
            RowOps.deleteKeys(spark, dir, src, keys, sc, bc)
          case Some(as) =>
            // validate=false: Distinct guarantees unique source keys
            RowOps.merge(spark, dir, src, keys, sc, bc,
              matched = Seq(RowOps.MergeUpdate(None, as.map {
                case (n, h) => n -> cond(evalSubqueries(spark, h.e))
              })), validate = false)
        }
      } finally src.unpersist()
      refreshRelation(spark, dir, table)
      Seq.empty
    }
  }

  /** The general MERGE: conditional / multi-clause matched actions,
    * conditional inserts, NOT MATCHED BY SOURCE, and (r12) correlated
    * subqueries in clause conditions / SET / INSERT values via the
    * [[MergeAuxSpec]] lookups. */
  final case class GraftMergeFullCommand(dir: String, source: LogicalPlan,
      keys: Seq[String], matched: Seq[MergeClauseSpec],
      notMatched: Seq[MergeClauseSpec], bySource: Seq[MergeClauseSpec],
      table: Option[String],
      aux: Seq[MergeAuxSpec] = Nil) extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] =
      source +: aux.map(_.plan)
    override def run(spark: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.col
      val (sc, bc) = StatsManifest.manifestColumns(spark, dir)
      val src = GraftSqlBridge.ofRows(spark, source)
      def xc(e: Expression): org.apache.spark.sql.Column =
        cond(evalSubqueries(spark, e))
      def clause(s: MergeClauseSpec): RowOps.MergeClause = s.set match {
        case None => RowOps.MergeDelete(s.cond.map(xc))
        case Some(as) => RowOps.MergeUpdate(s.cond.map(xc),
          as.map { case (n, e) => n -> xc(e) })
      }
      // materialize the correlated lookups ONCE (Catalyst decorrelates
      // each plan into joins here); same NULL-ref exactness guard as
      // the correlated DELETE/UPDATE lowering
      val auxDfs = aux.map { a =>
        val df = GraftSqlBridge.ofRows(spark, a.plan)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val refCols = a.joinOn.map(_._1)
        if (refCols.nonEmpty) {
          val nullKeyed = df.where(refCols.map(col(_).isNull)
            .reduce(_ || _)).limit(1).collect()
          require(nullKeyed.isEmpty,
            "graft MERGE: a correlated clause expression matched a row " +
              "with NULL in a referenced column — the join lowering " +
              "cannot address such rows; add an IS NOT NULL conjunct")
        }
        RowOps.MergeAux(a.flag, df, a.joinOn)
      }
      try RowOps.merge(spark, dir, src, keys, sc, bc,
        matched = matched.map(clause),
        notMatched = notMatched.map { s =>
          RowOps.MergeInsert(s.cond.map(xc),
            s.set.getOrElse(Nil).map { case (n, e) => n -> xc(e) })
        },
        notMatchedBySource = bySource.map(clause),
        aux = auxDfs)
      finally auxDfs.foreach(_.df.unpersist(false))
      refreshRelation(spark, dir, table)
      Seq.empty
    }
  }
}

/** The resolution rule: fires once the DML node and its target are
  * resolved, before CheckAnalysis would reject the v1 relation. Also
  * resolves the read-side SQL surfaces of the lakehouse layer —
  * `VERSION AS OF` / `TIMESTAMP AS OF` time travel and the
  * `graft_changes(tbl, from[, to])` changefeed TVF — for manifested
  * tables. */
final case class GraftDmlRule(spark: SparkSession)
    extends Rule[LogicalPlan] {
  import GraftDml._

  /** Lower a correlated DELETE/UPDATE onto the join machinery — see
    * [[GraftDml.GraftCorrelatedDmlCommand]]. Built at RULE time so the
    * source plan shares the resolved target's attribute ids (no
    * unresolve crossing for the correlated condition). */
  private def correlatedDml(dir: String, tbl: Option[String],
      target: LogicalPlan, condition: Expression,
      set: Option[Seq[(String, GraftDml.Held)]],
      stmt: String): LogicalPlan = {
    require(condition.deterministic,
      s"graft $stmt: a correlated condition must be deterministic")
    val refs = condition.references.intersect(target.outputSet).toSeq
    require(refs.nonEmpty,
      s"graft $stmt: correlated condition references no target column")
    GraftDml.GraftCorrelatedDmlCommand(dir,
      Distinct(Project(refs, Filter(condition, target))),
      refs.map(_.name), set, tbl)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      // claim INSERT before DataSourceAnalysis (postHoc) would land the
      // files WITHOUT the manifest commit — silently invisible rows
      case i: InsertIntoStatement if i.query.resolved =>
        manifestedDir(i.table) match {
          case Some((dir, tbl)) if i.partitionSpec.nonEmpty =>
            require(i.userSpecifiedCols.isEmpty && !i.byName,
              "graft INSERT: a PARTITION spec cannot combine with a " +
                "column list")
            GraftDml.GraftInsertPartitionCommand(dir, i.query,
              i.overwrite, i.partitionSpec.toSeq, tbl)
          case Some((dir, tbl)) =>
            GraftDml.GraftInsertCommand(dir, i.query, i.overwrite,
              i.userSpecifiedCols, i.byName, tbl)
          case None => i
        }

      case d @ DeleteFromTable(target, condition) if d.resolved =>
        manifestedDir(target) match {
          case Some((dir, tbl)) if hasCorrelated(condition) =>
            correlatedDml(dir, tbl, target, condition, None, "DELETE")
          case Some((dir, tbl)) =>
            checkUncorrelated(condition, "DELETE")
            GraftDml.GraftDeleteCommand(dir, GraftDml.Held(condition), tbl)
          case None => d
        }

      case u @ UpdateTable(target, assignments, condition)
          if u.resolved =>
        manifestedDir(target) match {
          case Some((dir, tbl)) =>
            val set = assignments.map { a =>
              checkUncorrelated(a.value, "UPDATE SET")
              a.key match {
                case k: org.apache.spark.sql.catalyst.expressions
                    .AttributeReference =>
                  k.name -> GraftDml.Held(a.value)
                case other => throw new IllegalArgumentException(
                  s"graft UPDATE: unsupported SET target ${other.sql}")
              }
            }
            if (condition.exists(hasCorrelated))
              correlatedDml(dir, tbl, target, condition.get, Some(set),
                "UPDATE")
            else {
              condition.foreach(checkUncorrelated(_, "UPDATE"))
              GraftDml.GraftUpdateCommand(dir, set,
                GraftDml.Held(condition.getOrElse(
                  org.apache.spark.sql.catalyst.expressions
                    .Literal(true))),
                tbl)
            }
          case None => u
        }

      case m: MergeIntoTable if m.resolved =>
        manifestedDir(m.targetTable) match {
          case Some((dir, tbl)) =>
            val keys = mergeKeys(m.mergeCondition)
            val targetCols = m.targetTable.output.map(_.name)
            val arity = targetCols.length
            val srcOut = m.sourceTable.outputSet
            val tgtOut = m.targetTable.outputSet
            // source attrs cross under RowOps.SrcPrefix — the joined
            // frame RowOps.merge builds carries them by that name
            def un(e: Expression): Expression = e.transform {
              case a: AttributeReference if srcOut.contains(a) =>
                UnresolvedAttribute.quoted(RowOps.SrcPrefix + a.name)
              case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
            }
            // ---- correlated clause lowering (r12): see MergeAuxSpec.
            // group: 'm' matched (sees target × source via the merge
            // ON), 'i' not-matched insert (source only), 'b' by-source
            // (target only) — the base plan the lookup evaluates over.
            val auxBuf = scala.collection.mutable
              .ArrayBuffer.empty[GraftDml.MergeAuxSpec]
            def basePlan(group: Char): LogicalPlan = group match {
              case 'm' => Join(m.targetTable, m.sourceTable,
                org.apache.spark.sql.catalyst.plans.Inner,
                Some(m.mergeCondition), JoinHint.NONE)
              case 'i' => m.sourceTable
              case 'b' => m.targetTable
            }
            def refsOf(e: Expression, group: Char,
                what: String): Seq[AttributeReference] = {
              require(e.deterministic,
                s"graft MERGE: a correlated $what must be deterministic")
              val rs = e.references.toSeq.collect {
                case a: AttributeReference
                    if tgtOut.contains(a) || srcOut.contains(a) => a
              }
              if (group == 'i') require(rs.forall(srcOut.contains),
                "graft MERGE: a NOT MATCHED clause's correlated " +
                  s"$what may reference source columns only")
              if (group == 'b') require(rs.forall(tgtOut.contains),
                "graft MERGE: a NOT MATCHED BY SOURCE clause's " +
                  s"correlated $what may reference target columns only")
              rs
            }
            def auxJoin(flag: String, refs: Seq[AttributeReference])
                : (Seq[org.apache.spark.sql.catalyst.expressions
                  .NamedExpression], Seq[(String, String)]) = {
              val aliases = refs.zipWithIndex.map { case (r, i) =>
                org.apache.spark.sql.catalyst.expressions
                  .Alias(r, s"${flag}_r$i")()
              }
              val joinOn = refs.zipWithIndex.map { case (r, i) =>
                s"${flag}_r$i" -> (if (srcOut.contains(r))
                  RowOps.SrcPrefix + r.name else r.name)
              }
              (aliases, joinOn)
            }
            /** correlated CONDITION → hit-flag lookup: the distinct
              * ref-combinations where it held. */
            def lowerCond(e: Expression, group: Char): Expression = {
              val refs = refsOf(e, group, "condition")
              require(refs.nonEmpty, "graft MERGE: correlated " +
                "condition references no target/source column")
              val flag = s"__graft_aux${auxBuf.size}"
              val (aliases, joinOn) = auxJoin(flag, refs)
              auxBuf += GraftDml.MergeAuxSpec(
                Project(aliases :+ org.apache.spark.sql.catalyst
                  .expressions.Alias(org.apache.spark.sql.catalyst
                    .expressions.Literal(true), flag)(),
                  Distinct(Project(refs, Filter(e, basePlan(group))))),
                flag, joinOn)
              UnresolvedAttribute.quoted(flag)
            }
            /** correlated scalars inside a SET/INSERT VALUE → value
              * lookups per distinct ref-combination; the surrounding
              * computation keeps running in the clause. Correlated
              * EXISTS in a value (r13) rides the CONDITION machinery:
              * EXISTS is two-valued, so the hit-flag join's NULL
              * (no satisfying ref-combination) is exactly FALSE —
              * `coalesce(flag, false)`. Three-valued IN stays refused:
              * a hit-flag join cannot represent its UNKNOWN result. */
            def lowerValue(e: Expression, group: Char): Expression = {
              val boolLowered = e.transformDown {
                case s: org.apache.spark.sql.catalyst.expressions
                    .Exists if s.getOuterAttrs.nonEmpty =>
                  org.apache.spark.sql.catalyst.expressions.Coalesce(
                    Seq(lowerCond(s, group),
                      org.apache.spark.sql.catalyst.expressions
                        .Literal(false)))
              }
              boolLowered.transformUp {
                case s: org.apache.spark.sql.catalyst.expressions
                    .ScalarSubquery if s.getOuterAttrs.nonEmpty =>
                  val refs = refsOf(s, group, "SET/INSERT value")
                  val flag = s"__graft_aux${auxBuf.size}"
                  val (aliases, joinOn) = auxJoin(flag, refs)
                  auxBuf += GraftDml.MergeAuxSpec(
                    Project(aliases :+ org.apache.spark.sql.catalyst
                      .expressions.Alias(s, flag)(),
                      Distinct(Project(refs, basePlan(group)))),
                    flag, joinOn)
                  UnresolvedAttribute.quoted(flag)
                case s: org.apache.spark.sql.catalyst.expressions
                    .SubqueryExpression if s.getOuterAttrs.nonEmpty =>
                  throw new IllegalArgumentException(
                    "graft MERGE: correlated SCALAR and EXISTS " +
                      "subqueries are supported in SET/INSERT values; " +
                      "three-valued IN is not (its UNKNOWN result has " +
                      "no hit-flag form) — move it into the clause " +
                      "condition or rewrite as EXISTS")
              }
            }
            def assigns(as: Seq[Assignment], group: Char,
                what: String): Seq[(String, Expression)] = as.map { x =>
              val v =
                if (hasCorrelated(x.value)) lowerValue(x.value, group)
                else { checkUncorrelated(x.value, "MERGE"); x.value }
              x.key match {
                case k: AttributeReference => k.name -> un(v)
                case other => throw new IllegalArgumentException(
                  s"graft MERGE: unsupported $what target ${other.sql}")
              }
            }
            def spec(a: MergeAction,
                group: Char): GraftDml.MergeClauseSpec = {
              val c = a.condition.map { c0 =>
                if (hasCorrelated(c0)) lowerCond(c0, group)
                else { checkUncorrelated(c0, "MERGE"); c0 }
              }
              a match {
                case UpdateAction(_, as, _) =>
                  GraftDml.MergeClauseSpec(c.map(un),
                    Some(assigns(as, group, "SET")))
                case UpdateStarAction(_) =>
                  GraftDml.MergeClauseSpec(c.map(un), Some(targetCols.map(
                    n => n -> (UnresolvedAttribute.quoted(
                      RowOps.SrcPrefix + n): Expression))))
                case DeleteAction(_) =>
                  GraftDml.MergeClauseSpec(c.map(un), None)
                case InsertAction(_, as) =>
                  GraftDml.MergeClauseSpec(c.map(un),
                    Some(assigns(as, group, "INSERT")))
                case InsertStarAction(_) =>
                  GraftDml.MergeClauseSpec(c.map(un), Some(targetCols.map(
                    n => n -> (UnresolvedAttribute.quoted(
                      RowOps.SrcPrefix + n): Expression))))
                case other => throw new IllegalArgumentException(
                  s"graft MERGE: unsupported action $other")
              }
            }
            (m.matchedActions, m.notMatchedActions,
              m.notMatchedBySourceActions) match {
              // fast paths: the exact upsert / delete-by-key shapes map
              // straight onto RowOps.upsert / deleteKeys (narrower CDC,
              // no join-frame build). isIdentity's arity check keeps
              // partial name-identical SET lists OUT of here — those
              // are partial updates and take the general path below.
              case (Seq(u: UpdateAction), Seq(i: InsertAction), Seq())
                  if u.condition.isEmpty && i.condition.isEmpty &&
                    isIdentity(u.assignments, arity) &&
                    isIdentity(i.assignments, arity) =>
                GraftDml.GraftMergeCommand(dir, m.sourceTable, keys,
                  deleteMatched = false, tbl)
              case (Seq(UpdateStarAction(None)),
                  Seq(InsertStarAction(None)), Seq()) =>
                GraftDml.GraftMergeCommand(dir, m.sourceTable, keys,
                  deleteMatched = false, tbl)
              case (Seq(DeleteAction(None)), Seq(), Seq()) =>
                GraftDml.GraftMergeCommand(dir, m.sourceTable, keys,
                  deleteMatched = true, tbl)
              // the general clause matrix: conditional / multi-clause
              // matched actions, conditional inserts, NOT MATCHED BY
              // SOURCE — first-true-wins per group (ANSI); correlated
              // clause subqueries lower to MergeAuxSpec lookups
              case (ma, na, ba) =>
                val mm = ma.map(spec(_, 'm'))
                val nn = na.map(spec(_, 'i'))
                val bb = ba.map(spec(_, 'b'))
                GraftDml.GraftMergeFullCommand(dir, m.sourceTable, keys,
                  mm, nn, bb, tbl, auxBuf.toSeq)
            }
          case None => m
        }
    }

}
