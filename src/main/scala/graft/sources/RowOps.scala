package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Row-level operations — DELETE / UPDATE / MERGE(upsert) — on a
  * stats-manifested parquet table, copy-on-write at FILE granularity
  * with the manifest doing the work twice over:
  *
  *  1. '''Find''' — the op's predicate (or the source's key range for a
  *     merge) runs through [[StatsManifest.scanAtVersion]]'s pruning
  *     `FileIndex`, so files whose stats refute it never even launch a
  *     task during candidate discovery. A z-ordered table turns a
  *     point delete into a handful-of-files rewrite.
  *  2. '''Commit''' — replacement files are staged in full, then ONE
  *     atomic manifest commit ([[StatsManifest.commitFileOps]])
  *     tombstones the touched files and adopts the staged ones.
  *     Replaced bytes are physically retained: snapshot reads at
  *     earlier versions keep working (time travel survives row ops,
  *     unlike `Layout.optimize`'s physical swap), and [[changes]] reads
  *     them back as a row-level CDC feed. [[StatsManifest.expire]]
  *     reclaims them once retention drops every referencing version.
  *
  * Only files containing ≥1 affected row are rewritten — an untouched
  * file's bytes and manifest entry both carry over. At 100 TB that is
  * the difference between "a GDPR erasure rewrites ~the files one user
  * touches" and "rewrites the corpus".
  *
  * Reference analogue: the reference expresses mutation as changelog
  * streams (`flink-table-runtime-blink/…/operators/deduplicate/
  * DeduplicateKeepLastRowFunction.java` materializes upserts into state);
  * this module is the same upsert/retract semantics applied to a STORED
  * table, the batch half a lakehouse needs.
  *
  * Hive-partitioned layouts compose: partition predicates prune
  * DIRECTORIES before the manifest prunes files, rewrites stage back
  * partitioned, and the file moves preserve the `p=…` relative paths.
  * Single-writer per table, enforced optimistically at commit
  * ([[StatsManifest.commitFileOps]] aborts when the analyzed version
  * is no longer the latest — no lost updates under a race); readers
  * racing a commit see the old version or a transiently-short new one
  * (never duplicates — tombstones and the commit land atomically,
  * staged files rename in immediately after; crash recovery = finish
  * the renames, the staged bytes and the manifest's final keys are all
  * on disk).
  */
object RowOps {

  /** What one row-level op did. `candidateFiles`/`totalFiles` are the
    * find-phase pruning evidence (files scanned for matches vs files in
    * the table); `touchedFiles` of those actually contained matches and
    * were rewritten; `matchedRows` hit the predicate / a source key;
    * `rewrittenRows` landed in replacement files (kept + updated +
    * upserted); `insertedRows` were new keys (merge only). */
  final case class OpResult(version: Long, totalFiles: Long,
      candidateFiles: Long, touchedFiles: Long, matchedRows: Long,
      rewrittenRows: Long, insertedRows: Long = 0L)

  /** Per-phase wall times (ms) of the LAST row-level op on this
    * driver — the DupFilterProbe-style attribution channel for the
    * streaming CDC-apply path. `open` = snapshot resolution, `find` =
    * touch detection (+ insert determination for merges), `stage` =
    * the replacement write, `commit` = stats scan + manifest commit +
    * renames, `cdc` = netting + change-file write. */
  object PhaseStats {
    val open = new java.util.concurrent.atomic.AtomicLong(-1L)
    val find = new java.util.concurrent.atomic.AtomicLong(-1L)
    val stage = new java.util.concurrent.atomic.AtomicLong(-1L)
    val commit = new java.util.concurrent.atomic.AtomicLong(-1L)
    val cdc = new java.util.concurrent.atomic.AtomicLong(-1L)
  }
  private def phase[T](into: java.util.concurrent.atomic.AtomicLong)(
      body: => T): T = {
    val t = System.nanoTime()
    try body finally into.set((System.nanoTime() - t) / 1000000L)
  }

  /** DELETE FROM dir WHERE cond. Null-safe: rows where `cond` is null
    * are kept (SQL DELETE semantics). */
  def delete(spark: SparkSession, dir: String, cond: Column,
      statsCols: Seq[String], bloomCols: Seq[String] = Nil,
      cdf: Boolean = true): OpResult = {
    val ctx = open(spark, dir)
    val touched = touchedByPredicate(ctx, ctx.snap.where(cond))
    val old = readFiles(ctx, touched.keys)
    rewriteWith(ctx, touched, statsCols, bloomCols,
      old.where(!coalesce(cond, lit(false))),
      cdc = if (cdf) Some((old.where(coalesce(cond, lit(false))),
        emptyOf(ctx))) else None,
      op = "delete")
  }

  /** INSERT OVERWRITE … WHERE cond (the DSv2 `OverwriteByExpression`
    * semantics, which is also what a static-partition `INSERT
    * OVERWRITE t PARTITION (p = v)` lowers to): delete every row
    * matching `cond` AND insert `data`, under ONE manifest commit —
    * a reader sees the old state or the new state, never the gap a
    * DELETE-then-INSERT pair would expose. Pruning is the DELETE
    * path's (a pure partition predicate refutes every file outside
    * the partition at plan time); `data` is appended as fresh files
    * alongside the rewritten remainder; CDC records matched rows as
    * deletes and `data`'s rows as inserts (carried rows net out). */
  def overwriteWhere(spark: SparkSession, dir: String, cond: Column,
      data: DataFrame, statsCols: Seq[String],
      bloomCols: Seq[String] = Nil, cdf: Boolean = true): OpResult = {
    val ctx = open(spark, dir)
    val aligned = data.select(ctx.schema.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
    val touched = touchedByPredicate(ctx, ctx.snap.where(cond))
    val old = readFiles(ctx, touched.keys)
    val kept = old.where(!coalesce(cond, lit(false)))
    rewriteWith(ctx, touched, statsCols, bloomCols,
      kept.unionByName(aligned),
      extraFiles = 1,
      cdc = if (cdf) Some((old.where(coalesce(cond, lit(false))),
        aligned)) else None,
      // 'replace', not 'overwrite': the latter is the FULL-rebuild
      // kind (no change files ever follow it), while this op lands a
      // netted CDC feed — the streaming changefeed keys its
      // wait-vs-fail decision on the kind
      op = "replace")
  }

  /** UPDATE dir SET set... WHERE cond. Each `set` entry is
    * (column name, new-value expression over the row's columns); the
    * new value is cast to the column's stored type. */
  def update(spark: SparkSession, dir: String, cond: Column,
      set: Seq[(String, Column)], statsCols: Seq[String],
      bloomCols: Seq[String] = Nil, cdf: Boolean = true): OpResult = {
    val ctx = open(spark, dir)
    val bad = set.map(_._1).filterNot(ctx.schema.fieldNames.contains)
    require(bad.isEmpty, s"update: unknown columns ${bad.mkString(", ")}")
    val setMap = set.toMap
    val touched = touchedByPredicate(ctx, ctx.snap.where(cond))
    val old = readFiles(ctx, touched.keys)
    def applySet(df: DataFrame): DataFrame =
      df.select(ctx.schema.map { f =>
        setMap.get(f.name) match {
          case Some(e) => when(coalesce(cond, lit(false)),
            e.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }.toIndexedSeq: _*)
    val oldM = old.where(coalesce(cond, lit(false)))
    rewriteWith(ctx, touched, statsCols, bloomCols, applySet(old),
      cdc = if (cdf) Some((oldM, applySet(oldM))) else None,
      op = "update")
  }

  /** MERGE INTO dir USING source ON keys — upsert semantics: a target
    * row whose key appears in `source` is REPLACED by the source row;
    * source rows with no target match are INSERTED. `source` must have
    * the target's columns (cast to the stored types) and, with
    * `validate` on, unique keys — duplicate source keys would make the
    * result order-dependent, so they fail fast (O(1)-output probe). */
  def upsert(spark: SparkSession, dir: String, source: DataFrame,
      keys: Seq[String], statsCols: Seq[String],
      bloomCols: Seq[String] = Nil, validate: Boolean = true,
      cdf: Boolean = true): OpResult = {
    val ctx = open(spark, dir)
    val missing = ctx.schema.fieldNames.filterNot(
      source.schema.fieldNames.contains)
    require(missing.isEmpty,
      s"upsert: source lacks target columns ${missing.mkString(", ")}")
    val src = source.select(ctx.schema.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
    if (validate) {
      val dup = src.groupBy(keys.map(col).toIndexedSeq: _*)
        .agg(count(lit(1)).as("n")).where(col("n") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"upsert: duplicate source key ${dup.headOption.mkString} — " +
          "dedupe the source (e.g. keep-last by a version column) first")
    }
    val touched = touchedByKeys(ctx, src, keys)
    val touchedDf = readFiles(ctx, touched.keys)
    val tKeys = touchedDf.select(keys.map(col).toIndexedSeq: _*).distinct()
    val inserted = src.join(tKeys, keys, "left_anti").count()
    val replacedOld = touchedDf.join(
      src.select(keys.map(col).toIndexedSeq: _*), keys, "left_semi")
    val res = rewriteWith(ctx, touched, statsCols, bloomCols,
      touchedDf.join(src.select(keys.map(col).toIndexedSeq: _*),
        keys, "left_anti")
        .unionByName(src),
      extraFiles = 1,
      cdc = if (cdf) Some((replacedOld, src)) else None,
      conflictIfInterimAdds = true, // inserts depend on the key set
      op = "upsert")
    res.copy(insertedRows = inserted)
  }

  // ---------------------------------------------------------------- //
  //  Full MERGE: conditional, multi-clause, by-source                  //
  // ---------------------------------------------------------------- //

  /** Prefix under which [[merge]] exposes SOURCE columns to clause
    * conditions and values (target columns keep their bare names). */
  private[graft] val SrcPrefix = "__s_"
  private val MatchedFlag = "__graft_matched"
  private val ClauseIdx = "__graft_clause"

  /** Reference a SOURCE column in a merge clause condition or value —
    * matched clauses see both sides (target by bare name, source via
    * this); NOT MATCHED insert values see only source columns; NOT
    * MATCHED BY SOURCE clauses see only target columns. */
  def srcCol(name: String): Column = col(SrcPrefix + name)

  /** One WHEN clause of a full [[merge]]. Within each clause group
    * (matched / not-matched / not-matched-by-source) the FIRST clause
    * whose condition holds applies; a row no clause claims is kept
    * (target side) or ignored (source side) — ANSI MERGE semantics. */
  sealed trait MergeClause { def condition: Option[Column] }
  /** WHEN MATCHED [AND cond] THEN UPDATE SET name = value, … (also the
    * by-source update). Unassigned target columns keep their values —
    * a partial SET is a partial update, never a row replace. */
  final case class MergeUpdate(condition: Option[Column],
      set: Seq[(String, Column)]) extends MergeClause
  /** WHEN [NOT] MATCHED [BY SOURCE] [AND cond] THEN DELETE. */
  final case class MergeDelete(condition: Option[Column] = None)
      extends MergeClause
  /** WHEN NOT MATCHED [AND cond] THEN INSERT (cols) VALUES (…) —
    * values over source columns ([[srcCol]]); unassigned target
    * columns get NULL. */
  final case class MergeInsert(condition: Option[Column],
      values: Seq[(String, Column)]) extends MergeClause

  /** A correlated-subquery LOOKUP a merge clause references: `df`
    * carries uniquely-named join columns plus one output column
    * `flag` — either a `true` hit flag (the lowering of a correlated
    * CONDITION: the distinct ref-combinations where it held) or a
    * computed value (a correlated scalar in a SET/INSERT value,
    * evaluated per distinct ref-combination). [[merge]] left-joins it
    * onto every frame that has the join columns — the (target × source)
    * clause frame, the insert anti-join frame, the by-source touch
    * frame — and clause Columns simply reference `flag` by name.
    * `joinOn` maps each aux column to the joined-frame column it keys
    * on (bare target names; [[SrcPrefix]]-prefixed source names). */
  final case class MergeAux(flag: String, df: DataFrame,
      joinOn: Seq[(String, String)])

  /** MERGE INTO dir USING source ON keys — the full ANSI clause
    * matrix: conditional and multiple WHEN MATCHED UPDATE/DELETE
    * clauses, conditional multi-clause WHEN NOT MATCHED INSERT, and
    * WHEN NOT MATCHED BY SOURCE UPDATE/DELETE. Same copy-on-write
    * machinery as [[upsert]]: matched-clause candidate files prune by
    * the source's key envelope; by-source clauses prune by the OR of
    * their conditions (an unconditional by-source clause touches every
    * file — it rewrites the whole unmatched side by definition).
    * Untouched rows in rewritten files carry over bit-exact and net
    * out of the CDC feed. `validate` enforces unique source keys — a
    * target row matched by two source rows is ANSI-undefined. */
  def merge(spark: SparkSession, dir: String, source: DataFrame,
      keys: Seq[String], statsCols: Seq[String],
      bloomCols: Seq[String] = Nil,
      matched: Seq[MergeClause] = Nil,
      notMatched: Seq[MergeInsert] = Nil,
      notMatchedBySource: Seq[MergeClause] = Nil,
      validate: Boolean = true, cdf: Boolean = true,
      /** false skips the insert-count job (OpResult.insertedRows reads
        * −1) — a per-batch streaming caller that never reads the count
        * should not pay an action for it. */
      countInserts: Boolean = true,
      /** correlated-subquery lookups the clauses reference — see
        * [[MergeAux]]. */
      aux: Seq[MergeAux] = Nil): OpResult = {
    val ctx = open(spark, dir)
    require(matched.nonEmpty || notMatched.nonEmpty ||
      notMatchedBySource.nonEmpty, "merge: no WHEN clauses")
    (matched ++ notMatchedBySource).foreach {
      case _: MergeInsert => throw new IllegalArgumentException(
        "merge: INSERT is only a NOT MATCHED action")
      case _ => ()
    }
    val fields = ctx.schema.fieldNames.toSet
    def checkNames(ns: Seq[String], what: String): Unit = {
      val bad = ns.filterNot(fields.contains)
      require(bad.isEmpty,
        s"merge: unknown target columns in $what: ${bad.mkString(", ")}")
    }
    (matched ++ notMatchedBySource).foreach {
      case MergeUpdate(_, s) => checkNames(s.map(_._1), "UPDATE SET")
      case _ => ()
    }
    notMatched.foreach(i => checkNames(i.values.map(_._1), "INSERT"))
    val missingKeys = keys.filterNot(source.columns.contains)
    require(missingKeys.isEmpty,
      s"merge: source lacks key columns ${missingKeys.mkString(", ")}")
    require(!ctx.schema.fieldNames.exists(_.startsWith(SrcPrefix)),
      s"merge: target columns may not start with $SrcPrefix")
    if (validate) {
      val dup = source.groupBy(keys.map(col).toIndexedSeq: _*)
        .agg(count(lit(1)).as("n")).where(col("n") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"merge: duplicate source key ${dup.headOption.mkString} — " +
          "a target row matched by two source rows is undefined; " +
          "dedupe the source first")
    }
    def cnd(c: Option[Column]): Column =
      coalesce(c.getOrElse(lit(true)), lit(false))
    // left-join every aux lookup whose join columns the frame carries:
    // a hit-flag aux reads null (→ false via cnd) where no combination
    // matched; a value aux reads null where the scalar was null/empty.
    // Aux frames are distinct ref-combinations — small, AQE broadcasts.
    def withAux(frame: DataFrame): DataFrame =
      aux.filter(_.joinOn.forall { case (_, jc) =>
        frame.columns.contains(jc)
      }).foldLeft(frame) { (df, a) =>
        val on = a.joinOn.map { case (ac, jc) => df(jc) === a.df(ac) }
          .reduce(_ && _)
        df.join(a.df, on, "left")
      }
    // every source column under SrcPrefix; keys pre-cast to the target
    // key types so the equi-join and envelope compare exactly
    val srcP = source.select(source.columns.map { c =>
      val base = if (keys.contains(c)) col(c).cast(ctx.schema(c).dataType)
        else col(c)
      base.as(SrcPrefix + c)
    }.toIndexedSeq: _*).withColumn(MatchedFlag, lit(true))
    val srcKeys = source.select(keys.map(k =>
      col(k).cast(ctx.schema(k).dataType).as(k)).toIndexedSeq: _*)

    // ---- touch detection (find phase) ----
    val tFind = System.nanoTime()
    // ONE envelope-pruned scan of the target serves BOTH halves of the
    // find phase: per-file match counts (touch detection) and the
    // matched key set (insert determination) — scanning the table once,
    // not twice, for the matched+notMatched merge shape the streaming
    // CDC-apply runs every batch
    val hits: Option[DataFrame] =
      if (matched.isEmpty && notMatched.isEmpty) None
      else keyEnvelope(srcKeys, keys).map { range =>
        ctx.snap.where(range)
          .select((StatsManifest.fileKeyCol +:
            keys.map(col)).toIndexedSeq: _*)
          .join(srcKeys.select(keys.map(col).toIndexedSeq: _*), keys,
            "left_semi")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
    val matchedTouched =
      if (matched.isEmpty) Map.empty[String, Long]
      else hits match {
        case None => Map.empty[String, Long]
        case Some(h) => h.groupBy(col("file"))
          .agg(count(lit(1)).as("m")).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      }
    val bsTouched =
      if (notMatchedBySource.isEmpty) Map.empty[String, Long]
      else {
        // conservative: a row satisfying a by-source condition marks its
        // file whether or not it is matched — carried-over rows are
        // bit-exact and net out of CDC. The file key projects FIRST
        // (it is a scan-relation column and would not resolve through
        // the aux joins), then target-only aux lookups join in.
        val bsOr = notMatchedBySource.map(c => cnd(c.condition))
          .reduce(_ || _)
        val snapF = ctx.snap.select((StatsManifest.fileKeyCol +:
          ctx.schema.fieldNames.toSeq.map(col)): _*)
        withAux(snapF).where(bsOr)
          .groupBy(col("file")).agg(count(lit(1)).as("m")).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      }
    val touched = matchedTouched ++
      bsTouched.view.filterKeys(k => !matchedTouched.contains(k)).toMap

    // ---- inserts (source rows with no target key match) ----
    val insRows0 =
      if (notMatched.isEmpty) emptyOf(ctx)
      else {
        val tKeys = hits match {
          case None => srcKeys.limit(0)
          case Some(h) =>
            h.select(keys.map(col).toIndexedSeq: _*).distinct()
        }
        val un = withAux(srcP.join(tKeys,
          keys.map(k => srcP(SrcPrefix + k) === tKeys(k)).reduce(_ && _),
          "left_anti"))
        val conds = notMatched.map(i => cnd(i.condition))
        val withIdx = un.withColumn(ClauseIdx, firstTrueIdx(conds))
          .where(col(ClauseIdx) >= 0)
        withIdx.select(ctx.schema.map { f =>
          val branches = notMatched.zipWithIndex.flatMap { case (ic, i) =>
            ic.values.collectFirst { case (n, v) if n == f.name =>
              (col(ClauseIdx) === i, v) }
          }
          valueChain(branches, lit(null)).cast(f.dataType).as(f.name)
        }.toIndexedSeq: _*)
      }

    // ---- rewrite of touched files ----
    val touchedDf = readFiles(ctx, touched.keys)
    val rewritten =
      if (touched.isEmpty) emptyOf(ctx)
      else {
        val joinCond = keys.map(k =>
          touchedDf(k) === srcP(SrcPrefix + k)).reduce(_ && _)
        val joined = withAux(touchedDf.join(srcP, joinCond, "left"))
        val isM = coalesce(col(MatchedFlag), lit(false))
        val branches: Seq[(Column, Option[Map[String, Column]])] =
          matched.map {
            case MergeUpdate(c, s) => (isM && cnd(c), Some(s.toMap))
            case MergeDelete(c) => (isM && cnd(c), None)
            case _: MergeInsert => throw new IllegalStateException()
          } ++ notMatchedBySource.map {
            case MergeUpdate(c, s) => (!isM && cnd(c), Some(s.toMap))
            case MergeDelete(c) => (!isM && cnd(c), None)
            case _: MergeInsert => throw new IllegalStateException()
          }
        val withIdx = joined.withColumn(ClauseIdx,
          firstTrueIdx(branches.map(_._1)))
        val deleteIdx = branches.zipWithIndex.collect {
          case ((_, None), i) => i }
        val kept =
          if (deleteIdx.isEmpty) withIdx
          else withIdx.where(!col(ClauseIdx)
            .isin(deleteIdx.map(Integer.valueOf): _*))
        kept.select(ctx.schema.map { f =>
          val upd = branches.zipWithIndex.flatMap { case ((_, set), i) =>
            set.flatMap(_.get(f.name)).map(v => (col(ClauseIdx) === i, v))
          }
          valueChain(upd, col(f.name)).cast(f.dataType).as(f.name)
        }.toIndexedSeq: _*)
      }
    // counted separately AND unioned into the replacement: persist so
    // the count pre-populates the cache the rewrite reuses
    val insRows =
      if (notMatched.isEmpty || !countInserts) insRows0
      else insRows0.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val inserted =
        if (notMatched.isEmpty) 0L
        else if (countInserts) insRows.count()
        else -1L
      PhaseStats.find.set((System.nanoTime() - tFind) / 1000000L)
      val replacement = rewritten.unionByName(insRows)
      // CDC over (everything old in touched files, everything new incl.
      // inserts): exceptAll netting reduces that to exactly the
      // row-level changes each clause made
      val res = rewriteWith(ctx, touched, statsCols, bloomCols,
        replacement,
        extraFiles = if (notMatched.nonEmpty) 1 else 0,
        cdc = if (cdf) Some((touchedDf, replacement)) else None,
        // insert clauses make the write set key-dependent; matched and
        // by-source clauses alone tolerate concurrent blind appends
        conflictIfInterimAdds = notMatched.nonEmpty,
        op = "merge")
      res.copy(matchedRows = matchedTouched.valuesIterator.sum,
        insertedRows = inserted)
    } finally {
      if (notMatched.nonEmpty) insRows.unpersist(false)
      hits.foreach(_.unpersist(false))
      ()
    }
  }

  /** Index of the first true condition (−1 if none) — the clause
    * dispatch for first-true-wins semantics. */
  private def firstTrueIdx(conds: Seq[Column]): Column =
    conds.zipWithIndex.tail
      .foldLeft(when(conds.head, lit(0))) { case (acc, (c, i)) =>
        acc.when(c, lit(i))
      }.otherwise(lit(-1))

  /** Chained `when` over (guard, value) branches with a default. */
  private def valueChain(branches: Seq[(Column, Column)],
      default: Column): Column = branches match {
    case Seq() => default
    case (c0, v0) +: rest =>
      rest.foldLeft(when(c0, v0)) { case (acc, (c, v)) =>
        acc.when(c, v)
      }.otherwise(default)
  }

  /** DELETE FROM dir WHERE key IN (keyRows) — erasure by key set (the
    * GDPR shape). `keyRows` needs exactly the `keys` columns. */
  def deleteKeys(spark: SparkSession, dir: String, keyRows: DataFrame,
      keys: Seq[String], statsCols: Seq[String],
      bloomCols: Seq[String] = Nil, cdf: Boolean = true): OpResult = {
    val ctx = open(spark, dir)
    val src = keyRows.select(keys.map(k =>
      col(k).cast(ctx.schema(k).dataType).as(k)).toIndexedSeq: _*)
    val touched = touchedByKeys(ctx, src, keys)
    val old = readFiles(ctx, touched.keys)
    rewriteWith(ctx, touched, statsCols, bloomCols,
      old.join(src, keys, "left_anti"),
      cdc = if (cdf) Some((old.join(src, keys, "left_semi"),
        emptyOf(ctx))) else None,
      op = "delete")
  }

  // ---------------------------------------------------------------- //
  //  Schema evolution: metadata-only ADD / DROP COLUMN                 //
  // ---------------------------------------------------------------- //

  /** ADD COLUMN — metadata-only: commits a schema-only manifest version
    * ([[StatsManifest.commitSchema]]); NO data file is rewritten.
    * Existing files simply lack the column and serve nulls (the
    * explicit-schema read fills them); files written afterwards — by
    * appends, row ops, compaction — carry it. Backfill a non-null
    * value with `update(cond = lit(true), Seq(name -> default))` when
    * wanted; at 100 TB the point is that adding a column costs one
    * manifest commit, not a corpus rewrite. Snapshot reads BEFORE this
    * version keep the old schema (the sidecar is versioned). */
  def addColumn(spark: SparkSession, dir: String, name: String,
      dataType: org.apache.spark.sql.types.DataType): Long = {
    val schema = StatsManifest.tableSchema(spark, dir)
    require(!schema.fieldNames.contains(name),
      s"addColumn: column $name already exists")
    StatsManifest.commitSchema(spark, dir,
      schema.add(name, dataType, nullable = true))
  }

  /** DROP COLUMN — metadata-only: the column disappears from the
    * authoritative schema; the bytes stay in the files (projected away
    * by every read) until rewrites retire them. Stats the manifest
    * keeps for the column become dead weight until the next full
    * `write()` (harmless — `mayMatch` is only consulted for columns a
    * query can reference). */
  def dropColumn(spark: SparkSession, dir: String, name: String): Long = {
    val schema = StatsManifest.tableSchema(spark, dir)
    require(schema.fieldNames.contains(name),
      s"dropColumn: no column $name")
    StatsManifest.commitSchema(spark, dir,
      StructType(schema.filterNot(_.name == name)))
  }

  /** RENAME COLUMN — metadata-only, via column mapping: the parquet
    * bytes keep the column's BIRTH ("physical") name forever; the
    * authoritative schema carries the new LOGICAL name plus the
    * physical name in the field's metadata
    * ([[StatsManifest.PhysicalKey]]), and every reader/writer maps at
    * the parquet boundary ([[GraftParquetFileFormat]] on reads,
    * [[StatsManifest.writePhysical]] on writes). The manifest's stats
    * columns rename to the new logical name in the SAME commit (one
    * O(manifest) checkpoint rewrite — never a data rewrite), so
    * pruning, metadata-only aggregates, blooms and the streaming
    * pushdown keep working under the new name, and DML on the renamed
    * column just works. Partition columns cannot rename (their name is
    * baked into the directory layout). A running stream fails loudly
    * on the schema change and re-pins at restart — the drift guard. */
  def renameColumn(spark: SparkSession, dir: String, name: String,
      newName: String): Long = {
    val schema = StatsManifest.tableSchema(spark, dir)
    require(schema.fieldNames.contains(name),
      s"renameColumn: no column $name")
    require(!schema.fieldNames.contains(newName),
      s"renameColumn: column $newName already exists")
    require(!StatsManifest.tablePartitionCols(spark, dir)
      .exists(_.equalsIgnoreCase(name)),
      s"renameColumn: $name is a partition column — its name is the " +
        "directory layout; rewrite the table to rename it")
    val physical = StatsManifest.physicalName(schema, name)
    val newSchema = StructType(schema.map { f =>
      if (f.name == name)
        f.copy(name = newName, metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putString(StatsManifest.PhysicalKey, physical).build())
      else f
    })
    // rename the manifest stat columns with the schema, in ONE commit:
    // entriesAt(latest) re-keyed lmin__old → lmin__new etc. — the
    // entries' file keys, rows, lengths and values are untouched
    StatsManifest.renameStatsColumns(spark, dir, name, newName,
      newSchema)
  }

  /** WIDEN a column's type — metadata-only: int-family → a wider
    * integral, float → double. Spark's parquet reader upcasts the old
    * files' narrower physical type natively, writers write the widened
    * type going forward, and the manifest's stats are ALREADY stored
    * in width-free domains (integrals as long, floats as double), so
    * pruning is untouched. Anything outside the safe matrix is
    * rejected (a lossy narrowing would corrupt silently). */
  def widenColumn(spark: SparkSession, dir: String, name: String,
      newType: org.apache.spark.sql.types.DataType): Long = {
    import org.apache.spark.sql.types._
    val schema = StatsManifest.tableSchema(spark, dir)
    require(schema.fieldNames.contains(name),
      s"widenColumn: no column $name")
    val cur = schema(name).dataType
    def rank(dt: DataType): Int = dt match {
      case ByteType => 1
      case ShortType => 2
      case IntegerType => 3
      case LongType => 4
      case _ => -1
    }
    val ok = (rank(cur) > 0 && rank(newType) > rank(cur)) ||
      (cur == FloatType && newType == DoubleType)
    require(ok, s"widenColumn: $cur -> $newType is not a safe " +
      "widening (integral -> wider integral, float -> double)")
    StatsManifest.commitSchema(spark, dir, StructType(schema.map(f =>
      if (f.name == name) f.copy(dataType = newType) else f)))
  }

  // ---------------------------------------------------------------- //
  //  CDC: the row-level changefeed between two manifest versions       //
  // ---------------------------------------------------------------- //

  /** The rows that changed between manifest versions `fromVersion`
    * (exclusive) and `toVersion` (inclusive), as a changefeed: the
    * table's columns plus `_change_type` ('insert' | 'delete') and
    * `_commit_version` (the version that committed the change).
    *
    * Two sources per step, cheapest first:
    *  - PRECOMPUTED change files (`_graft_cdc/v%06d-*.parquet`, written
    *    by the ops themselves when `cdf = true`, already netted): the
    *    consumer reads O(changes) — at 100 TB the difference between a
    *    CDC subscriber reading megabytes and re-deriving the diff from
    *    the touched files' gigabytes.
    *  - FALLBACK file-diff netting: added files' rows are inserts,
    *    removed files' rows are deletes, netted multiset-wise
    *    (`exceptAll`) so rows a copy-on-write rewrite carried over
    *    unchanged cancel out — an UPDATE surfaces as its old+new row
    *    pair, pure layout churn nets to zero. Used when change files
    *    are absent (ops run with `cdf = false`, reconciliation commits
    *    from appends, a crash between commit and CDC write) or when a
    *    step spans expired intermediate versions.
    *
    * `rowLevel = false` always uses the raw (unnetted) file diff — the
    * physical churn view. Requires the window's versions retained and
    * removed files' bytes still present for any step that falls back. */
  def changes(spark: SparkSession, dir: String, fromVersion: Long,
      toVersion: Long, rowLevel: Boolean = true): DataFrame = {
    require(fromVersion <= toVersion,
      s"changes: fromVersion $fromVersion > toVersion $toVersion")
    val vs = StatsManifest.versions(spark, dir)
      .filter(v => v >= fromVersion && v <= toVersion)
    require(vs.headOption.contains(fromVersion) &&
      vs.lastOption.contains(toVersion),
      s"changes: versions $fromVersion and/or $toVersion not retained " +
        s"(have: ${vs.mkString(", ")})")
    val schema = StatsManifest.tableSchema(spark, dir)
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def readKeys(ks: Iterable[String]): DataFrame =
      if (ks.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
      // basePath: Hive-partition columns derive from the paths; bytes
      // carry PHYSICAL names, the frame exposes logical
      else StatsManifest.readLogical(spark, dir, schema, ks.toSeq.sorted)
    val nmap = StatsManifest.nameMapOf(schema)
    def aliasCdc(df: DataFrame): DataFrame =
      if (nmap.isEmpty) df
      else df.select((schema.map(f =>
        col(nmap.getOrElse(f.name, f.name)).as(f.name)) ++
        Seq(col("_change_type"), col("_commit_version"))).toIndexedSeq: _*)
    val steps = vs.sliding(2).filter(_.size == 2).map { case Seq(a, b) =>
      // precomputed files describe ONE commit: only valid when the step
      // is a single commit (b = a+1; retention gaps fall back)
      val pre =
        if (rowLevel && b == a + 1) cdcFiles(fs, dir, b) else Seq.empty
      if (pre.nonEmpty)
        aliasCdc(spark.read
          .schema(cdcSchema(StatsManifest.toPhysical(schema)))
          .parquet(pre.map(_.toString): _*))
      else {
        val fa = StatsManifest.readAt(spark, dir, a).keySet
        val fb = StatsManifest.readAt(spark, dir, b).keySet
        val ins = readKeys(fb -- fa)
        val del = readKeys(fa -- fb)
        val (insN, delN) =
          if (rowLevel) (ins.exceptAll(del), del.exceptAll(ins))
          else (ins, del)
        insN.withColumn("_change_type", lit("insert"))
          .unionByName(delN.withColumn("_change_type", lit("delete")))
          .withColumn("_commit_version", lit(b))
      }
    }.toSeq
    if (steps.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        cdcSchema(schema))
    else steps.reduce(_ unionByName _)
  }

  /** STREAMING changefeed: a `readStream` over the precomputed change
    * files — every committed row-level op lands its netted changes as
    * new files under `_graft_cdc/`, and Spark's file stream source
    * discovers them per micro-batch. The CDC consumer (a downstream
    * materialization, an audit sink, a cache invalidator) reads
    * O(changes) continuously, never touching the table's data files.
    * Only ops run with `cdf = true` feed it (reconciliation commits
    * from plain appends don't — route ingest through
    * `Streams.upsertToManifestedTable` or backfill with [[changes]]). */
  def changesStream(spark: SparkSession, dir: String): DataFrame = {
    val cdcPath = new Path(dir, CdcDir)
    val fs = cdcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(cdcPath)
    val schema = StatsManifest.tableSchema(spark, dir)
    val nmap = StatsManifest.nameMapOf(schema)
    val raw = spark.readStream
      .schema(cdcSchema(StatsManifest.toPhysical(schema)))
      .parquet(cdcPath.toString)
    if (nmap.isEmpty) raw
    else raw.select((schema.map(f =>
      col(nmap.getOrElse(f.name, f.name)).as(f.name)) ++
      Seq(col("_change_type"), col("_commit_version"))).toIndexedSeq: _*)
  }

  // ---------------------------------------------------------------- //
  //  Shared machinery                                                 //
  // ---------------------------------------------------------------- //

  /** Flat dir of precomputed change files, named `v%06d-….parquet` by
    * the committing op (staged + renamed in, like every write here).
    * Underscore prefix: invisible to data listings and reconciliation. */
  private[graft] val CdcDir = "_graft_cdc"

  private[graft] def cdcSchema(schema: StructType): StructType =
    StructType(schema.fields).add("_change_type", "string")
      .add("_commit_version", "long")

  private[graft] def cdcFiles(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, version: Long): Seq[Path] = {
    val d = new Path(dir, CdcDir)
    if (!fs.exists(d)) Seq.empty
    else fs.globStatus(new Path(d, f"v$version%06d-*.parquet"))
      .map(_.getPath).toSeq
  }

  /** Row count of a parquet change file: one driver-side footer read
    * (no data pages, no Spark job). */
  private def cdcFileRows(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(p, fs.getConf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** The row count a change-file NAME carries (`…-r<rows>.parquet`),
    * or None for pre-r12 names — the CDC stream budgets
    * maxRowsPerTrigger from this without opening the file. */
  private[graft] def cdcFileNameRows(name: String): Option[Long] = {
    val m = "-r(\\d+)\\.parquet$".r.findFirstMatchIn(name)
    m.map(_.group(1).toLong)
  }

  private final case class Ctx(spark: SparkSession, dir: String,
      version: Long, snap: DataFrame,
      idx: StatsManifest.ManifestFileIndex, schema: StructType,
      stats: Map[String, StatsManifest.FileStats],
      /** Hive partition columns (empty for flat layouts): rewrites go
        * back partitioned and the file moves preserve the `p=…`
        * relative path, so partition-directory pruning keeps working
        * on the replacement files. */
      partCols: Seq[String])

  private def open(spark: SparkSession, dir: String): Ctx =
    phase(PhaseStats.open)(open0(spark, dir))

  private def open0(spark: SparkSession, dir: String): Ctx = {
    val v = StatsManifest.latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"RowOps: $dir is not a manifested table " +
          "(StatsManifest.write it first)"))
    // ONE manifest fold serves both the stats map and the snapshot scan
    val stats = StatsManifest.readAt(spark, dir, v)
    val (snap, idx) =
      StatsManifest.scanAtVersionWithStats(spark, dir, v, stats)
    Ctx(spark, dir, v, snap, idx, snap.schema, stats,
      idx.partitionSchema.fieldNames.toSeq)
  }

  /** (file key → matched rows) for the rows of `matches` — ONE pruned
    * scan; the manifest refutes non-candidate files before tasks
    * launch, and `idx.selected` records how many survived for
    * [[OpResult]]. */
  private def touchedByPredicate(ctx: Ctx,
      matches: DataFrame): Map[String, Long] =
    matches.groupBy(StatsManifest.fileKeyCol)
      .agg(count(lit(1)).as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Per-key min/max envelope of `src` as a range predicate over the
    * target's key columns — None when the source has no non-null first
    * key (nothing can equi-match). A row matching a source key is inside
    * the envelope by definition, so restricting a scan by it is free. */
  private def keyEnvelope(src: DataFrame,
      keys: Seq[String]): Option[Column] = {
    val ext = src.agg(min(col(keys.head)).as("lo0"),
      (max(col(keys.head)).as("hi0") +:
        keys.tail.zipWithIndex.flatMap { case (k, i) =>
          Seq(min(col(k)).as(s"lo${i + 1}"), max(col(k)).as(s"hi${i + 1}"))
        }).toIndexedSeq: _*).collect().head
    if (ext.isNullAt(0)) None
    else Some(keys.zipWithIndex.map { case (k, i) =>
      col(k).between(lit(ext.get(2 * i)), lit(ext.get(2 * i + 1)))
    }.reduce(_ && _))
  }

  /** Touch detection for key-set ops: files holding ≥1 row whose key is
    * in `src`. The source's key envelope becomes a range predicate
    * FIRST, so manifest pruning (and parquet row-group skipping) cut
    * the scan before the semi join runs. */
  private def touchedByKeys(ctx: Ctx, src: DataFrame,
      keys: Seq[String]): Map[String, Long] =
    keyEnvelope(src, keys) match {
      case None => Map.empty // empty source → nothing touched
      case Some(range) =>
        // `_metadata` is a scan-relation column: project the file key
        // BEFORE the join (it doesn't resolve through one)
        ctx.snap.where(range)
          .select((StatsManifest.fileKeyCol +:
            keys.map(col)).toIndexedSeq: _*)
          .join(src.select(keys.map(col).toIndexedSeq: _*), keys,
            "left_semi")
          .groupBy(col("file")).agg(count(lit(1)).as("m")).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
    }

  private def readFiles(ctx: Ctx, keys: Iterable[String]): DataFrame =
    if (keys.isEmpty) emptyOf(ctx)
    // basePath keeps Hive-partition columns derivable from the paths;
    // bytes carry PHYSICAL names, the frame exposes logical
    else StatsManifest.readLogical(ctx.spark, ctx.dir, ctx.schema,
      keys.toSeq.sorted)

  private def emptyOf(ctx: Ctx): DataFrame =
    ctx.spark.createDataFrame(
      ctx.spark.sparkContext.emptyRDD[Row], ctx.schema)

  /** Stage `replacement`, commit (tombstone touched + adopt staged under
    * final keys), rename the staged files in, clean staging; then land
    * the netted change files (`cdc` = raw (deletes, inserts) — rows a
    * rewrite carried over cancel via `exceptAll` before writing). CDC
    * lands AFTER the data commit: a crash in between loses only the
    * precomputed files, and [[changes]] falls back to file-diff netting
    * for that version. */
  private def rewriteWith(ctx: Ctx, touched: Map[String, Long],
      statsCols: Seq[String], bloomCols: Seq[String],
      replacement0: DataFrame, extraFiles: Int = 0,
      cdc: Option[(DataFrame, DataFrame)] = None,
      /** ops whose write set depends on which KEYS exist (insert
        * determination) conflict with concurrent appends; predicate
        * ops tolerate them (serialize before — see commitFileOps). */
      conflictIfInterimAdds: Boolean = false,
      /** operation kind for the version's `_op.txt` sidecar. */
      op: String = ""): OpResult = {
    // CHECK constraints ride inline in the rewrite job (r13): every
    // row-level op's replacement frame — updated rows, merge inserts,
    // overwrite data, carried-over kept rows — validates at write
    // time, zero extra pass (Constraints.enforce). The CDC frames are
    // derived, never enforced.
    val replacement1 = Constraints.enforce(ctx.spark, ctx.dir,
      replacement0)
    val cdc1 = cdc.map { case (d, i) =>
      (if (d eq replacement0) replacement1 else d,
        if (i eq replacement0) replacement1 else i)
    }
    // the replacement and CDC frames are consumed by SEVERAL actions
    // (staged write, exceptAll netting twice per side, CDC write) and
    // each un-cached action re-executes the whole op plan from the
    // source scans up — at a streaming CDC-apply cadence that fixed
    // re-computation dominated batch latency (r10 verdict: cdc_apply
    // p50 3x its siblings). Persist once, unpersist on the way out;
    // MEMORY_AND_DISK so a huge rewrite spills instead of evicting.
    val cached = scala.collection.mutable.Buffer.empty[DataFrame]
    def cache(df: DataFrame): DataFrame = {
      val c = df.persist(org.apache.spark.storage.StorageLevel
        .MEMORY_AND_DISK)
      cached += c
      c
    }
    try rewriteCached(ctx, touched, statsCols, bloomCols,
      cache(replacement1),
      cdc1.map { case (d, i) =>
        (if (d eq replacement1) cached.head else cache(d),
          if (i eq replacement1) cached.head else cache(i))
      }, extraFiles, conflictIfInterimAdds, op)
    finally cached.foreach(_.unpersist(false))
  }

  private def rewriteCached(ctx: Ctx, touched: Map[String, Long],
      statsCols: Seq[String], bloomCols: Seq[String],
      replacement: DataFrame, cdc: Option[(DataFrame, DataFrame)],
      extraFiles: Int, conflictIfInterimAdds: Boolean,
      op: String): OpResult = {
    val totalFiles = ctx.stats.size.toLong
    val candidates = ctx.idx.selected.get()
    if (touched.isEmpty && extraFiles == 0)
      return OpResult(ctx.version, totalFiles, candidates, 0L, 0L, 0L)
    val matched = touched.valuesIterator.sum
    if (touched.isEmpty && replacement.isEmpty)
      return OpResult(ctx.version, totalFiles, candidates, 0L, 0L, 0L)
    val dirPath = new Path(ctx.dir)
    val fs = dirPath.getFileSystem(
      ctx.spark.sparkContext.hadoopConfiguration)
    // staging is PER-OP unique: concurrent writers (a streaming sink
    // racing batch DML — the rebase machinery exists exactly for this)
    // must never clobber each other's staged bytes; a shared
    // mode-overwrite dir did (found by ConcurrentWriterPropSpec)
    val staging = new Path(
      ctx.dir + s".rowops-${java.util.UUID.randomUUID()}")
    // output file count: one-per-touched-input (preserves a healthy
    // layout's file-size distribution), BYTES-BOUNDED below — a table
    // fragmented by scattered streaming upserts would otherwise
    // perpetuate its tiny files forever, and every later op pays a
    // task per file. The manifest carries each file's length (flen),
    // so the bound is a pure metadata read; unknown lengths (pre-flen
    // manifests) keep the old rule. Only PATHOLOGICAL layouts collapse
    // (sum-of-touched-bytes / target), healthy 100MB files pass
    // through 1:1 — the copy-on-write rewrite doubles as incremental
    // compaction exactly when compaction is needed.
    val targetBytes = ctx.spark.conf
      .get("spark.graft.rowops.targetFileBytes", (1L << 26).toString)
      .toLong
    val touchedBytes = touched.keysIterator
      .map(k => ctx.stats.get(k).map(_.len).getOrElse(-1L)).toSeq
    val n =
      if (touchedBytes.isEmpty || touchedBytes.contains(-1L))
        math.max(1, touched.size + extraFiles)
      else math.max(1, math.min(touched.size + extraFiles,
        math.ceil(touchedBytes.sum.toDouble / targetBytes).toInt))
    // staged bytes carry PHYSICAL names (the read half aliases back)
    val replacementPhys =
      StatsManifest.writePhysical(replacement, ctx.schema)
    val writer =
      if (ctx.partCols.isEmpty) replacementPhys.repartition(n).write
      else replacementPhys // co-locate partition values: bounded files
        .repartition(n, ctx.partCols.map(col).toIndexedSeq: _*)
        .write.partitionBy(ctx.partCols: _*)
    phase(PhaseStats.stage)(writer.mode("overwrite")
      .parquet(staging.toString))
    // recursive: a partitioned rewrite stages under p=… subdirs; the
    // move preserves the relative path so directory pruning still works
    val stagingKey = StatsManifest.fileKey(fs.makeQualified(staging))
    // listStatus walk (not the recursive listFiles iterator): the
    // latter shells out per file on the local FS — see
    // StatsManifest.listDataFiles
    val staged = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Path]
      def walk(d: Path): Unit = fs.listStatus(d).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.startsWith("part-")) out += st.getPath
      }
      walk(staging)
      out.toSeq
    }
    def finalPath(src: Path): Path = {
      val rel = StatsManifest.fileKey(src).stripPrefix(stagingKey)
        .stripPrefix("/")
      val parent = rel.split("/").dropRight(1)
      val base = new Path(rel).getName
      parent.foldLeft(dirPath)(new Path(_, _)) match {
        case d => new Path(d, s"rw-$base")
      }
    }
    val adds = staged.map { p =>
      p -> StatsManifest.fileKey(fs.makeQualified(finalPath(p)))
    }
    val (ver, addedRows) = phase(PhaseStats.commit) {
      val r = StatsManifest.commitFileOps(ctx.spark, ctx.dir,
        adds, touched.keySet, statsCols, bloomCols,
        expectedVersion = Some(ctx.version),
        addsBasePath = if (ctx.partCols.isEmpty) None
          else Some(staging.toString),
        conflictIfInterimAdds = conflictIfInterimAdds,
        // the sidecar DECLARES whether precomputed change files follow
        // this commit: the CDC write lands moments AFTER the rename (a
        // crash in between falls back to changes() netting), so a live
        // CDC stream that sees the version first must know whether to
        // wait for the files or fail toward the backfill
        op = if (op.isEmpty) None
          else Some(if (cdc.isDefined) op else s"$op-nocdf"))
      // rename in ONLY the committed files: an empty staged file (a
      // replacement with no rows for that slot) has no manifest entry,
      // and moving it in would orphan an unmanifested file in the
      // table dir — it dies with the staging cleanup instead
      adds.foreach { case (src, key) =>
        if (r.addKeys.contains(key)) {
          val dst = finalPath(src)
          fs.mkdirs(dst.getParent)
          require(fs.rename(src, dst),
            s"RowOps: rename $src -> $dst failed; staged copy intact " +
              "and the committed manifest names the final keys — " +
              "finish the renames")
        }
      }
      fs.delete(staging, true)
      (r.version, r.addedRows)
    }
    phase(PhaseStats.cdc)(cdc.foreach { case (del0, ins0) =>
      writeCdcFiles(ctx.spark, ctx.dir, ctx.schema, del0, ins0, ver)
    })
    OpResult(ver, totalFiles, candidates, touched.size.toLong, matched,
      addedRows)
  }

  /** Net `ins − del` multiset-wise and land the result as this
    * version's precomputed change files — the CDC write every
    * committed row-level op (and r13: RESTORE) performs moments after
    * its manifest commit. Columns align POSITIONALLY to the table's
    * order first (a using-columns join moves its keys to the front,
    * which would mis-pair columns, widen types, and break netting);
    * the ±1-weight one-pass netting computes the same multiset
    * difference two exceptAlls would at half the shuffles; change
    * files carry PHYSICAL data-column names like the data files
    * (readers alias back), and each file's ROW COUNT rides in its
    * name for the CDC stream's zero-open row budgets. */
  private[sources] def writeCdcFiles(spark: SparkSession, dir: String,
      schema: StructType, del0: DataFrame, ins0: DataFrame,
      ver: Long): Unit = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cols = schema.fieldNames.map(col).toIndexedSeq
    val del = del0.select(cols: _*)
    val ins = ins0.select(cols: _*)
    // grouping and exceptAll share row-equality semantics (NaN/-0.0
    // normalization; neither supports map columns)
    val net = ins.withColumn("__w", lit(1L))
      .unionByName(del.withColumn("__w", lit(-1L)))
      .groupBy(cols: _*).agg(sum(col("__w")).as("__n"))
      .where(col("__n") =!= 0L)
      .withColumn("_change_type",
        when(col("__n") > 0L, lit("insert")).otherwise(lit("delete")))
      // a duplicated row nets with multiplicity |n| — replicate
      .withColumn("__i",
        explode(sequence(lit(1L), abs(col("__n")))))
      .drop("__n", "__i")
      .withColumn("_commit_version", lit(ver))
    val cdcStage = new Path(
      dir + s".cdcstage-${java.util.UUID.randomUUID()}")
    val netPhys = StatsManifest.writePhysical(net, schema)
    netPhys.coalesce(1).write.mode("overwrite")
      .parquet(cdcStage.toString)
    val cdcDir = new Path(dirPath, CdcDir)
    fs.mkdirs(cdcDir)
    fs.listStatus(cdcStage).map(_.getPath)
      .filter(_.getName.startsWith("part-")).zipWithIndex
      .foreach { case (src, i) =>
        // row count read once from the staged footer — driver-side,
        // O(1); pre-r12 names (no -r suffix) read as unknown
        val rows = cdcFileRows(fs, src)
        val dst = new Path(cdcDir, f"v$ver%06d-$i%05d-r$rows.parquet")
        require(fs.rename(src, dst),
          s"RowOps: CDC rename $src -> $dst failed — changes() will " +
            "fall back to file-diff netting for this version")
      }
    fs.delete(cdcStage, true)
  }

  /** Result of [[restore]]: the target version, the NEW version the
    * restore committed, and the file/row deltas at file granularity
    * (rows from manifest counts — no data scan). */
  final case class RestoreResult(restoredTo: Long, newVersion: Long,
      filesReinstated: Long, filesDropped: Long,
      rowsReinstated: Long, rowsDropped: Long)

  /** RESTORE the table to an earlier retained version — the write half
    * of time travel (`RESTORE TABLE t TO VERSION AS OF n`): commits a
    * NEW version whose live file set, schema and manifest entries are
    * exactly the target version's, leaving history intact (the
    * restore itself is time-travelable and VACUUM-able). ZERO data
    * scan on the commit path: the target's manifest entries fold in
    * one distributed pass and commit as a full checkpoint; files the
    * current version holds but the target doesn't become tombstones
    * (physically retained for snapshots, reclaimed by expire), files
    * the target holds but the current version dropped are re-adopted
    * in place. Fails LOUDLY when the target's files were vacuumed
    * (`readAt` rejects an expired version; an existence sweep rejects
    * reclaimed bytes) — never a partial restore.
    *
    * CDC (`cdf = true`): the netted row diff (rows of dropped files as
    * deletes, rows of reinstated files as inserts, multiset-netted so
    * rows common to both cancel) lands as the new version's change
    * files, read under the RESTORED schema — a downstream CDC consumer
    * follows a restore like any other mutation. O(diff bytes), the
    * only data this op reads. The version-offset TABLE stream treats
    * the restore like any mutating commit: loud error toward the CDC
    * feed (`ignoreChanges` to accept adds only).
    *
    * Optimistic concurrency: the commit claims exactly
    * `latest + 1`; a racing writer surfaces as
    * ConcurrentModificationException and the caller re-runs against
    * the new latest (the op re-analyzes, so a retry is always
    * semantically fresh). */
  def restore(spark: SparkSession, dir: String, toVersion: Long,
      cdf: Boolean = true): RestoreResult = {
    val latest = StatsManifest.latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"restore: $dir is not a manifested table"))
    require(toVersion <= latest,
      s"restore: version $toVersion is ahead of the latest ($latest)")
    // rejects an expired target with the retention story
    val targetStats = StatsManifest.readAt(spark, dir, toVersion)
    if (toVersion == latest)
      return RestoreResult(toVersion, latest, 0L, 0L, 0L, 0L)
    val liveStats = StatsManifest.readAt(spark, dir, latest)
    val targetKeys = targetStats.keySet
    val liveKeys = liveStats.keySet
    val reinstated = targetKeys -- liveKeys
    val droppedF = liveKeys -- targetKeys
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val missing = reinstated.filter(k => !fs.exists(new Path(k)))
    require(missing.isEmpty,
      s"restore: ${missing.size} data file(s) of version $toVersion " +
        s"no longer exist (vacuumed past the target — e.g. " +
        s"${missing.headOption.getOrElse("")}); the table is UNCHANGED")
    // the restored schema: the target's sidecar, else inference over
    // the target's own files (pre-sidecar versions)
    val schema = StatsManifest.schemaAt(spark, dir, toVersion)
      .getOrElse(spark.read.option("basePath", dir)
        .parquet(targetKeys.toSeq.sorted: _*).schema)
    // everything physically present but not live after the restore
    // stays denied: current tombstones, the dropped live files, and
    // the target's own tombstones (some may be gone — denying a
    // nonexistent key is harmless and self-trims on reconciliation)
    val removed = (StatsManifest.removedLatest(spark, dir) ++ liveKeys ++
      StatsManifest.removedAt(spark, dir, toVersion)) -- targetKeys
    val entries = StatsManifest.entriesAt(spark, dir, toVersion)
    val newV = StatsManifest.commitVersion(spark, dir, entries, removed,
      Some(schema), expected = Some(latest),
      op = Some(if (cdf) "restore" else "restore-nocdf"))
    if (cdf && (reinstated.nonEmpty || droppedF.nonEmpty)) {
      // the only data this op reads: the DIFFERING files, under the
      // restored schema (dropped newer files null-fill removed columns
      // and project extras away — the batch time-travel convention)
      def readSet(keys: Set[String]): DataFrame =
        if (keys.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else StatsManifest.readLogical(spark, dir, schema,
          keys.toSeq.sorted)
      writeCdcFiles(spark, dir, schema,
        readSet(droppedF), readSet(reinstated), newV)
    }
    spark.catalog.refreshByPath(dir)
    RestoreResult(toVersion, newV,
      reinstated.size.toLong, droppedF.size.toLong,
      reinstated.iterator.map(k => targetStats(k).rows).sum,
      droppedF.iterator.map(k => liveStats(k).rows).sum)
  }
}
