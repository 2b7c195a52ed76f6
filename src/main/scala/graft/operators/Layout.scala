package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for scan locality — the write-path lever that
  * makes parquet min/max pruning work on MORE than the leading sort key.
  *
  * At 100 TB the scan you avoid is the cheapest scan: parquet readers
  * skip whole row groups whose column min/max excludes the filter, and
  * file-listing layers skip whole files. A linear `sortWithinPartitions
  * (a)` layout makes column `a` prunable and leaves every other column's
  * min/max spanning the full domain — a filter on `b` reads everything.
  * Z-ORDER (Morton-order) clustering interleaves the bits of the
  * columns' quantile-bucket ranks, so a contiguous z-range is a small
  * hyper-rectangle in value space: EVERY clustered column's per-file
  * extent shrinks to ~domain/P^(1/k) (k columns, P files) instead of one
  * column at domain/P and the rest at full domain. The trade is
  * explicit: the leading column's extent grows from domain/P to
  * domain/P^(1/k) — z-order buys pruning on all k dims by giving up
  * perfection on one.
  *
  * This is the same layout primitive lakehouse table formats expose as
  * `OPTIMIZE ... ZORDER BY`; here it is a plain DataFrame→DataFrame
  * operator any writer can use. Everything is Spark-first and
  * codegen-friendly:
  *
  *  - ONE `approxQuantile` pass computes all columns' bucket boundaries
  *    (driver holds k × (2^bits − 1) doubles — k·255 for the default
  *    8 bits — broadcast as array literals; no global sort, no window).
  *  - Bucket rank per row = `aggregate(boundaries, 0, acc + (v > b))` —
  *    a codegen'd O(2^bits) fold over an array literal, scan-local.
  *  - Bit interleave = an unrolled sum of shift/mask terms (bits × k
  *    integer ops per row, whole-stage codegen).
  *  - `repartitionByRange(z)` + `sortWithinPartitions(z)`: range
  *    boundaries come from Spark's reservoir sampling of z, so output
  *    partitions (→ files) are balanced even when the z-space is not.
  *
  * NULL ordering: null values bucket to rank 0 (they sort first, exactly
  * like a linear sort layout). Column types: numerics order naturally;
  * dates/timestamps order by epoch (`unix_date`/`unix_micros` — a plain
  * double cast is illegal ANSI); strings and other types get an
  * `xxhash64` surrogate — range locality is meaningless for a hash, but
  * equal values still co-locate, which is what point-predicate pruning
  * (`WHERE lang = 'en'`) needs. A silent `cast("double")` would have
  * ranked every string row 0.
  */
object Layout {

  /** The z-value (Morton code) column for `cols`, using quantile-bucket
    * ranks of `bits` bits per column. Boundaries are computed from `df`
    * with one `approxQuantile` pass (relative error `quantileErr`). */
  def zorderValue(df: DataFrame, cols: Seq[String], bits: Int = 8,
      quantileErr: Double = 0.001): Column = {
    require(cols.nonEmpty, "zorderValue: no columns")
    require(bits >= 1 && bits * cols.size <= 62,
      s"zorderValue: bits=$bits × ${cols.size} cols must fit a long")
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    // one scan for every column's boundaries; each column is first made
    // double-ORDERABLE by type (layout needs order, not exact values)
    import org.apache.spark.sql.types._
    def orderable(c: String): Column = df.schema(c).dataType match {
      case _: NumericType | BooleanType => col(c).cast("double")
      case DateType => unix_date(col(c)).cast("double")
      case TimestampType | TimestampNTZType => unix_micros(
        col(c).cast("timestamp")).cast("double")
      case _ => xxhash64(col(c)).cast("double") // equal values co-locate
    }
    val doubled = df.select(cols.map(c => orderable(c).as(c)): _*)
    val bounds = doubled.stat.approxQuantile(cols.toArray, probs, quantileErr)
    val ranks = cols.zip(bounds).map { case (c, bs) =>
      // rank = #boundaries strictly below the value: codegen'd fold over
      // an array literal; nulls → 0 (sort-first, as in a linear layout).
      // Same orderable() transform as the boundary pass, or ranks and
      // boundaries would live on different scales.
      val v = orderable(c)
      val bs2 = bs.distinct.sorted
      val cmp = aggregate(lit(bs2), lit(0),
        (acc, b) => acc + when(v > b, 1).otherwise(0))
      // Rescale to the full bit width: a low-cardinality column's
      // duplicate quantile boundaries collapse under distinct, leaving
      // ranks 0..B for small B — i.e. only the LOW bits — while a
      // high-cardinality column spans 0..2^bits-1. Unscaled, the
      // interleave goes lopsided: the small column's bits all land in
      // the least-significant z positions and it never influences which
      // partition a row falls in. rank·(2^bits−1)/B spreads every
      // column over the same 0..2^bits-1 range.
      val scaled = floor(cmp * (n - 1) / math.max(bs2.length, 1))
        .cast("int")
      when(v.isNull, 0).otherwise(scaled)
    }
    // Morton interleave: bit i of column j lands at position i*k + j
    val k = cols.size
    val terms = for {
      (r, j) <- ranks.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(r.cast("long"), i).bitwiseAND(1L), i * k + j)
    terms.reduce(_ + _)
  }

  /** Rewrite `df` into `numPartitions` z-ordered partitions on `cols` —
    * write the result with any file sink and every clustered column's
    * per-file min/max tightens to ~domain/P^(1/k). Row content is
    * unchanged; only the physical order moves. */
  def zorder(df: DataFrame, cols: Seq[String], numPartitions: Int,
      bits: Int = 8, quantileErr: Double = 0.001): DataFrame = {
    require(numPartitions >= 1, s"zorder: numPartitions=$numPartitions")
    val zc = "__graft_zvalue"
    df.withColumn(zc, zorderValue(df, cols, bits, quantileErr))
      .repartitionByRange(numPartitions, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
  }

  /** Z-order `df` on `cols`, write it to `dir` as parquet, and record a
    * per-file min/max stats manifest for the clustered columns — read it
    * back with [[graft.sources.StatsManifest.scan]] and point/range
    * predicates on ANY clustered column prune whole FILES at planning
    * time (LayoutSpec r8 finding: parquet footers alone only ever prune
    * row groups inside already-launched tasks). */
  def zorderWrite(df: DataFrame, cols: Seq[String], dir: String,
      numPartitions: Int, bits: Int = 8,
      quantileErr: Double = 0.001): Unit = {
    zorder(df, cols, numPartitions, bits, quantileErr)
      .write.mode("overwrite").parquet(dir)
    graft.sources.StatsManifest.write(df.sparkSession, dir, cols)
  }

  /** IN-PLACE `OPTIMIZE ... ZORDER BY`: rewrite the parquet directory
    * `dir` z-ordered on `cols` into ~`targetBytes`-sized files and
    * refresh the stats manifest — the periodic maintenance pass that
    * turns a day's worth of small appended files back into a pruned,
    * clustered layout. Returns (filesBefore, filesAfter).
    *
    * Swap protocol on a plain FileSystem (no transaction log): (1) the
    * clustered copy is FULLY written to `<dir>.optimize` staging;
    * (2) the old data files rename into a `.graft_trash` subdir (hidden
    * from readers — dot prefix); (3) staged files rename in; (4) trash
    * and staging delete; (5) manifest recomputed. Run in a maintenance
    * window, like the dedup-index compaction: a reader listing between
    * (2) and (3) sees a partial directory. Crash recovery is mechanical
    * and loss-free at every step — the data always exists in full in at
    * least one of (staging ∪ live) or (trash ∪ live): before (2)
    * completes, restore the `.graft_trash` files into `dir`; after (3)
    * begins,
    * finish moving staged files in and delete the trash.
    *
    * `deferDelete = true` (manifested tables whose readers all go
    * through `StatsManifest.scan` / format "graft-manifest"): the old
    * layout is TOMBSTONED in one atomic manifest commit instead of
    * physically swapped — no reader window at all, snapshots at earlier
    * versions stay readable across the OPTIMIZE (the lakehouse
    * contract), `RowOps.changes` nets the layout churn to zero, and
    * `StatsManifest.expire` reclaims the old bytes on the retention
    * cadence. Files tombstoned by earlier row-level ops are never
    * optimize INPUT in either mode (their rows are dead); in physical
    * mode they are deleted with the old layout. */
  def optimize(spark: org.apache.spark.sql.SparkSession, dir: String,
      cols: Seq[String], targetBytes: Long = 128L << 20, bits: Int = 8,
      quantileErr: Double = 0.001, deferDelete: Boolean = false): (Int, Int) = {
    require(targetBytes >= 1L, s"optimize: targetBytes=$targetBytes")
    import org.apache.hadoop.fs.Path
    import graft.sources.StatsManifest
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the version this pass ANALYZES (tombstones + listing below derive
    // from it): a deferDelete commit is only sound as analyzed+1, else a
    // racing RowOps/ingest commit's adds and tombstones are lost
    val analyzedVersion = StatsManifest.versions(spark, dir).lastOption
    // a file tombstoned by a row-level op holds DEAD rows kept only for
    // snapshots/CDC: it is never optimize input (reading it would
    // resurrect deleted rows) and in physical mode it dies with the old
    // layout (old snapshots are invalidated anyway)
    val tomb = StatsManifest.removedLatest(spark, dir)
    val listed = fs.listStatus(dirPath).filter(st => st.isFile &&
      !st.getPath.getName.startsWith("_") &&
      !st.getPath.getName.startsWith("."))
    val old = listed.filterNot(st =>
      tomb.contains(StatsManifest.fileKey(st.getPath)))
    if (old.isEmpty) return (0, 0)
    val bytes = old.map(_.getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    // bytes carry PHYSICAL names (rename mapping): read and rewrite
    // physical — a compaction moves rows, it never renames; the
    // caller's cluster columns are logical and map here
    val logical = StatsManifest.tableSchema(spark, dir)
    val zcols = cols.map(c => StatsManifest.physicalName(logical, c))
    val df = spark.read.schema(StatsManifest.toPhysical(logical))
      .parquet(old.map(_.getPath.toString).toIndexedSeq: _*)
    val staging = new Path(dir + ".optimize")
    zorder(df, zcols, n, bits, quantileErr)
      .write.mode("overwrite").parquet(staging.toString)
    val staged = fs.listStatus(staging)
      .map(_.getPath).filter(_.getName.startsWith("part-"))
    if (deferDelete) {
      // lakehouse-style OPTIMIZE: one atomic manifest commit tombstones
      // the whole old layout and adopts the clustered files — snapshots
      // at earlier versions stay readable (expire reclaims the bytes),
      // and CDC nets the pure layout churn to zero. Readers must go
      // through the manifest (StatsManifest.scan / format
      // "graft-manifest"); plain spark.read.parquet(dir) would see both
      // layouts — that population keeps the default physical swap.
      val adds = staged.zipWithIndex.map { case (src, i) =>
        src -> StatsManifest.fileKey(fs.makeQualified(
          new Path(dirPath, f"opt-$i%05d-${src.getName}")))
      }.toSeq
      // stats config comes from the manifest itself: the commit must
      // reproduce the existing column set regardless of which columns
      // the caller clusters by
      val (sc, bc) = StatsManifest.manifestColumns(spark, dir)
      val r = StatsManifest.commitFileOps(spark, dir, adds,
        old.map(st => StatsManifest.fileKey(st.getPath)).toSet, sc, bc,
        expectedVersion = analyzedVersion, op = Some("optimize"))
      // only committed files move in (an empty staged slot — a sparse
      // z-range partition — has no manifest entry; see FileOpsCommit)
      adds.zipWithIndex.foreach { case ((src, key), i) =>
        if (r.addKeys.contains(key)) {
          val dst = new Path(dirPath, f"opt-$i%05d-${src.getName}")
          require(fs.rename(src, dst),
            s"optimize: rename $src -> $dst failed; staged copy intact and " +
              "the committed manifest names the final keys — finish the renames")
        }
      }
      fs.delete(staging, true)
      return (old.length, r.addKeys.size)
    }
    val trash = new Path(dirPath, ".graft_trash")
    fs.mkdirs(trash)
    (old ++ listed.filter(st =>
      tomb.contains(StatsManifest.fileKey(st.getPath)))).foreach { st =>
      require(fs.rename(st.getPath, new Path(trash, st.getPath.getName)),
        s"optimize: trash rename ${st.getPath} failed; nothing lost — " +
          "restore .graft_trash and re-run")
    }
    staged.zipWithIndex.foreach { case (src, i) =>
      // fresh names: no collision with anything the trash held
      val dst = new Path(dirPath, f"opt-$i%05d-${src.getName}")
      require(fs.rename(src, dst),
        s"optimize: rename $src -> $dst failed; staged copy intact — " +
          "finish the swap by hand or re-run after restoring trash")
    }
    fs.delete(trash, true)
    fs.delete(staging, true)
    graft.sources.StatsManifest.write(spark, dir, cols)
    (old.length, staged.length)
  }

  /** COMMIT-TIME auto-compaction: the policy a per-micro-batch append
    * sink folds into its own writer loop so a long-lived streaming
    * table stays bounded WITHOUT anyone remembering to run OPTIMIZE.
    * A streaming sink lands one small file per (batch × partition)
    * forever — 10⁵ commits later every scan schedules 10⁵ tasks. This
    * pass is MANIFEST-DRIVEN (no directory listing at all — the policy
    * check is a driver-side fold of the snapshot the committer just
    * derived): group the LIVE sub-`smallBytes` files by parent
    * directory (partition dir, or the root for flat layouts), and when
    * any group holds at least `minFiles` of them, bin-pack those
    * groups into ~`targetBytes` files under ONE deferDelete-style
    * manifest commit (tombstone + adopt — snapshots stay readable, CDC
    * nets the churn to zero, `expire` reclaims bytes on the retention
    * cadence, and the version-offset streams skip the net-zero
    * 'optimize' commit via its op sidecar).
    *
    * `exclude`: file keys that must NOT compact this round — the
    * ingest sink passes the files its CURRENT batch just wrote, because
    * a crash between this compaction and the batch's WAL commit would
    * replay the batch, whose deterministic-name rewrite would then
    * RE-ADD rows the compaction already carried into packed files
    * (duplicates). Older batches' files are fair game: their WAL
    * entries are committed and they never replay.
    *
    * Optimistic: `expectedVersion` (default: the latest at analysis)
    * rides [[graft.sources.StatsManifest.commitFileOps]]'s rebase —
    * disjoint concurrent commits carry through; a true conflict throws
    * ConcurrentModificationException and the caller simply retries at
    * a later commit (the policy is idempotent). Returns
    * (filesCompacted, filesWritten). */
  def autoCompact(spark: org.apache.spark.sql.SparkSession, dir: String,
      minFiles: Int, targetBytes: Long = 1L << 26,
      smallBytes: Long = -1L, exclude: Set[String] = Set.empty,
      expectedVersion: Option[Long] = None,
      /** restrict to partitions whose Hive dir path carries EVERY
        * `name=value` segment — the `OPTIMIZE t WHERE p = v` scope
        * (a backfill recompacts the partitions it touched, not the
        * table). Empty = all partitions. */
      partitionSpec: Seq[(String, String)] = Nil): (Int, Int) = {
    require(minFiles >= 2, s"autoCompact: minFiles=$minFiles")
    require(targetBytes >= 1L, s"autoCompact: targetBytes=$targetBytes")
    val small0 = if (smallBytes < 0L) targetBytes else smallBytes
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions.col
    import graft.sources.StatsManifest
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val analyzed =
      expectedVersion.orElse(StatsManifest.versions(spark, dir).lastOption)
    // the policy check: pure manifest metadata (keys + flen), O(files)
    // driver-side; pre-flen entries (len<0) are left alone
    val stats = StatsManifest.read(spark, dir)
    def parentOf(k: String): String = k.substring(0, k.lastIndexOf('/'))
    val specSegs = partitionSpec.map { case (n, v) => s"$n=$v" }
    def inScope(parent: String): Boolean =
      specSegs.isEmpty || {
        val segs = parent.split('/').toSet
        specSegs.forall(segs.contains)
      }
    val chosen = stats.iterator
      .filter { case (k, st) =>
        st.len >= 0L && st.len < small0 && !exclude.contains(k)
      }
      .toSeq.groupBy(kv => parentOf(kv._1))
      .filter { case (parent, fs) =>
        fs.size >= minFiles && inScope(parent) }
    if (chosen.isEmpty) return (0, 0)
    val keys = chosen.valuesIterator.flatMap(_.map(_._1)).toSeq.sorted
    // bytes carry PHYSICAL names — read and rewrite physical (rows
    // move, names don't)
    val schema = StatsManifest.toPhysical(
      StatsManifest.tableSchema(spark, dir))
    val partCols = StatsManifest.tablePartitionCols(spark, dir)
    val df = spark.read.option("basePath", dir).schema(schema)
      .parquet(keys: _*)
    val bytes = chosen.valuesIterator.flatMap(_.map(_._2.len)).sum
    // flat: bytes-bound the output; partitioned: one task per chosen
    // partition dir (partitionBy splits per value, so each partition
    // packs to one file — its small tail is < minFiles × smallBytes)
    val n =
      if (partCols.isEmpty)
        math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      else chosen.size
    val staging = new Path(
      dir + s".autocompact-${java.util.UUID.randomUUID()}")
    val writer =
      if (partCols.isEmpty) df.repartition(n).write
      else df.repartition(n, partCols.map(col): _*)
        .write.partitionBy(partCols: _*)
    writer.mode("overwrite").parquet(staging.toString)
    val staged = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Path]
      def walk(d: Path): Unit = fs.listStatus(d).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.startsWith("part-")) out += st.getPath
      }
      walk(staging)
      out.toSeq
    }
    val stagingKey = StatsManifest.fileKey(fs.makeQualified(staging))
    def finalPath(src: Path): Path = {
      val rel = StatsManifest.fileKey(src).stripPrefix(stagingKey)
        .stripPrefix("/")
      val parent = rel.split("/").dropRight(1)
      val base = new Path(rel).getName
      new Path(parent.foldLeft(dirPath)(new Path(_, _)), s"ac-$base")
    }
    // RENAME FIRST, COMMIT AFTER: manifest-routed readers cannot see a
    // data file the manifest doesn't name, so an `ac-*` file renamed
    // into place before its commit is invisible — a crash anywhere in
    // this window leaves the table fully readable at the old snapshot
    // and at worst some unmanifested orphans (which reconciliation
    // refuses to adopt and VACUUM reclaims — StatsManifest.update /
    // vacuumOrphans). The inverse order (commit first) had a window
    // where the live manifest named files absent from their final
    // paths: any reader planning there hit the vanished-file error and
    // a crash left the table unreadable until manual repair.
    val adds = staged.map { src =>
      val dst = fs.makeQualified(finalPath(src))
      fs.mkdirs(dst.getParent)
      require(fs.rename(src, dst),
        s"autoCompact: rename $src -> $dst failed; staged copy intact " +
          "and nothing committed — clean the ac-* files or re-run")
      dst -> StatsManifest.fileKey(dst)
    }
    val (sc, bc) = StatsManifest.manifestColumns(spark, dir)
    val r =
      try StatsManifest.commitFileOps(spark, dir, adds, keys.toSet,
        sc, bc, expectedVersion = analyzed,
        addsBasePath = if (partCols.isEmpty) None else Some(dir),
        op = Some("optimize"))
      catch { case e: Throwable =>
        // nothing committed: the renamed-in files are unmanifested —
        // remove them so a lost race leaves zero residue (a hard crash
        // here leaves orphans for VACUUM instead)
        adds.foreach { case (p, _) => fs.delete(p, false) }
        fs.delete(staging, true)
        throw e
      }
    // an EMPTY output slot produced no stats row and was not committed
    // — its renamed file is an unmanifested orphan; remove it now
    adds.foreach { case (p, key) =>
      if (!r.addKeys.contains(key)) fs.delete(p, false)
    }
    fs.delete(staging, true)
    (keys.size, r.addKeys.size)
  }

  /** INCREMENTAL compaction: bin-pack only the UNDER-SIZED files
    * (< `smallBytes`) into ~`targetBytes` files and leave everything
    * else untouched — the maintenance pass a 100 TB table runs hourly
    * between full [[optimize]] rewrites. A streaming ingest sink lands
    * a file per (batch × partition); compacting the whole table to fix
    * that would rescan 100 TB, while this pass reads only the small
    * tail: O(small bytes) read+write, and the manifest reconciles
    * INCREMENTALLY (untouched files' entries carry over, the compacted
    * files' entries drop, only the new files scan — which this pass
    * just wrote and the page cache still holds).
    *
    * Same swap protocol and maintenance-window contract as
    * [[optimize]] (trash → rename-in → delete), same crash recovery
    * (the data always exists in full in at least one of staging ∪ live
    * or trash ∪ live). Compaction deletes the small originals, so
    * manifest versions that referenced them fail-fast on snapshot
    * reads — the VACUUM/time-travel trade — UNLESS `deferDelete = true`
    * (manifest-routed readers only): then the originals are tombstoned
    * in one atomic commit, snapshots survive, CDC nets the churn to
    * zero, and `expire` reclaims the bytes later (see [[optimize]]).
    * Top-level
    * layouts only (like [[optimize]]); Hive-partitioned tables compact
    * per partition directory by calling this on the partition path.
    * Returns (smallFilesCompacted, filesWritten). */
  def compactSmall(spark: org.apache.spark.sql.SparkSession, dir: String,
      statsCols: Seq[String], targetBytes: Long = 128L << 20,
      smallBytes: Long = 32L << 20,
      bloomCols: Seq[String] = Nil, deferDelete: Boolean = false): (Int, Int) = {
    require(targetBytes >= 1L && smallBytes >= 1L,
      s"compactSmall: targetBytes=$targetBytes smallBytes=$smallBytes")
    import org.apache.hadoop.fs.Path
    import graft.sources.StatsManifest
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // analyzed version for the deferDelete commit (see optimize)
    val analyzedVersion = StatsManifest.versions(spark, dir).lastOption
    // never compact a tombstoned file's dead rows back into the table
    val tomb = StatsManifest.removedLatest(spark, dir)
    val small = fs.listStatus(dirPath).filter(st => st.isFile &&
      !st.getPath.getName.startsWith("_") &&
      !st.getPath.getName.startsWith(".") &&
      st.getLen < smallBytes &&
      !tomb.contains(StatsManifest.fileKey(st.getPath)))
    if (small.length < 2) return (0, 0)
    val bytes = small.map(_.getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    // schema from the table's authoritative sidecar (a compaction must
    // not narrow it, and mixed-width files after a type widening must
    // read upcast, not by one random footer); bytes carry PHYSICAL
    // names — read and rewrite physical, rows move but never rename
    val schema = StatsManifest.toPhysical(
      StatsManifest.tableSchema(spark, dir))
    val df = spark.read.schema(schema)
      .parquet(small.map(_.getPath.toString).toIndexedSeq: _*)
    val staging = new Path(dir + ".compact")
    df.repartition(n).write.mode("overwrite").parquet(staging.toString)
    val staged = fs.listStatus(staging)
      .map(_.getPath).filter(_.getName.startsWith("part-"))
    if (deferDelete) {
      // atomic tombstone+adopt commit (see optimize): snapshots keep
      // working across the compaction; manifest-routed readers only
      val adds = staged.zipWithIndex.map { case (src, i) =>
        src -> StatsManifest.fileKey(fs.makeQualified(
          new Path(dirPath, f"cmp-$i%05d-${src.getName}")))
      }.toSeq
      val (sc, bc) = StatsManifest.manifestColumns(spark, dir)
      val r = StatsManifest.commitFileOps(spark, dir, adds,
        small.map(st => StatsManifest.fileKey(st.getPath)).toSet,
        sc, bc, expectedVersion = analyzedVersion, op = Some("optimize"))
      adds.zipWithIndex.foreach { case ((src, key), i) =>
        if (r.addKeys.contains(key)) {
          val dst = new Path(dirPath, f"cmp-$i%05d-${src.getName}")
          require(fs.rename(src, dst),
            s"compactSmall: rename $src -> $dst failed; staged copy intact " +
              "and the committed manifest names the final keys — finish the " +
              "renames")
        }
      }
      fs.delete(staging, true)
      return (small.length, r.addKeys.size)
    }
    val trash = new Path(dirPath, ".graft_trash")
    fs.mkdirs(trash)
    small.foreach { st =>
      require(fs.rename(st.getPath, new Path(trash, st.getPath.getName)),
        s"compactSmall: trash rename ${st.getPath} failed; nothing lost — " +
          "restore .graft_trash and re-run")
    }
    staged.zipWithIndex.foreach { case (src, i) =>
      val dst = new Path(dirPath, f"cmp-$i%05d-${src.getName}")
      require(fs.rename(src, dst),
        s"compactSmall: rename $src -> $dst failed; staged copy intact — " +
          "finish the swap by hand or re-run after restoring trash")
    }
    fs.delete(trash, true)
    fs.delete(staging, true)
    graft.sources.StatsManifest.update(spark, dir, statsCols,
      bloomCols = bloomCols, op = "optimize")
    (small.length, staged.length)
  }
}
