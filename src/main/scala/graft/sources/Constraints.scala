package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CHECK constraints on manifested tables (r13) — write-path data
  * quality, the lakehouse convention (Delta ships the same surface):
  *
  * {{{
  *   ALTER TABLE t ADD CONSTRAINT qty_pos CHECK (quantity > 0)
  *   ALTER TABLE t DROP CONSTRAINT qty_pos
  * }}}
  *
  * A constraint is a boolean SQL expression over the row's columns,
  * stored as a `constraint.<name>` table property in the schema
  * sidecar (so it rides DESCRIBE DETAIL / SHOW TBLPROPERTIES and
  * catalog renames for free). Semantics follow ANSI CHECK: a row
  * violates only when the expression is FALSE — NULL satisfies.
  *
  * Enforcement is INLINE in the write job, never an extra pass: every
  * write path wraps its outgoing frame in one filter per constraint
  * whose predicate is `assert_true(...)` — the first violating row
  * fails the job loudly with the constraint name, expression and the
  * row itself, at zero cost to conforming writes beyond the predicate
  * evaluation (codegen'd, pipelined into the write stage — at 100 TB
  * an extra validation scan would double the write cost). ADD
  * CONSTRAINT validates EXISTING rows with one manifest-routed scan
  * that stops at the first violation. [[RowOps.restore]] deliberately
  * bypasses enforcement: it reproduces a historical state verbatim.
  *
  * Reference analogue: NOT NULL/type validation in the reference's
  * sink conversion (`flink-table-runtime-blink/…/sink/
  * SinkNotNullEnforcer.java`) — generalized to arbitrary predicates. */
object Constraints {

  val Prefix = "constraint."

  /** (name, expression SQL) of every constraint on `dir`, sorted. */
  def of(spark: SparkSession, dir: String): Seq[(String, String)] =
    StatsManifest.tableProps(spark, dir).toSeq.collect {
      case (k, v) if k.startsWith(Prefix) => k.stripPrefix(Prefix) -> v
    }.sorted

  private def satisfied(sql: String): Column =
    // ANSI CHECK: NULL satisfies — only FALSE violates
    coalesce(expr(sql), lit(true))

  /** `df` with every constraint of `dir` enforced inline: conforming
    * rows pass through unchanged, the first violating row fails the
    * consuming job with name + expression + row JSON. One tiny sidecar
    * read; a constraint-less table returns `df` untouched. */
  def enforce(spark: SparkSession, dir: String, df: DataFrame)
      : DataFrame = {
    val cs = of(spark, dir)
    if (cs.isEmpty) df
    else cs.foldLeft(df) { case (d, (name, sql)) =>
      d.filter(assert_true(satisfied(sql),
        concat(lit(s"graft CHECK constraint '$name' violated: " +
          s"($sql) by row "), to_json(struct(d.columns.map(col)
          .toIndexedSeq: _*)))).isNull)
    }
  }

  /** Install a constraint: parse-check the expression, validate EVERY
    * existing row (one manifest-routed scan, stops at the first
    * violation — loud with a sample), then persist the property. */
  def add(spark: SparkSession, dir: String, name: String,
      sql: String): Unit = {
    require(name.matches("\\w+"),
      s"graft ADD CONSTRAINT: invalid name '$name'")
    val props = StatsManifest.tableProps(spark, dir)
    require(!props.contains(Prefix + name),
      s"graft ADD CONSTRAINT: constraint '$name' already exists " +
        s"(${props(Prefix + name)}) — DROP it first")
    val clean = sql.replaceAll("\\s+", " ").trim
    val bad = StatsManifest.scan(spark, dir)
      .where(!satisfied(clean)).limit(1).collect()
    require(bad.isEmpty,
      s"graft ADD CONSTRAINT: existing rows violate ($clean) — e.g. " +
        s"${bad.headOption.map(_.toString).getOrElse("")}; the " +
        "constraint was NOT added")
    StatsManifest.writeTableProps(spark, dir,
      props + (Prefix + name -> clean))
  }

  def drop(spark: SparkSession, dir: String, name: String,
      ifExists: Boolean): Unit = {
    val props = StatsManifest.tableProps(spark, dir)
    if (!props.contains(Prefix + name)) {
      require(ifExists,
        s"graft DROP CONSTRAINT: no constraint '$name' on this table" +
          s" (have: ${of(spark, dir).map(_._1).mkString(", ")})")
      return
    }
    StatsManifest.writeTableProps(spark, dir, props - (Prefix + name))
  }
}
