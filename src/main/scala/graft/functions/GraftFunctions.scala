package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}

/** The scalar-function surface the reference exposes but Spark lacks
  * natively (SURVEY.md §2.8), built as pure Column compositions over
  * `org.apache.spark.sql.functions` — every helper stays inside
  * whole-stage codegen; no Scala UDF in any hot path.
  *
  * Reference catalog: `flink-table-planner-blink/.../functions/sql/
  * FlinkSqlOperatorTable.java` (SPLIT_INDEX, RAND_INTEGER, IS_DECIMAL,
  * IS_DIGIT, IS_ALPHA, HASH_CODE, TO_TIMESTAMP_LTZ, LISTAGG,
  * SINGLE_VALUE); runtime bodies in
  * `flink-table-runtime-blink/.../functions/SqlFunctionUtils.java`.
  */
object GraftFunctions {

  // ---- scalar helpers (Column-native, codegen'd) --------------------------

  /** SPLIT_INDEX(str, sep, i): i-th (0-based) field, NULL out of range
    * (try_element_at: ANSI mode is on by default in Spark 4). */
  def splitIndex(s: Column, sep: String, i: Int): Column =
    try_element_at(split(s, java.util.regex.Pattern.quote(sep)), lit(i + 1))

  /** RAND_INTEGER(n): uniform int in [0, n). */
  def randInteger(n: Int): Column = floor(rand() * n).cast("int")

  /** RAND_INTEGER(seed, n) — deterministic stream. */
  def randInteger(seed: Long, n: Int): Column =
    floor(rand(seed) * n).cast("int")

  /** IS_DECIMAL(str): parses as a decimal number. */
  def isDecimal(s: Column): Column =
    s.rlike("^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)$")

  /** IS_DIGIT(str): all characters decimal digits (non-empty). */
  def isDigit(s: Column): Column = s.rlike("^[0-9]+$")

  /** IS_ALPHA(str): all characters letters (non-empty). */
  def isAlpha(s: Column): Column = s.rlike("^[A-Za-z]+$")

  /** HASH_CODE(str): 32-bit hash (Spark Murmur3, deterministic). */
  def hashCode(c: Column): Column = hash(c)

  /** TO_TIMESTAMP_LTZ(millis): epoch millis → instant-semantics ts. */
  def toTimestampLtz(millis: Column): Column = timestamp_millis(millis)

  /** LISTAGG(expr, sep) with deterministic (sorted) element order. */
  def listaggSorted(c: Column, sep: String): Column =
    array_join(array_sort(collect_list(c)), sep)

  // ---- SINGLE_VALUE -------------------------------------------------------

  /** SINGLE_VALUE(expr): the group's one value; fails if the group has
    * more than one distinct value (reference SingleValueAggFunction).
    * Typed Aggregator — usable as `ds.agg(GraftFunctions.singleValue[T])`
    * or via the registered UDAFs below.
    */
  class SingleValue[T](enc: Encoder[T])
      extends Aggregator[T, (T, Long), T] with Serializable {
    override def zero: (T, Long) = (null.asInstanceOf[T], 0L)
    override def reduce(b: (T, Long), a: T): (T, Long) = merge(b, (a, 1L))
    override def merge(x: (T, Long), y: (T, Long)): (T, Long) = {
      if (x._2 > 0 && y._2 > 0 && x._1 != y._1)
        throw new IllegalStateException(
          s"SINGLE_VALUE: more than one distinct value (${x._1}, ${y._1})")
      if (x._2 > 0) (x._1, x._2 + y._2) else (y._1, x._2 + y._2)
    }
    override def finish(r: (T, Long)): T = {
      if (r._2 == 0) throw new IllegalStateException("SINGLE_VALUE: empty group")
      r._1
    }
    override def bufferEncoder: Encoder[(T, Long)] =
      Encoders.tuple(enc, Encoders.scalaLong)
    override def outputEncoder: Encoder[T] = enc
  }

  def singleValueLong = new SingleValue[java.lang.Long](Encoders.LONG)
  def singleValueDouble = new SingleValue[java.lang.Double](Encoders.DOUBLE)
  def singleValueString = new SingleValue[String](Encoders.STRING)

  // ---- registration -------------------------------------------------------

  /** Cosine similarity Column API (native Expression, one-pass). */
  def cosineSimilarity(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  // sessions already registered — weak keys so a stopped session can be
  // collected; makes registerAll idempotent (no per-query
  // "function X replaced" warning spam in Verify/Bench stderr)
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Register the named-function surface on a session: SQL names resolve
    * in `spark.sql(...)` exactly as in the reference's catalog. Safe to
    * call per-query; work happens once per session. */
  def registerAll(spark: SparkSession): Unit =
    if (registered.put(spark, java.lang.Boolean.TRUE) == null)
      doRegister(spark)

  private def doRegister(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "cosine_similarity",
      (children: Seq[Expression]) =>
        CosineSimilarity(children.head, children(1)),
      "scala_udf")
    registry.createOrReplaceTempFunction(
      "image_stats",
      (children: Seq[Expression]) => ImageStats(children.head),
      "scala_udf")
    spark.udf.register("single_value_long", udaf(singleValueLong))
    spark.udf.register("single_value_double", udaf(singleValueDouble))
    spark.udf.register("single_value_string", udaf(singleValueString))
    // SQL-macro style names for the Column helpers (SQL UDFs, Spark 4+:
    // body is a Catalyst expression, fully optimized/codegen'd inline).
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION split_index(
                |  s STRING, sep STRING, i INT) RETURNS STRING
                |RETURN try_element_at(split(s, concat('\\Q', sep, '\\E')), i + 1)"""
      .stripMargin)
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION is_decimal(s STRING)
                |RETURNS BOOLEAN
                |RETURN s RLIKE '^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)$'"""
      .stripMargin)
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION is_digit(s STRING)
                |RETURNS BOOLEAN RETURN s RLIKE '^[0-9]+$'""".stripMargin)
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION is_alpha(s STRING)
                |RETURNS BOOLEAN RETURN s RLIKE '^[A-Za-z]+$'""".stripMargin)
  }
}
