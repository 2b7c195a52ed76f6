package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Layer-1 expression tests (SURVEY §5, mirroring ScalarFunctionsTest
  * style: eval(expr) == expected per function). */
class GraftFunctionsSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c).collect().head.getAs[T](0)

  test("splitIndex: 0-based field access, null out of range") {
    assert(one[String](GraftFunctions.splitIndex(lit("a-b-c"), "-", 0)) === "a")
    assert(one[String](GraftFunctions.splitIndex(lit("a-b-c"), "-", 2)) === "c")
    assert(one[String](GraftFunctions.splitIndex(lit("a-b-c"), "-", 5)) === null)
  }

  test("is_decimal / is_digit / is_alpha") {
    assert(one[Boolean](GraftFunctions.isDecimal(lit("3.14"))))
    assert(one[Boolean](GraftFunctions.isDecimal(lit("-7"))))
    assert(!one[Boolean](GraftFunctions.isDecimal(lit("3.1.4"))))
    assert(one[Boolean](GraftFunctions.isDigit(lit("0042"))))
    assert(!one[Boolean](GraftFunctions.isDigit(lit("42x"))))
    assert(one[Boolean](GraftFunctions.isAlpha(lit("Spark"))))
    assert(!one[Boolean](GraftFunctions.isAlpha(lit("Spark2"))))
  }

  test("randInteger stays in [0, n) and is seed-deterministic") {
    val vals = Seq.fill(100)(0).toDF("x")
      .select(GraftFunctions.randInteger(42L, 7).as("r"))
      .collect().map(_.getInt(0))
    assert(vals.forall(v => v >= 0 && v < 7))
  }

  test("SQL-registered names resolve in spark.sql") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT split_index('x|y|z', '|', 1) AS a, is_digit('123') AS b")
      .collect().head
    assert(r.getString(0) === "y")
    assert(r.getBoolean(1))
  }

  test("single_value returns the value for 1-value groups, fails otherwise") {
    GraftFunctions.registerAll(spark)
    Seq(("k1", "v"), ("k1", "v"), ("k2", "w")).toDF("k", "s")
      .createOrReplaceTempView("sv_ok")
    val ok = spark.sql(
      "SELECT k, single_value_string(s) AS s FROM sv_ok GROUP BY k ORDER BY k")
      .collect()
    assert(ok.map(_.getString(1)).toSeq === Seq("v", "w"))
    Seq(("k1", "a"), ("k1", "b")).toDF("k", "s")
      .createOrReplaceTempView("sv_bad")
    val ex = intercept[Exception] {
      SparkFixture.quietExpectedTaskFailures {
        spark.sql("SELECT single_value_string(s) FROM sv_bad GROUP BY k")
          .collect()
      }
    }
    assert(ex.getMessage != null)
  }

  test("native cosine_similarity matches the compositional formula") {
    GraftFunctions.registerAll(spark)
    val df = spark.read.parquet(s"${SparkFixture.sf}/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .limit(50)
    val self = df.select(
      GraftFunctions.cosineSimilarity(col("v"), col("v")).as("c"))
      .collect().map(_.getDouble(0))
    assert(self.forall(c => math.abs(c - 1.0) < 1e-9))
    // cross-check vs aggregate(zip_with(...)) on pairs
    val a = df.select(col("vec_id").as("ida"), col("v").as("va"))
    val b = df.select(col("vec_id").as("idb"), col("v").as("vb"))
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, p) => acc + p)
    val joined = a.crossJoin(b).where(col("ida") < col("idb")).limit(200)
      .select(
        GraftFunctions.cosineSimilarity(col("va"), col("vb")).as("native"),
        (dot(col("va"), col("vb"))
          / (sqrt(dot(col("va"), col("va"))) * sqrt(dot(col("vb"), col("vb")))))
          .as("composed"))
      .collect()
    joined.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
    }
  }

  test("cosine_similarity nulls degenerate inputs instead of NaN") {
    // length mismatch, empty arrays, zero norm → null (never NaN);
    // bad-type input fails analysis via checkInputDataTypes
    val rows = spark.sql(
      """SELECT
        |  cosine_similarity(array(1.0d, 2.0d), array(1.0d)) AS mismatch,
        |  cosine_similarity(CAST(array() AS ARRAY<DOUBLE>),
        |                    CAST(array() AS ARRAY<DOUBLE>)) AS empty,
        |  cosine_similarity(array(0.0d, 0.0d), array(1.0d, 1.0d)) AS zeronorm,
        |  cosine_similarity(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS nullin
        |""".stripMargin).collect().head
    (0 until 4).foreach(i => assert(rows.isNullAt(i), s"col $i"))
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_similarity(array('a'), array('b'))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }

  test("GraftExtensions injects cosine_similarity at session build") {
    // SparkFixture's session comes from GraftSession.builder, which wires
    // GraftExtensions — the function must resolve without registerAll
    val v = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 0d), array(1.0d, 0d)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("listaggSorted is deterministic") {
    val r = Seq(("g", "b"), ("g", "a"), ("g", "c")).toDF("k", "s")
      .groupBy(col("k"))
      .agg(GraftFunctions.listaggSorted(col("s"), ",").as("agg"))
      .collect().head.getString(1)
    assert(r === "a,b,c")
  }
}
