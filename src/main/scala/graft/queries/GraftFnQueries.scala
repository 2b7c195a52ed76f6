package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import Catalog.t

/** Queries exercising the graft-registered function surface (SURVEY §2.8
  * gaps: SPLIT_INDEX, IS_DECIMAL/DIGIT/ALPHA, SINGLE_VALUE, LISTAGG,
  * cosine_similarity) through the SQL names — proving the registration
  * path, not just the Column helpers.
  */
object GraftFnQueries {

  val queries: Seq[Query] = Seq(

    // SQL-UDF + regex-predicate battery via registered names.
    Query(
      "q_fn_graft",
      (s, d) => {
        GraftFunctions.registerAll(s)
        Catalog.registerViews(s, d, "documents")
        s.sql("""SELECT doc_id,
                |  split_index(text, ' ', 2) AS w3,
                |  is_digit(split_index(text, ' ', 0)) AS d0,
                |  is_alpha(split_index(text, ' ', 0)) AS a0,
                |  is_decimal('3.14') AS dec1,
                |  is_decimal(split_index(text, ' ', 1)) AS dec2
                |FROM documents ORDER BY doc_id""".stripMargin)
      },
      Some("""SELECT doc_id,
             |  string_split(text, ' ')[3] AS w3,
             |  regexp_full_match(string_split(text, ' ')[1], '[0-9]+') AS d0,
             |  regexp_full_match(string_split(text, ' ')[1], '[A-Za-z]+') AS a0,
             |  TRUE AS dec1,
             |  regexp_full_match(string_split(text, ' ')[2],
             |    '[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)') AS dec2
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // SINGLE_VALUE over a genuinely single-valued group (reference
    // SingleValueAggFunction): nation name per nationkey.
    Query(
      "q_fn_single_value",
      (s, d) => {
        GraftFunctions.registerAll(s)
        Catalog.registerViews(s, d, "nation", "supplier")
        s.sql("""SELECT s_nationkey, single_value_string(n_name) AS nation
                |FROM supplier JOIN nation ON s_nationkey = n_nationkey
                |GROUP BY s_nationkey
                |ORDER BY s_nationkey""".stripMargin)
      },
      Some("""SELECT s_nationkey, MIN(n_name) AS nation
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY s_nationkey
             |ORDER BY s_nationkey""".stripMargin)),

    // kNN with the native one-pass cosine Expression (bench path; same
    // oracle as the compositional q_knn_cosine — results must agree).
    Query(
      "q_knn_native",
      (s, d) => {
        GraftFunctions.registerAll(s)
        val emb = t(s, d, "embeddings")
          .select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("v"))
        val q = emb.where(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(desc("cos"), col("vec_id"))
        emb.crossJoin(broadcast(q))
          .where(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            round(GraftFunctions.cosineSimilarity(col("v"), col("qv")), 6)
              .as("cos"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 5)
          .select(col("q_id"), col("vec_id"), col("cos"), col("rn"))
          .orderBy(col("q_id"), col("rn"))
      },
      Some("""SELECT q_id, vec_id, cos, rn FROM (
             |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
             |    ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
             |      q.embedding::DOUBLE[]), 6) AS cos,
             |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
             |      ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
             |        q.embedding::DOUBLE[]), 6) DESC, e.vec_id) AS rn
             |  FROM embeddings e, embeddings q
             |  WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id) x
             |WHERE rn <= 5
             |ORDER BY q_id, rn""".stripMargin),
      bench = true))
}
