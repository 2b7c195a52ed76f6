package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Catalog.t

/** Deduplication operators for training-data pipelines: exact hash dedup,
  * MinHash+LSH, n-gram Jaccard, SimHash.
  *
  * Scale design: every variant is a groupBy/join on a derived key — never a
  * cartesian pair enumeration. MinHash LSH turns near-dup search into an
  * equi-join on band keys (shuffle on band key ~ O(n·bands)); Jaccard
  * verification joins only on shared shingles. MinHash permutations use
  * md5(token ⊕ seed), which both Spark and the DuckDB oracle compute
  * identically, so the whole MinHash→LSH→candidate pipeline is
  * oracle-checked end to end.
  */
object DedupQueries {

  private val NumHashes = 8
  private val BandSize = 2 // → 4 bands

  /** Distinct 3-token shingles per doc — pure per-row array transform
    * (no explode-then-window shuffle: at 100 TB the tokenize→shingle step
    * must run scan-local, and this formulation is one narrow projection). */
  private def shingles(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    t(s, d, "documents")
      .where(size(toks) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", element_at(toks, i + 1),
            element_at(toks, i + 2), element_at(toks, i + 3))))).as("sh"))
  }

  /** The same shingle set in DuckDB SQL. */
  private val shinglesSql =
    """SELECT DISTINCT doc_id, w || ' ' || w2 || ' ' || w3 AS sh FROM (
      |  SELECT doc_id, w,
      |    LEAD(w, 1) OVER (PARTITION BY doc_id ORDER BY idx) AS w2,
      |    LEAD(w, 2) OVER (PARTITION BY doc_id ORDER BY idx) AS w3
      |  FROM (
      |    SELECT doc_id,
      |      UNNEST(string_split(text, ' ')) AS w,
      |      GENERATE_SUBSCRIPTS(string_split(text, ' '), 1) AS idx
      |    FROM documents) tk
      |) x WHERE w3 IS NOT NULL""".stripMargin

  val queries: Seq[Query] = Seq(

    // Exact dedup: hash-groupBy on content digest, keep lowest doc_id.
    Query(
      "q_dedup_exact",
      (s, d) =>
        t(s, d, "documents")
          .groupBy(md5(col("text")).as("content_hash"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .select(col("keep_id"), col("n_copies"))
          .orderBy(col("keep_id")),
      Some("""SELECT MIN(doc_id) AS keep_id, COUNT(1) AS n_copies
             |FROM documents GROUP BY MD5(text)
             |ORDER BY keep_id""".stripMargin)),

    // MinHash + LSH candidate pairs: 8 md5-permutation minhashes over
    // 3-token shingles, banded 2-per-band → equi-join on band keys.
    Query(
      "q_dedup_minhash_lsh",
      (s, d) => {
        val sh = shingles(s, d)
        val minhashes = (0 until NumHashes).map(i =>
          min(md5(concat_ws("|", col("sh"), lit(i.toString)))).as(s"h$i"))
        val sig = sh.groupBy(col("doc_id"))
          .agg(minhashes.head, minhashes.tail: _*)
        // one generator row → NumBands band rows; no union, the signature
        // aggregation runs exactly once (a union of N projections would
        // re-execute the whole shingle+agg pipeline N times)
        val stackArgs = (0 until NumHashes / BandSize).map { b =>
          s"$b, md5(concat_ws('|', h${BandSize * b}, h${BandSize * b + 1}))"
        }.mkString(", ")
        val all = sig.selectExpr("doc_id",
          s"stack(${NumHashes / BandSize}, $stackArgs) AS (band, bkey)")
        all.as("x").join(all.as("y"),
            col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
              && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .distinct()
          .orderBy(col("a"), col("b"))
      },
      Some {
        val hashCols = (0 until NumHashes)
          .map(i => s"MIN(MD5(sh || '|' || $i)) AS h$i").mkString(",\n    ")
        val bandSelects = (0 until NumHashes / BandSize).map { b =>
          s"SELECT doc_id, $b AS band, MD5(h${BandSize * b} || '|' || h${BandSize * b + 1}) AS bkey FROM sig"
        }.mkString("\n  UNION ALL ")
        s"""WITH sh AS ($shinglesSql),
           |sig AS (
           |  SELECT doc_id,
           |    $hashCols
           |  FROM sh GROUP BY doc_id),
           |bands AS (
           |  $bandSelects)
           |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           |FROM bands x JOIN bands y
           |  ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
           |ORDER BY a, b""".stripMargin
      }),

    // n-gram (3-shingle) Jaccard similarity: verification join on shared
    // shingles — intersection via equi-join, union from per-doc counts.
    Query(
      "q_dedup_ngram_jaccard",
      (s, d) => {
        val sh = shingles(s, d)
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
        val inter = sh.as("x").join(sh.as("y"),
            col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
          .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .agg(count(lit(1)).as("n_inter"))
        inter
          .join(sizes.withColumnRenamed("doc_id", "a")
            .withColumnRenamed("n_sh", "na"), "a")
          .join(sizes.withColumnRenamed("doc_id", "b")
            .withColumnRenamed("n_sh", "nb"), "b")
          .select(col("a"), col("b"),
            (col("n_inter").cast("double")
              / (col("na") + col("nb") - col("n_inter"))).as("jaccard"))
          .where(col("jaccard") >= 0.2)
          .orderBy(col("a"), col("b"))
      },
      Some(s"""WITH sh AS ($shinglesSql),
              |sizes AS (SELECT doc_id, COUNT(1) AS n_sh FROM sh GROUP BY doc_id),
              |inter AS (
              |  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(1) AS n_inter
              |  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
              |  GROUP BY 1, 2)
              |SELECT a, b,
              |  CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
              |FROM inter
              |JOIN sizes sa ON sa.doc_id = a
              |JOIN sizes sb ON sb.doc_id = b
              |WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
              |ORDER BY a, b""".stripMargin)),

    // SimHash: 32-bit signature from per-token xxhash64 sign bits.
    // Spark-side only (driver rows-only check; spec pins exact values) —
    // no cross-engine 64-bit hash exists in both Spark and DuckDB.
    Query(
      "q_dedup_simhash",
      (s, d) => {
        val tok = t(s, d, "documents")
          .select(col("doc_id"),
            explode(array_distinct(split(col("text"), " "))).as("w"))
          .withColumn("h", xxhash64(col("w")))
        val bitSums = (0 until 32).map(i =>
          sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1)
            .otherwise(-1)).as(s"b$i"))
        val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
        val sim = (0 until 32).map(i =>
          when(col(s"b$i") > 0, lit(1L) * (1L << i)).otherwise(0L))
          .reduce(_ + _)
        agg.select(col("doc_id"), sim.as("simhash")).orderBy(col("doc_id"))
      },
      None))
}
