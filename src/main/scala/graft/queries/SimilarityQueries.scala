package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import Catalog.t

/** Similarity search over the `embeddings` fixture (ArrayType(FloatType),
  * 64-dim): brute-force cosine top-k as the exact baseline, plus an
  * LSH-bucketed variant as the 100 TB scale path.
  *
  * Dot products run as codegen'd `zip_with` + `aggregate` folds in double
  * (sequential, deterministic — matches DuckDB's list_cosine_similarity
  * evaluation order; results rounded to 6 decimals for last-ulp safety).
  *
  * Scale notes: brute-force is a broadcast of the (small) query set against
  * a scan of the corpus — no shuffle at all; top-k per query via window.
  * The LSH variant buckets both sides by sign-pattern key so candidate
  * generation is an equi-join, turning O(n·q) into O(n + collisions).
  */
object SimilarityQueries {

  /** embedding column cast to double for deterministic arithmetic. */
  private def embDouble(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("v"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 6)

  /** Deterministic ±1 pseudo-random hyperplane sign for (plane p, dim i) —
    * integer arithmetic only, reproducible in ANSI SQL. */
  private def planeSign(p: Int, i: Column): Column =
    when(((i * 2654435761L + lit(p) * 40503L) % 4) < 2, 1.0).otherwise(-1.0)

  /** Sign-pattern LSH bucket key over `nPlanes` deterministic hyperplanes
    * starting at absolute plane index `offset` (distinct offsets give the
    * independent hash tables of multi-table LSH). */
  private def lshKey(v: Column, nPlanes: Int, offset: Int = 0): Column = {
    val bits = (offset until offset + nPlanes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), lit(63)), (x, i) => x * planeSign(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1 << (p - offset))).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Per-label centroids as a coarse quantizer (the IVF cell table).
    * Per-dim mean goes through exact decimal accumulation + round(…,6)
    * (same trick as q_emb_centroid) so the cell table is bit-identical
    * across engines and the probe step is oracle-checkable. */
  private def centroids(s: SparkSession, d: String): DataFrame = {
    val emb = embDouble(t(s, d, "embeddings"))
    emb.select(col("label"), posexplode(col("v")))
      .groupBy(col("label"), col("pos"))
      .agg(round(sum(col("col").cast(DecimalType(20, 10))).cast("double")
        / count(lit(1)), 6).as("c"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("label").as("cell"),
        transform(col("pc"), x => x.getField("c")).as("cv"))
  }

  /** The LSH bucket key in DuckDB SQL: same integer plane signs, same
    * left-to-right sequential fold (list_reduce ≡ Spark's aggregate(), and
    * 0.0 + x0 == x0 bitwise), so the bucket assignment is bit-identical. */
  private def lshKeySql(vExpr: String, nPlanes: Int, offset: Int = 0): String =
    (offset until offset + nPlanes).map { p =>
      val sign = s"(CASE WHEN ((i - 1) * 2654435761 + $p * 40503) % 4 < 2" +
        " THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)"
      s"(CASE WHEN list_reduce(list_transform($vExpr, (x, i) -> x * $sign)," +
        s" (a, b) -> a + b) >= 0 THEN ${1 << (p - offset)} ELSE 0 END)"
    }.mkString(" + ")

  // --- Product quantization (PQ / ADC) ------------------------------------
  // m = 8 subspaces × 8 dims over the 64-dim embeddings; the codebook is
  // the label-centroid table sliced per subspace (the same deterministic
  // stand-in the IVF cells use — KMeans.fit per slice is the library path,
  // Ann.pqEncode/pqSearch). The whole codebook is collected into ONE row
  // and broadcast, so corpus encoding is scan-local: no shuffle touches
  // the corpus until the per-query top-k window. At 100 TB that is the
  // point of PQ — 64×f32 = 256 bytes/vector compresses to 8 codes, the
  // ADC distance is 8 array reads + adds per candidate (no O(dim) fold),
  // and the heavy m·k×dim work (the lookup table) runs once per QUERY.

  /** The codebook as one row: `cb` = array<struct<cell, cv>> sorted by
    * cell — tiny (k×64 doubles), broadcast to every encode/LUT site. */
  private def codebookRow(s: SparkSession, d: String): DataFrame =
    centroids(s, d)
      .agg(array_sort(collect_list(struct(col("cell"), col("cv")))).as("cb"))

  /** Squared L2 between 8-dim subspace `sub` of `v` and of codeword `cv`
    * (both full 64-dim arrays) — left-to-right fold, init 0.0, so the
    * value is bit-identical to DuckDB's list_reduce over the same slice. */
  private def subSq(v: Column, cv: Column, sub: Int): Column =
    aggregate(zip_with(slice(v, sub * 8 + 1, 8), slice(cv, sub * 8 + 1, 8),
      (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x)

  /** PQ codes for `v` against the in-scope `cb` column: array of 8
    * positions (0-based, in cell order) of the nearest codeword per
    * subspace; ties to the lower position via struct-ordered array_min. */
  private def pqCodes(v: Column): Column =
    array((0 until 8).map { sub =>
      array_min(transform(col("cb"), (e, i) =>
        struct(subSq(v, e.getField("cv"), sub).as("d"), i.as("c"))))
        .getField("c")
    }: _*)

  /** Per-query ADC lookup table: lut[sub][pos] = subspace squared L2 from
    * the query to codeword `pos` — computed once per query row. */
  private def pqLut(qv: Column): Column =
    array((0 until 8).map { sub =>
      transform(col("cb"), e => subSq(qv, e.getField("cv"), sub))
    }: _*)

  /** ADC distance: ordered fold over the 8 subspaces of lut[sub][code[sub]]
    * — table reads only, rounded like every cross-engine double here. */
  private def adcCol: Column =
    round(aggregate(sequence(lit(0), lit(7)), lit(0.0),
      (a, sb) => a + element_at(element_at(col("lut"), sb + 1),
        element_at(col("code"), sb + 1) + 1)), 6)

  /** PQ/ADC top-3 over the full corpus for queries vec_id < 5. */
  private def pqRun(s: SparkSession, d: String): DataFrame = {
    val emb = embDouble(t(s, d, "embeddings"))
    val cb = codebookRow(s, d)
    val enc = emb.crossJoin(broadcast(cb))
      .select(col("vec_id"), pqCodes(col("v")).as("code"))
    val q = emb.where(col("vec_id") < 5).crossJoin(broadcast(cb))
      .select(col("vec_id").as("q_id"), pqLut(col("v")).as("lut"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
    enc.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), adcCol.as("adc"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("q_id"), col("vec_id"), col("adc"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** IVFADC: probe the 2 nearest coarse cells per query (the IVF step),
    * then ADC-score only those cells' inverted lists. The probe table
    * carries each query's lookup table, so the candidate join stays a
    * broadcast equi-join on cell id against the scan-local encoded corpus
    * — the full FAISS-style index shape, end-to-end oracle-checked. */
  private def ivfpqRun(s: SparkSession, d: String): DataFrame = {
    val emb = embDouble(t(s, d, "embeddings"))
    val cent = centroids(s, d)
    val cb = codebookRow(s, d)
    val q = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(desc("ccos"), col("cell"))
    val probed = q.crossJoin(broadcast(cent))
      .select(col("q_id"), col("qv"), col("cell"),
        cosine(col("qv"), col("cv")).as("ccos"))
      .withColumn("rn", row_number().over(wProbe))
      .where(col("rn") <= 2)
      .select(col("q_id"), col("qv"), col("cell"))
    val probedLut = probed.crossJoin(broadcast(cb))
      .select(col("q_id"), col("cell"), pqLut(col("qv")).as("lut"))
    val enc = emb.crossJoin(broadcast(cb))
      .select(col("vec_id"), col("label"), pqCodes(col("v")).as("code"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
    enc.join(broadcast(probedLut), col("label") === col("cell")
        && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), adcCol.as("adc"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("q_id"), col("vec_id"), col("adc"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** DuckDB subspace squared L2: the same slice + (x-y)² + sequential
    * fold (list_reduce's (x0+x1)+… ≡ Spark's ((0.0+x0)+x1)+… bitwise).
    * `s.sub` is the 0-based subspace column in scope. */
  private def subSqSql(vExpr: String, cvExpr: String): String =
    s"list_reduce(list_transform(list_slice($vExpr, s.sub*8+1, s.sub*8+8)," +
      s" (x, i) -> (x - $cvExpr[s.sub*8+i]) * (x - $cvExpr[s.sub*8+i]))," +
      " (a, b) -> a + b)"

  /** Shared oracle CTE block: embeddings as doubles, the round-6 decimal
    * centroid table (codebook source), subspaces, per-(vector, subspace,
    * codeword) distances, winning codes, queries, and per-query LUTs.
    * Code ids are the codeword's cell value; Spark's positional ids map
    * 1:1 because the single-row codebook is sorted by cell. */
  private def pqCtesSql: String =
    s"""e AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |cent AS (
       |  SELECT label AS cell, list(c ORDER BY dim) AS cv FROM (
       |    SELECT label, CAST(idx - 1 AS INT) AS dim,
       |      ROUND(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(20,10)))
       |        AS DOUBLE) / COUNT(1), 6) AS c
       |    FROM (SELECT label, UNNEST(embedding) AS x,
       |            GENERATE_SUBSCRIPTS(embedding, 1) AS idx
       |          FROM embeddings) t
       |    GROUP BY label, idx) g
       |  GROUP BY label),
       |subs AS (SELECT UNNEST(range(8)) AS sub),
       |sc AS (
       |  SELECT e.vec_id, e.label, s.sub, c.cell AS cw,
       |    ${subSqSql("e.v", "c.cv")} AS d
       |  FROM e, subs s, cent c),
       |codes AS (
       |  SELECT vec_id, label, sub, cw FROM (
       |    SELECT vec_id, label, sub, cw,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub
       |        ORDER BY d, cw) AS rn
       |    FROM sc) x WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
       |lut AS (
       |  SELECT q.q_id, s.sub, c.cell AS cw,
       |    ${subSqSql("q.qv", "c.cv")} AS d
       |  FROM q, subs s, cent c)""".stripMargin

  private def pqOracle: String =
    s"""WITH $pqCtesSql,
       |adc AS (
       |  SELECT l.q_id, cd.vec_id,
       |    ROUND(list_reduce(list(l.d ORDER BY l.sub), (a, b) -> a + b), 6)
       |      AS adc
       |  FROM codes cd JOIN lut l ON l.sub = cd.sub AND l.cw = cd.cw
       |  GROUP BY l.q_id, cd.vec_id)
       |SELECT q_id, vec_id, adc, rn FROM (
       |  SELECT q_id, vec_id, adc,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rn
       |  FROM adc WHERE vec_id <> q_id) y
       |WHERE rn <= 3
       |ORDER BY q_id, rn""".stripMargin

  private def ivfpqOracle: String =
    s"""WITH $pqCtesSql,
       |probed AS (
       |  SELECT q_id, cell FROM (
       |    SELECT q.q_id, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.q_id
       |        ORDER BY ROUND(list_cosine_similarity(q.qv, c.cv), 6)
       |          DESC, c.cell) AS rn
       |    FROM q, cent c) x
       |  WHERE rn <= 2),
       |adc AS (
       |  SELECT l.q_id, cd.vec_id,
       |    ROUND(list_reduce(list(l.d ORDER BY l.sub), (a, b) -> a + b), 6)
       |      AS adc
       |  FROM codes cd
       |  JOIN probed p ON p.cell = cd.label
       |  JOIN lut l ON l.q_id = p.q_id AND l.sub = cd.sub AND l.cw = cd.cw
       |  GROUP BY l.q_id, cd.vec_id)
       |SELECT q_id, vec_id, adc, rn FROM (
       |  SELECT q_id, vec_id, adc,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rn
       |  FROM adc WHERE vec_id <> q_id) y
       |WHERE rn <= 3
       |ORDER BY q_id, rn""".stripMargin

  /** IVF-style ANN, parameterized by `nprobe` (how many nearest cells
    * each query searches — the standard IVF recall/cost knob). */
  private def ivfRun(nprobe: Int)(s: SparkSession, d: String): DataFrame = {
    val emb = embDouble(t(s, d, "embeddings"))
    val cent = centroids(s, d)
    // probe: nprobe nearest centroids per query vector (broadcast top-n)
    val q = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(desc("ccos"), col("cell"))
    val probed = q.crossJoin(broadcast(cent))
      .select(col("q_id"), col("qv"), col("cell"),
        cosine(col("qv"), col("cv")).as("ccos"))
      .withColumn("rn", row_number().over(wProbe))
      .where(col("rn") <= nprobe)
      .select(col("q_id"), col("qv"), col("cell"))
    // search only the probed cells' inverted lists (cells are disjoint,
    // so the candidate union needs no dedup)
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(desc("cos"), col("vec_id"))
    emb.join(broadcast(probed), col("label") === col("cell")
        && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosine(col("v"), col("qv"))
        .as("cos"))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= 3)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  private def ivfOracle(nprobe: Int): String =
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |cent AS (
       |  SELECT label AS cell, list(c ORDER BY dim) AS cv FROM (
       |    SELECT label, CAST(idx - 1 AS INT) AS dim,
       |      ROUND(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(20,10)))
       |        AS DOUBLE) / COUNT(1), 6) AS c
       |    FROM (SELECT label, UNNEST(embedding) AS x,
       |            GENERATE_SUBSCRIPTS(embedding, 1) AS idx
       |          FROM embeddings) t
       |    GROUP BY label, idx) g
       |  GROUP BY label),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
       |probed AS (
       |  SELECT q_id, qv, cell FROM (
       |    SELECT q.q_id, q.qv, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.q_id
       |        ORDER BY ROUND(list_cosine_similarity(q.qv, c.cv), 6)
       |          DESC, c.cell) AS rn
       |    FROM q, cent c) x
       |  WHERE rn <= $nprobe)
       |SELECT q_id, vec_id, cos, rn FROM (
       |  SELECT p.q_id, e.vec_id,
       |    ROUND(list_cosine_similarity(e.v, p.qv), 6) AS cos,
       |    ROW_NUMBER() OVER (PARTITION BY p.q_id
       |      ORDER BY ROUND(list_cosine_similarity(e.v, p.qv), 6)
       |        DESC, e.vec_id) AS rn
       |  FROM e JOIN probed p
       |    ON e.label = p.cell AND e.vec_id <> p.q_id) y
       |WHERE rn <= 3
       |ORDER BY q_id, rn""".stripMargin

  val queries: Seq[Query] = Seq(

    // IVF-style ANN (scale path #2, next to LSH): coarse-quantize with
    // the centroid table — each query probes only its nearest cell's
    // inverted list instead of the whole corpus. Cells here are the
    // label clusters (k-means seeds at real scale); centroid table is
    // tiny → broadcast; the corpus-side cell assignment is the label
    // itself, so candidate generation is an equi-join on cell id.
    Query("q_knn_ivf", ivfRun(1), Some(ivfOracle(1))),

    // nprobe = 2: each query searches its two nearest cells — the recall
    // knob every IVF deployment tunes. Same plan shape, 2× candidates.
    Query("q_knn_ivf_probe2", ivfRun(2), Some(ivfOracle(2))),

    // Product quantization + ADC over the full corpus: the compressed-
    // domain scan (8 codes/vector, distance = 8 table reads) that replaces
    // the raw-vector fold when the corpus no longer fits in memory.
    Query("q_knn_pq", pqRun, Some(pqOracle)),

    // IVFADC — IVF coarse probe (nprobe=2) + ADC re-scoring of the probed
    // inverted lists: the standard billion-scale index, both stages the
    // oracle-checked deterministic stand-ins of their library twins.
    Query("q_knn_ivfpq", ivfpqRun, Some(ivfpqOracle)),

    // Brute-force cosine top-5 for query vectors vec_id < 5.
    Query(
      "q_knn_cosine",
      (s, d) => {
        val emb = embDouble(t(s, d, "embeddings"))
        val q = emb.where(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(desc("cos"), col("vec_id"))
        emb.crossJoin(broadcast(q))
          .where(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"), cosine(col("v"), col("qv")).as("cos"))
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
             |ORDER BY q_id, rn""".stripMargin)),

    // All near-duplicate pairs by cosine >= 0.4, blocked by label —
    // embedding-cosine near-dup dedup (pairs via per-label join, not a
    // full-corpus cartesian).
    Query(
      "q_sim_pairs",
      (s, d) => {
        val emb = embDouble(t(s, d, "embeddings"))
        val a = emb.select(col("label"), col("vec_id").as("a"), col("v").as("va"))
        val b = emb.select(col("label").as("label_b"), col("vec_id").as("b"),
          col("v").as("vb"))
        a.join(b, col("label") === col("label_b") && col("a") < col("b"))
          .select(col("a"), col("b"), cosine(col("va"), col("vb")).as("cos"))
          .where(col("cos") >= 0.4)
          .orderBy(col("a"), col("b"))
      },
      Some("""SELECT x.vec_id AS a, y.vec_id AS b,
             |  ROUND(list_cosine_similarity(x.embedding::DOUBLE[],
             |    y.embedding::DOUBLE[]), 6) AS cos
             |FROM embeddings x JOIN embeddings y
             |  ON x.label = y.label AND x.vec_id < y.vec_id
             |WHERE ROUND(list_cosine_similarity(x.embedding::DOUBLE[],
             |  y.embedding::DOUBLE[]), 6) >= 0.4
             |ORDER BY a, b""".stripMargin)),

    // Cosine near-dup pairs via multi-table random-hyperplane LSH — the
    // 100 TB replacement for q_sim_pairs' label blocking (labels are a
    // test-scale stand-in; a real corpus has no blocking column).
    // Two independent 6-plane sign buckets (tables) per vector; candidate
    // generation is an equi-join on (table, bucket); cosine runs only on
    // candidates. Recall is tuned by adding tables, cost by planes per
    // table — both leave the plan shape (explode → shuffle on a 4-byte
    // key → windowless equi-join) unchanged. Missed pairs are those
    // separated in BOTH tables; with p = 1 - θ/π per plane, miss rate is
    // (1-p^6)² per pair — the standard multi-probe trade.
    Query(
      "q_sim_pairs_lsh",
      (s, d) => {
        val emb = embDouble(t(s, d, "embeddings"))
        val keyed = emb.select(col("vec_id"), col("v"),
          lshKey(col("v"), 6, 0).as("b0"), lshKey(col("v"), 6, 6).as("b1"))
        val ex = keyed.select(col("vec_id"), col("v"),
          explode(array(
            struct(lit(0).as("t"), col("b0").as("b")),
            struct(lit(1).as("t"), col("b1").as("b")))).as("tb"))
          .select(col("vec_id"), col("v"),
            col("tb.t").as("t"), col("tb.b").as("b"))
        // candidates stay NARROW — (a, b) ids only — through the bucket
        // join and the both-tables dedupe, then the vectors join back for
        // the cosine. Riding the vectors along (the round-5..6 shape)
        // avoided the join-back but made the dedupe shuffle carry two
        // 64-dim arrays per candidate: the measured sf1 scale step put
        // that at ~6 GB of sort-shuffle and 24 minutes — SLOWER than the
        // brute-force baseline. Narrow candidates shuffle 16 bytes per
        // row; the two equi-join-backs are the price, and they're the
        // shape the 100 TB plan wants (DuckDB's oracle text always did
        // it this way).
        val exIds = ex.select(col("vec_id"), col("t"), col("b"))
        val cand = exIds.as("x").join(exIds.as("y"),
            col("x.t") === col("y.t") && col("x.b") === col("y.b")
              && col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
          .dropDuplicates("a", "b")
        val va = keyed.select(col("vec_id").as("a"), col("v").as("va"))
        val vb = keyed.select(col("vec_id").as("b"), col("v").as("vb"))
        cand.join(va, "a").join(vb, "b")
          .select(col("a"), col("b"), cosine(col("va"), col("vb")).as("cos"))
          .where(col("cos") >= 0.4)
          .orderBy(col("a"), col("b"))
      },
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              |k AS (
              |  SELECT vec_id, v,
              |    ${lshKeySql("v", 6, 0)} AS b0,
              |    ${lshKeySql("v", 6, 6)} AS b1
              |  FROM e),
              |ex AS (
              |  SELECT vec_id, v, 0 AS t, b0 AS b FROM k
              |  UNION ALL SELECT vec_id, v, 1 AS t, b1 AS b FROM k),
              |cand AS (
              |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
              |  FROM ex x JOIN ex y
              |    ON x.t = y.t AND x.b = y.b AND x.vec_id < y.vec_id)
              |SELECT c.a, c.b,
              |  ROUND(list_cosine_similarity(x.embedding::DOUBLE[],
              |    y.embedding::DOUBLE[]), 6) AS cos
              |FROM cand c
              |JOIN embeddings x ON x.vec_id = c.a
              |JOIN embeddings y ON y.vec_id = c.b
              |WHERE ROUND(list_cosine_similarity(x.embedding::DOUBLE[],
              |  y.embedding::DOUBLE[]), 6) >= 0.4
              |ORDER BY a, b""".stripMargin)),

    // SemDeDup (Abbas et al. 2023, semantic deduplication): embedding-
    // space near-duplicates — cluster-blocked cosine pairs → connected
    // components → keep the minimum id of each duplicate group. Composes
    // the engine's own pieces (q_sim_pairs blocking + Ops
    // .connectedComponents + broadcast anti-join keep-one), the same
    // shape as q_dedup_corpus on the lexical side. Label cells stand in
    // for the learned k-means cells (KMeans.fit is the library path) so
    // the whole pipeline stays deterministic and oracle-checkable.
    Query(
      "q_semdedup",
      (s, d) => {
        val pairs = Catalog.byName("q_sim_pairs").run(s, d)
          .select(col("a"), col("b"))
        val drop = graft.operators.Ops.connectedComponents(pairs)
          .toDF("vec_id", "component")
          .where(col("vec_id") =!= col("component"))
          .select(col("vec_id"))
        t(s, d, "embeddings")
          .join(broadcast(drop), Seq("vec_id"), "left_anti")
          .select(col("vec_id"), col("label"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH RECURSIVE pairs AS (
             |  SELECT x.vec_id AS a, y.vec_id AS b
             |  FROM embeddings x JOIN embeddings y
             |    ON x.label = y.label AND x.vec_id < y.vec_id
             |  WHERE ROUND(list_cosine_similarity(x.embedding::DOUBLE[],
             |    y.embedding::DOUBLE[]), 6) >= 0.4),
             |edges AS (
             |  SELECT a AS src, b AS dst FROM pairs
             |  UNION ALL SELECT b, a FROM pairs),
             |reach(id, r) AS (
             |  SELECT DISTINCT src, src FROM edges
             |  UNION
             |  SELECT e.dst, reach.r FROM reach
             |  JOIN edges e ON e.src = reach.id),
             |comp AS (
             |  SELECT id, MIN(r) AS component FROM reach GROUP BY id)
             |SELECT vec_id, label FROM embeddings
             |WHERE vec_id NOT IN (SELECT id FROM comp WHERE id <> component)
             |ORDER BY vec_id""".stripMargin)),

    // Per-label centroids (embedding pooling — the aggregate an IVF index
    // or cluster-dedup pipeline needs): explode to (label, dim), exact
    // decimal mean per dimension. One shuffle on (label, dim); at 100 TB
    // the partial aggregation reduces each partition to n_labels×64 rows
    // before the exchange.
    Query(
      "q_emb_centroid",
      (s, d) =>
        t(s, d, "embeddings")
          .select(col("label"), posexplode(col("embedding")))
          .withColumnRenamed("pos", "dim")
          .select(col("label"), col("dim"),
            col("col").cast("double").cast(DecimalType(20, 10)).as("x"))
          .groupBy(col("label"), col("dim"))
          // round(…,6): float→decimal rounding modes differ between
          // engines in the last digit; 1e-12 noise can't move 1e-6 rounding
          .agg(round(sum(col("x")).cast("double") / count(lit(1)), 6)
            .as("centroid"))
          .orderBy(col("label"), col("dim")),
      Some("""SELECT label, CAST(idx - 1 AS INT) AS dim,
             |  ROUND(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE)
             |    / COUNT(1), 6) AS centroid
             |FROM (
             |  SELECT label, UNNEST(embedding) AS x,
             |    GENERATE_SUBSCRIPTS(embedding, 1) AS idx
             |  FROM embeddings) e
             |GROUP BY label, idx
             |ORDER BY label, dim""".stripMargin)),

    // Scalar int8 quantization (embedding compression for a 100 TB vector
    // store: 4 bytes/dim → 1): per-vector min/max affine map to [0,255].
    // Pure per-row array math — scan-local, no shuffle, fully pushed-down
    // column read. Emits the quantization params + integer checksum (the
    // full uint8 vector would just bloat the verify dump).
    Query(
      "q_emb_quantize",
      (s, d) => {
        val vmin = array_min(col("embedding")).cast("double")
        val vmax = array_max(col("embedding")).cast("double")
        val q = transform(col("embedding"), x =>
          round((x.cast("double") - vmin) * 255.0 / (vmax - vmin))
            .cast("long"))
        t(s, d, "embeddings")
          .select(col("vec_id"), vmin.as("vmin"), vmax.as("vmax"),
            when(vmax === vmin, lit(null))
              .otherwise(aggregate(q, lit(0L), (a, x) => a + x))
              .as("qsum"))
          .orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id,
             |  CAST(list_min(embedding) AS DOUBLE) AS vmin,
             |  CAST(list_max(embedding) AS DOUBLE) AS vmax,
             |  CAST(list_sum(list_transform(embedding,
             |    x -> CAST(ROUND((CAST(x AS DOUBLE)
             |        - CAST(list_min(embedding) AS DOUBLE)) * 255.0
             |      / NULLIF(CAST(list_max(embedding) AS DOUBLE)
             |        - CAST(list_min(embedding) AS DOUBLE), 0.0))
             |      AS BIGINT))) AS BIGINT) AS qsum
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // LSH-bucketed ANN (scale path): candidates share an 8-plane sign
    // bucket; exact cosine within bucket, top-3 per query. Oracle
    // reproduces the bucket keys bit-for-bit (integer plane signs +
    // sequential list_reduce fold); DedupSimilaritySpec additionally
    // checks recall against brute force.
    Query(
      "q_knn_lsh",
      (s, d) => {
        val emb = embDouble(t(s, d, "embeddings"))
          .withColumn("bucket", lshKey(col("v"), 8))
        val q = emb.where(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("v").as("qv"),
            col("bucket").as("q_bucket"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(desc("cos"), col("vec_id"))
        emb.join(broadcast(q), col("bucket") === col("q_bucket")
            && col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"), cosine(col("v"), col("qv")).as("cos"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3)
          .select(col("q_id"), col("vec_id"), col("cos"), col("rn"))
          .orderBy(col("q_id"), col("rn"))
      },
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding::DOUBLE[] AS v,
              |    ${lshKeySql("embedding::DOUBLE[]", 8)} AS bucket
              |  FROM embeddings),
              |q AS (SELECT vec_id AS q_id, v AS qv, bucket AS q_bucket
              |      FROM e WHERE vec_id < 5)
              |SELECT q_id, vec_id, cos, rn FROM (
              |  SELECT q.q_id, e.vec_id,
              |    ROUND(list_cosine_similarity(e.v, q.qv), 6) AS cos,
              |    ROW_NUMBER() OVER (PARTITION BY q.q_id
              |      ORDER BY ROUND(list_cosine_similarity(e.v, q.qv), 6)
              |        DESC, e.vec_id) AS rn
              |  FROM e JOIN q
              |    ON e.bucket = q.q_bucket AND e.vec_id <> q.q_id) x
              |WHERE rn <= 3
              |ORDER BY q_id, rn""".stripMargin)))
}
