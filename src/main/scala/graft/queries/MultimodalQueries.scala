package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal-column operator coverage: binary payloads + typed metadata,
  * stub-decoded features, frame sampling (see graft.multimodal.Multimodal
  * for the decode-stub contract). The feature math is deterministic byte
  * arithmetic, so decode and frame-sample are oracle-checked end to end
  * (checksum is Spark-side only — no 31-fold hash in ANSI SQL).
  */
object MultimodalQueries {

  val queries: Seq[Query] = Seq(

    Query(
      "q_mm_decode",
      (s, d) =>
        Multimodal.decodeFeatures(Multimodal.mediaTable(s, d)).toDF()
          .select(col("doc_id"), col("n_bytes"), col("first_byte"),
            col("width"), col("height"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(LENGTH(text) AS BIGINT) AS n_bytes,
             |  ASCII(SUBSTRING(text, 1, 1)) AS first_byte,
             |  CAST(LENGTH(text) % 640 AS INT) AS width,
             |  CAST((ASCII(SUBSTRING(text, 1, 1)) * 3) % 480 AS INT) AS height
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Query(
      "q_mm_frames",
      (s, d) =>
        Multimodal.sampleFrames(Multimodal.mediaTable(s, d))
          .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"))
          .orderBy(col("doc_id"), col("chunk_idx")),
      Some("""SELECT doc_id, chunk_idx FROM (
             |  SELECT doc_id,
             |    UNNEST(range(0, (LENGTH(text) - 1) // 32 + 1)) AS chunk_idx
             |  FROM documents) x
             |WHERE chunk_idx % 4 = 0
             |ORDER BY doc_id, chunk_idx""".stripMargin)))
}
