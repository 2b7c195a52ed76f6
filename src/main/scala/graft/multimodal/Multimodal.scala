package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.engine.Tables

/** Multimodal-column support for training-data pipelines: media payloads
  * as opaque `binary` columns with typed metadata, and decode /
  * feature-extract / frame-sample operators over them.
  *
  * The Spark-side plumbing is real — schema, partition-preserving
  * `mapPartitions` in fixed-size batches (the shape a vectorized decoder
  * wants), typed Datasets — but the codec itself is STUBBED with a
  * deterministic byte-level computation: the image/audio libraries are
  * not in this container. Swapping `FakeCodec` for a real JNI/OpenCV
  * decoder changes no plan shape, no partitioning, and no schema.
  *
  * Scale: decode runs partition-local with zero shuffle; a 100 TB media
  * corpus decodes at scan parallelism, and the per-partition batching
  * amortizes per-call codec setup exactly like an arrow-batch UDF would.
  */
object Multimodal {

  /** A media row: payload bytes + metadata columns. */
  final case class Media(doc_id: Long, format: String, payload: Array[Byte])

  /** Extracted features (all deterministic from bytes in the stub). */
  final case class MediaFeatures(
      doc_id: Long, format: String, n_bytes: Long, first_byte: Int,
      width: Int, height: Int, checksum: Long)

  /** Deterministic stand-in for the real decoder. Replace with the real
    * codec here — the operator pipeline stays untouched. */
  object FakeCodec {
    val DecodeBatchSize = 64
    def decode(m: Media): MediaFeatures = {
      val n = m.payload.length.toLong
      val first = if (m.payload.isEmpty) 0 else m.payload(0) & 0xff
      var sum = 0L
      var i = 0
      while (i < m.payload.length) { sum = sum * 31 + (m.payload(i) & 0xff); i += 1 }
      MediaFeatures(m.doc_id, m.format,
        n, first,
        width = (n % 640).toInt, height = (first * 3) % 480,
        checksum = sum & 0x7fffffffL)
    }
  }

  /** The documents fixture lifted into a media table: payload = UTF-8
    * bytes of the text (the fixtures ship no true binary column; the
    * pipeline is payload-agnostic). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), lit("text/plain").as("format"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[Media]
  }

  /** REAL-image media table derived from the documents fixture: each doc
    * becomes a genuine raster payload — even ids a 24-bit BMP (bottom-up
    * rows, 4-byte padding), odd ids a binary PPM (P6) — with
    * deterministic geometry and pixel gradients from doc_id, so DuckDB
    * can replay the decoded stats analytically (`q_mm_image_stats`).
    * The ENCODE here is fixture generation (the container ships no image
    * corpus — a typed map is the honest tool for synthesizing binary
    * payloads); the decode side is the native codegen'd
    * `image_stats` expression ([[graft.functions.ImageStats]]).
    * Pixel (top-left origin): R=(x+y+id)%256, G=(2y+id)%256,
    * B=(x+id)%256; width 8+id%9 (exercises every row-padding residue),
    * height 6+id%5. */
  def imageTable(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id")).as[Long].map { id =>
        val w = (8 + id % 9).toInt
        val h = (6 + id % 5).toInt
        val px = (x: Int, y: Int) =>
          ((((x + y + id) % 256).toInt << 16) |
            (((2 * y + id) % 256).toInt << 8) |
            ((x + id) % 256).toInt)
        if (id % 2 == 0) Media(id, "bmp", ImageCodec.encodeBmp(w, h, px))
        else Media(id, "ppm", ImageCodec.encodePpm(w, h, px))
      }
  }

  /** A media corpus from a directory of raw files via Spark's
    * `binaryFile` source — the ingestion path for an image/audio corpus
    * (one row per file: path, length, content). doc_id is a stable hash
    * of the file path, format the lower-cased extension. Scale notes:
    * binaryFile splits at file granularity (files never split), so
    * parallelism = file count; `pathGlobFilter` prunes by extension at
    * listing time and `spark.sql.files.maxPartitionBytes` groups small
    * files per task. */
  def mediaFromFiles(spark: SparkSession, dir: String,
      glob: String = "*"): Dataset[Media] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("doc_id"),
        lower(element_at(split(col("path"), "\\."), -1)).as("format"),
        col("content").as("payload"))
      .as[Media]
  }

  /** Decode/feature-extract: partition-local, batched like a vectorized
    * decoder (grouped iterator — no full-partition materialization). */
  def decodeFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(FakeCodec.DecodeBatchSize)
        .flatMap(batch => batch.map(FakeCodec.decode))
    }
  }

  /** Frame sampling as an operator shape: every k-th fixed-size chunk of
    * the payload becomes a "frame" row (video frame-sample analogue) —
    * one row explodes into a bounded number of frame rows, no shuffle. */
  def sampleFrames(media: Dataset[Media], frameBytes: Int = 32,
      everyK: Int = 4): DataFrame =
    media.toDF()
      .select(col("doc_id"),
        posexplode(sequence(lit(0),
          greatest(floor((length(col("payload")) - 1) / frameBytes)
            .cast("int"), lit(0)))))
      .withColumnRenamed("pos", "chunk_idx")
      .where(col("chunk_idx") % everyK === 0)
      .select(col("doc_id"), col("chunk_idx"))
}
