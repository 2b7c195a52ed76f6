package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{FakeCodec, Media}

/** Multimodal plumbing: typed schema, deterministic stub decode, batch
  * shape, frame sampling. */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark

  test("stub codec is deterministic byte arithmetic") {
    val m = Media(7L, "text/plain", "hello".getBytes("UTF-8"))
    val f = FakeCodec.decode(m)
    assert(f.doc_id === 7L)
    assert(f.n_bytes === 5L)
    assert(f.first_byte === 'h'.toInt)
    assert(f.width === 5)
    assert(f.height === ('h'.toInt * 3) % 480)
    assert(FakeCodec.decode(m) === f)
  }

  test("decodeFeatures keeps every row and its schema") {
    val media = Multimodal.mediaTable(spark, SparkFixture.sf)
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.count() === media.count())
    assert(feats.columns.toSeq === Seq(
      "doc_id", "format", "n_bytes", "first_byte", "width", "height",
      "checksum"))
    assert(feats.filter(feats("n_bytes") <= 0).count() === 0)
  }

  test("decode runs partition-local (no shuffle in the plan)") {
    val plan = Multimodal.decodeFeatures(
      Multimodal.mediaTable(spark, SparkFixture.sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("binaryFile ingestion: raw files become Media rows, glob prunes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bin")
    def write(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(dir.resolve(name), bytes)
    write("a.jpg", Array[Byte](-1, -40, -1, 1, 2, 3)) // jpeg-ish magic
    write("b.jpg", Array[Byte](-1, -40, 9, 8))
    write("skip.txt", "not media".getBytes)
    val media = Multimodal.mediaFromFiles(spark, dir.toString, glob = "*.jpg")
      .collect().sortBy(_.format)
    assert(media.length === 2) // txt pruned at listing time
    assert(media.forall(_.format == "jpg"))
    assert(media.map(_.payload.length).sorted.toSeq === Seq(4, 6))
    assert(media.map(_.doc_id).distinct.length === 2) // stable distinct ids
    // and the decode pipeline runs unchanged over file-sourced media
    val feats = Multimodal.decodeFeatures(
      Multimodal.mediaFromFiles(spark, dir.toString, glob = "*.jpg"))
      .collect()
    assert(feats.length === 2)
    assert(feats.forall(f => f.first_byte === 0xff))
  }

  test("sampleFrames emits every 4th chunk per document") {
    val media = Multimodal.mediaTable(spark, SparkFixture.sf)
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, everyK = 4)
    val byDoc = frames.groupBy("doc_id").count()
    assert(byDoc.count() === media.count()) // ≥1 frame per doc
    val bad = frames.filter(frames("chunk_idx") % 4 =!= 0).count()
    assert(bad === 0)
  }
}
