package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.ImageCodec

/** The genuine BMP/PPM decode kernel: hand-computed sums on tiny images,
  * every row-padding residue, top-down BMPs, header comment handling,
  * and null (never throw / never garbage) on corrupt or unhandled
  * payloads. The end-to-end DataFrame path is oracle-checked by
  * `q_mm_image_stats`; these are the byte-level pins. */
class ImageCodecSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark

  // a 2x2 image with distinct per-pixel channels:
  //   (0,0)=R1,G2,B3   (1,0)=R4,G5,B6
  //   (0,1)=R7,G8,B9   (1,1)=R10,G11,B12
  private val px2 = (x: Int, y: Int) => {
    val base = (y * 2 + x) * 3
    ((base + 1) << 16) | ((base + 2) << 8) | (base + 3)
  }

  test("BMP: hand-checked sums, header fields, bottom-up layout") {
    val b = ImageCodec.encodeBmp(2, 2, px2)
    // real format invariants: magic, 54-byte header, row 2*3→8 padded
    assert(b(0) === 'B'.toByte && b(1) === 'M'.toByte)
    assert(b.length === 54 + 8 * 2)
    // bottom-up: the FIRST stored row is y=1, whose first pixel is
    // (0,1) = B9 G8 R7
    assert((b(54) & 0xff, b(55) & 0xff, b(56) & 0xff) === ((9, 8, 7)))
    val st = ImageCodec.stats(b)
    assert(st != null)
    assert(st.getInt(0) === 2) // width
    assert(st.getInt(1) === 2) // height
    assert(st.getInt(2) === 3) // channels
    assert(st.getLong(3) === 4L) // n_pixels
    assert(st.getLong(4) === (1 + 4 + 7 + 10).toLong) // sum_r
    assert(st.getLong(5) === (2 + 5 + 8 + 11).toLong) // sum_g
    assert(st.getLong(6) === (3 + 6 + 9 + 12).toLong) // sum_b
  }

  test("BMP: every row-padding residue decodes (widths 1..8, sums match the pixel fn)") {
    (1 to 8).foreach { w =>
      val h = 3
      val b = ImageCodec.encodeBmp(w, h, (x, y) =>
        ((x + y) << 16) | (x << 8) | y)
      assert(b.length === 54 + (w * 3 + 3) / 4 * 4 * h, s"w=$w")
      val st = ImageCodec.stats(b)
      assert(st != null, s"w=$w")
      val expR = (for { x <- 0 until w; y <- 0 until h } yield x + y).sum
      val expG = (for { x <- 0 until w; _ <- 0 until h } yield x).sum
      val expB = (for { _ <- 0 until w; y <- 0 until h } yield y).sum
      assert(st.getLong(4) === expR.toLong, s"w=$w")
      assert(st.getLong(5) === expG.toLong, s"w=$w")
      assert(st.getLong(6) === expB.toLong, s"w=$w")
    }
  }

  test("BMP: negative height (top-down) decodes with identical sums") {
    val b = ImageCodec.encodeBmp(5, 4, px2)
    val st0 = ImageCodec.stats(b)
    // patch the height field to -4 (little-endian two's complement):
    // row ORDER flips but the pixel multiset — hence the sums — do not
    val neg = b.clone()
    val v = -4
    neg(22) = (v & 0xff).toByte
    neg(23) = ((v >> 8) & 0xff).toByte
    neg(24) = ((v >> 16) & 0xff).toByte
    neg(25) = ((v >> 24) & 0xff).toByte
    val st = ImageCodec.stats(neg)
    assert(st != null)
    assert(st.getInt(1) === 4)
    assert((4 to 6).forall(i => st.getLong(i) === st0.getLong(i)))
  }

  test("PPM: hand-checked sums; comments and whitespace in the header") {
    val p = ImageCodec.encodePpm(2, 2, px2)
    assert(p(0) === 'P'.toByte && p(1) === '6'.toByte)
    val st = ImageCodec.stats(p)
    assert(st != null)
    assert((st.getInt(0), st.getInt(1), st.getLong(3)) === ((2, 2, 4L)))
    assert(st.getLong(4) === 22L) // 1+4+7+10
    assert(st.getLong(5) === 26L)
    assert(st.getLong(6) === 30L)

    // the same pixel bytes behind a comment-bearing header parse equally
    val pixels = p.drop("P6\n2 2\n255\n".length)
    val hdr = "P6 # a comment\n# another\n 2\t2 # geom\n255\n"
      .getBytes("US-ASCII")
    val st2 = ImageCodec.stats(hdr ++ pixels)
    assert(st2 != null)
    assert((0 to 2).forall(i => st2.getInt(i) === st.getInt(i)))
    assert((3 to 6).forall(i => st2.getLong(i) === st.getLong(i)))
  }

  test("corrupt, truncated and unhandled payloads return null, never throw") {
    val good = ImageCodec.encodeBmp(4, 4, px2)
    assert(ImageCodec.stats(null) === null)
    assert(ImageCodec.stats(Array.emptyByteArray) === null)
    assert(ImageCodec.stats("JFIF????".getBytes) === null) // foreign magic
    assert(ImageCodec.stats(good.take(53)) === null) // truncated header
    assert(ImageCodec.stats(good.take(60)) === null) // truncated pixels
    val bpp32 = good.clone(); bpp32(28) = 32 // valid BMP we don't decode
    assert(ImageCodec.stats(bpp32) === null)
    val rle = good.clone(); rle(30) = 1 // BI_RLE8 compression
    assert(ImageCodec.stats(rle) === null)
    val ppmBad = ImageCodec.encodePpm(3, 3, px2)
    assert(ImageCodec.stats(ppmBad.take(12)) === null) // truncated PPM
    assert(ImageCodec.stats("P6\n-3 2\n255\n".getBytes) === null)
    assert(ImageCodec.stats("P6\n2 2\n65535\n".getBytes) === null) // 16-bit
  }

  test("image_stats expression: codegen'd scan-local decode, nulls flag bad rows") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val rows = Seq(
      (1L, ImageCodec.encodeBmp(3, 2, px2)),
      (2L, ImageCodec.encodePpm(3, 2, px2)),
      (3L, "not an image at all".getBytes))
    val out = rows.toDF("id", "payload")
      .selectExpr("id", "image_stats(payload) AS st")
      .selectExpr("id", "st.width AS w", "st.sum_r AS sr")
      .orderBy("id").collect()
    assert(out(0).getInt(1) === 3)
    assert(out(1).getInt(1) === 3)
    // BMP and PPM of the same pixel fn agree on every stat
    assert(out(0).getLong(2) === out(1).getLong(2))
    assert(out(2).isNullAt(1) && out(2).isNullAt(2)) // bad row → null
    // and the kernel runs inside whole-stage codegen (no interpreted
    // fallback row in the plan) — a local Seq would fold into a
    // LocalTableScan at plan time, so pin it on a file-backed scan
    val dir = java.nio.file.Files
      .createTempDirectory("graft_imgcg_").toString + "/t"
    rows.toDF("id", "payload").write.parquet(dir)
    val plan = spark.read.parquet(dir)
      .selectExpr("image_stats(payload) AS st")
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a whole-stage-codegen'd node in the
    // one-line plan render — the decode projection must carry it
    assert(plan.linesIterator.exists(l =>
      l.contains("image_stats") && l.trim.startsWith("*(")), plan)
  }
}
