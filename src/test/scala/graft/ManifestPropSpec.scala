package graft

import scala.util.Random

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.StatsManifest
import graft.sources.StatsManifest.{ColStats, FileStats}

/** SOUNDNESS fuzz for manifest pruning: `mayMatch` may only refute a
  * file when NO row in it can satisfy the predicate — a false "skip"
  * is a wrong query answer, a false "keep" is just an unpruned file.
  * Strategy (seeded, like McsPropSpec): generate random file contents
  * (longs + strings, with nulls), build stats exactly like the write
  * path (min/max in the stats domain, non-null count, bloom over
  * xxhash64), generate random predicate trees over every supported
  * shape, evaluate each predicate ROW-BY-ROW with Catalyst's own eval,
  * and assert any-row-matches ⇒ mayMatch. 6000 cases. */
class ManifestPropSpec extends AnyFunSuite {

  private val aL = AttributeReference("a", LongType)()
  private val aS = AttributeReference("s", StringType)()

  // ---- stats construction mirroring the write path ------------------ //

  private def bloomOf(hashes: Seq[Long]): Array[Byte] = {
    val agg = StatsManifest.BloomAgg(256)
    var buf = agg.zero
    hashes.foreach(h => buf = agg.reduce(buf, h))
    agg.finish(buf)
  }

  private def hashLong(v: Long): Long =
    XxHash64(Seq(Literal(v, LongType)), 42L).eval(null).asInstanceOf[Long]
  private def hashStr(v: String): Long =
    XxHash64(Seq(Literal(UTF8String.fromString(v), StringType)), 42L)
      .eval(null).asInstanceOf[Long]

  private def ucmp(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  private def fileStats(longs: Seq[Option[Long]],
      strs: Seq[Option[String]], withBloom: Boolean): FileStats = {
    val lNN = longs.flatten
    val sNN = strs.flatten
    val lSt = ColStats('L',
      lLo = if (lNN.nonEmpty) lNN.min else 0L,
      lHi = if (lNN.nonEmpty) lNN.max else 0L,
      nonNull = lNN.size.toLong, hasRange = lNN.nonEmpty,
      bloom = if (withBloom) bloomOf(lNN.map(hashLong)) else null,
      lSum = lNN.sum, hasSum = lNN.nonEmpty)
    val sSt = ColStats('S',
      sLo = if (sNN.nonEmpty) sNN.reduce((x, y) =>
        if (ucmp(x, y) <= 0) x else y) else null,
      sHi = if (sNN.nonEmpty) sNN.reduce((x, y) =>
        if (ucmp(x, y) >= 0) x else y) else null,
      nonNull = sNN.size.toLong, hasRange = sNN.nonEmpty,
      bloom = if (withBloom) bloomOf(sNN.map(hashStr)) else null)
    FileStats(longs.size.toLong, Map("a" -> lSt, "s" -> sSt))
  }

  // ---- generators ---------------------------------------------------- //

  private val strPool = Array("", "a", "ab", "b", "ba", "zz", "éé",
    "éa", "M", "m", "mm")

  private def genLong(r: Random): Long = r.nextInt(41).toLong - 20L
  private def genStr(r: Random): String = strPool(r.nextInt(strPool.length))
  private def lLit(r: Random): Expression = Literal(genLong(r), LongType)
  private def sLit(r: Random): Expression =
    Literal(UTF8String.fromString(genStr(r)), StringType)

  private def leaf(r: Random): Expression = r.nextInt(19) match {
    case 0 => EqualTo(aL, lLit(r))
    case 1 => EqualTo(lLit(r), aL)
    case 2 => EqualTo(aS, sLit(r))
    case 3 => GreaterThan(aL, lLit(r))
    case 4 => LessThan(aL, lLit(r))
    case 5 => GreaterThanOrEqual(aL, lLit(r))
    case 6 => LessThanOrEqual(aL, lLit(r))
    case 7 => GreaterThan(lLit(r), aL)
    case 8 => LessThan(lLit(r), aL)
    case 9 => GreaterThan(aS, sLit(r))
    case 10 => LessThan(aS, sLit(r))
    case 11 => In(aL, Seq.fill(3)(lLit(r)))
    case 12 => IsNull(aL)
    case 13 => IsNotNull(aL)
    case 14 => IsNull(aS)
    case 15 => IsNotNull(aS)
    case 16 => Not(EqualTo(aL, lLit(r)))
    case 17 => EqualNullSafe(aS, sLit(r))
    case 18 => StartsWith(aS,
      Literal(UTF8String.fromString(genStr(r)), StringType))
  }

  private def tree(r: Random, depth: Int): Expression =
    if (depth <= 0 || r.nextInt(5) < 3) leaf(r)
    else if (r.nextBoolean()) And(tree(r, depth - 1), tree(r, depth - 1))
    else Or(tree(r, depth - 1), tree(r, depth - 1))

  /** Catalyst-eval `e` on one row — the ground truth mayMatch must not
    * contradict. */
  private def rowMatches(e: Expression, l: Option[Long],
      s: Option[String]): Boolean = {
    val bound = e.transform {
      case a: AttributeReference if a.name == "a" =>
        Literal(l.map(Long.box).orNull, LongType)
      case a: AttributeReference if a.name == "s" =>
        Literal(s.map(UTF8String.fromString).orNull, StringType)
    }
    bound.eval(null) == true
  }

  test("mayMatch is SOUND: a file with a matching row is never refuted (with and without blooms)") {
    val r = new Random(20260815L)
    (0 until 6000).foreach { caseId =>
      val n = r.nextInt(13)
      val ls = Seq.fill(n)(if (r.nextInt(5) == 0) None else Some(genLong(r)))
      val ss = Seq.fill(n)(if (r.nextInt(5) == 0) None else Some(genStr(r)))
      val withBloom = r.nextBoolean()
      val pred = tree(r, 2)
      val fs = fileStats(ls, ss, withBloom)
      val anyRow = ls.zip(ss).exists { case (l, s) => rowMatches(pred, l, s) }
      if (anyRow)
        assert(StatsManifest.mayMatch(pred, fs),
          s"UNSOUND (case $caseId): refuted a matching file\npred=$pred\n" +
            s"rows=${ls.zip(ss)}\nbloom=$withBloom")
    }
  }

  test("pruning has teeth: definitely-absent point lookups ARE refuted") {
    // not a soundness requirement, but the reason the layer exists —
    // guard against a regression that silently keeps everything
    val fs = fileStats(Seq(Some(1L), Some(2L), Some(3L)),
      Seq(Some("a"), Some("b"), Some("c")), withBloom = true)
    assert(!StatsManifest.mayMatch(EqualTo(aL, Literal(99L)), fs))
    assert(!StatsManifest.mayMatch(
      EqualTo(aS, Literal(UTF8String.fromString("zzz"), StringType)), fs))
    assert(StatsManifest.Bloom.mayContain(fs.cols("a").bloom, hashLong(2L)))
    // in-range but bloom-refutable: 1..3 range admits 2 ∈ [1,3] only if
    // present; a range-only manifest keeps it, the bloom still keeps
    // TRUE members — spot-check an in-range ABSENT value refutes via
    // bloom with high probability on a 256-bit filter with 3 entries
    val fsWide = fileStats(Seq(Some(1L), Some(100L)), Seq.empty,
      withBloom = true)
    assert(!StatsManifest.mayMatch(EqualTo(aL, Literal(50L)), fsWide))
  }
}
