package graft

import scala.util.Random

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.cep.Cep

/** Randomized differential test: the CEP NFA against `java.util.regex`.
  *
  * The NFA's documented contract — leftmost start, per-quantifier greedy
  * (or reluctant) consumption with backtracking, strict contiguity,
  * SKIP_PAST_LAST non-overlap — is exactly Java regex `find()`-loop
  * semantics over the per-key event-type string, with each step compiled
  * to a capture group `(x+)`, `(x?)`, `(x{m,n})`, `(x+?)`, …. So for
  * random patterns and random event strings the two must agree on every
  * match: consumed range AND the per-step event assignment. A mismatch in
  * either direction is a real NFA bug (or a semantics drift from the
  * reference, which implements the same contract).
  */
class CepPropSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark

  private val letters = Vector("a", "b", "c")
  // (pattern-spec suffix, regex suffix) — the FULL quantifier surface
  // Cep.pattern parses: greedy/reluctant one-or-more and optional,
  // bounded and open-ended Times, zero-min Times
  private val quants = Vector(
    "" -> "", "+" -> "+", "?" -> "?", "+?" -> "+?", "??" -> "??",
    "{1,2}" -> "{1,2}", "{2,3}" -> "{2,3}", "{1,2}?" -> "{1,2}?",
    "{2}" -> "{2}", "{1,}" -> "{1,}", "{0,2}" -> "{0,2}")

  /** quantifiers that can match ZERO events (an all-zero-min pattern
    * matches empty everywhere — excluded by construction). */
  private val zeroMin = Set("?", "??", "{0,2}")

  test("NFA matches == java.util.regex find() matches on random inputs") {
    import spark.implicits._
    val rnd = new Random(20260813L)
    var totalMatches = 0

    (1 to 14).foreach { trial =>
      // 2-3 steps; letters may repeat across steps (overlapping
      // predicates are the backtracking stress case); not all-optional
      val nSteps = 2 + rnd.nextInt(2)
      val stepDefs = (0 until nSteps).map { i =>
        (s"s$i", letters(rnd.nextInt(3)), quants(rnd.nextInt(quants.size)))
      }
      val allOpt = stepDefs.forall(d => zeroMin.contains(d._3._1))
      val defs = if (allOpt) stepDefs.updated(0,
        (stepDefs.head._1, stepDefs.head._2, "+" -> "+")) else stepDefs

      val spec = defs.map(d => d._1 + d._3._1).mkString(" ")
      val regex = java.util.regex.Pattern.compile(
        defs.map(d => s"(${d._2}${d._3._2})").mkString)
      val preds: Map[String, org.apache.spark.sql.Row => Boolean] =
        defs.map(d => d._1 -> ((r: org.apache.spark.sql.Row) =>
          r.getString(3) == d._2)).toMap

      // 15 random event strings, one key each, matched in ONE Spark job
      val strings = (0 until 15).map(k =>
        k.toLong -> (1 to 6 + rnd.nextInt(9))
          .map(_ => letters(rnd.nextInt(3))).mkString).toMap
      val rows = strings.toSeq.flatMap { case (k, s) =>
        s.zipWithIndex.map { case (ch, i) =>
          (k, new java.sql.Timestamp(1000L * i), i.toLong, ch.toString)
        }
      }
      val df = rows.toDF("user_id", "ts", "event_id", "event_type")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))

      val steps = Cep.pattern(spec, preds)
      val got = Cep.matchPattern(df, "user_id", "ts", "event_id", steps)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
        .groupBy(_._1)
        .view.mapValues(_.groupBy(_._4).toSeq.sortBy(_._1).map {
          case (_, hits) =>
            defs.map(d => hits.filter(_._2 == d._1).map(_._3).sorted.toSeq)
        }).toMap

      strings.foreach { case (k, s) =>
        // expected: regex find() loop = leftmost, greedy-backtracking,
        // skip past last (advance by 1 on an empty match)
        val m = regex.matcher(s)
        val expected = scala.collection.mutable.ArrayBuffer
          .empty[Seq[Seq[Long]]]
        var from = 0
        while (from <= s.length && m.find(from)) {
          expected += defs.indices.map { g =>
            val st = m.start(g + 1)
            if (st < 0) Seq.empty[Long]
            else (st.toLong until m.end(g + 1).toLong).toSeq
          }
          from = if (m.end > m.start) m.end else m.start + 1
        }
        val actual = got.getOrElse(k, Seq.empty)
        assert(actual === expected.toSeq,
          s"trial $trial pattern '$spec' events '$s': NFA=$actual " +
            s"regex=${expected.toSeq}")
        totalMatches += expected.map(_.map(_.size).sum).sum
      }
    }
    // the generator must actually exercise matches, not vacuous agreement
    assert(totalMatches > 200, s"only $totalMatches matched events")
  }

  test("relaxed/negated NFA matches == regex with gap classes and lookahead") {
    import spark.implicits._
    // followedBy with leftmost-take semantics IS `(?:[^L]*)(L)` — the gap
    // skips exactly the events the step predicate rejects; notNext is a
    // negative lookahead `(?!x)`; notFollowedBy restricts the gap class
    // to `[^Lx]*`. Relaxed steps are quant-One here (a quantified relaxed
    // step consumes non-contiguous positions, which a regex capture group
    // cannot express — covered by hand-built CepSpec cases instead).
    val rnd = new Random(20260814L)
    var totalMatches = 0

    // element: (specToken, regexFragment, emitName or null for negatives)
    (1 to 10).foreach { trial =>
      val nPos = 2 + rnd.nextInt(2)
      val tokens = scala.collection.mutable.ArrayBuffer.empty[String]
      val regexSb = new StringBuilder
      var preds = Map.empty[String, org.apache.spark.sql.Row => Boolean]
      (0 until nPos).foreach { i =>
        val letter = letters(rnd.nextInt(3))
        val name = s"s$i"
        preds += name -> ((r: org.apache.spark.sql.Row) =>
          r.getString(3) == letter)
        val relaxed = i > 0 && rnd.nextBoolean()
        // optional negative guard before a non-first step
        var gapGuard: Option[String] = None
        if (i > 0 && rnd.nextInt(10) < 4) {
          val gl = letters(rnd.nextInt(3))
          val gname = s"n$i"
          preds += gname -> ((r: org.apache.spark.sql.Row) =>
            r.getString(3) == gl)
          if (relaxed && rnd.nextBoolean()) {
            tokens += "~>"; tokens += s"!$gname" // notFollowedBy
            gapGuard = Some(gl)
          } else {
            tokens += s"!$gname" // notNext
            regexSb ++= s"(?!$gl)"
          }
        }
        if (relaxed) {
          tokens += "~>"; tokens += name
          val excl = (Set(letter) ++ gapGuard).mkString
          regexSb ++= s"(?:[^$excl]*)($letter)"
        } else {
          val (qSpec, qRe) =
            if (i == 0) quants.filterNot(q => zeroMin(q._1))(
              rnd.nextInt(quants.size - zeroMin.size))
            else quants(rnd.nextInt(quants.size))
          tokens += name + qSpec
          regexSb ++= s"($letter$qRe)"
        }
      }
      val spec = tokens.mkString(" ")
      val regex = java.util.regex.Pattern.compile(regexSb.toString)

      val strings = (0 until 15).map(k =>
        k.toLong -> (1 to 6 + rnd.nextInt(9))
          .map(_ => letters(rnd.nextInt(3))).mkString).toMap
      val rows = strings.toSeq.flatMap { case (k, s) =>
        s.zipWithIndex.map { case (ch, i) =>
          (k, new java.sql.Timestamp(1000L * i), i.toLong, ch.toString)
        }
      }
      val df = rows.toDF("user_id", "ts", "event_id", "event_type")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))

      val steps = Cep.pattern(spec, preds)
      val posNames = steps.filterNot(_.negated).map(_.name)
      val got = Cep.matchPattern(df, "user_id", "ts", "event_id", steps)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
        .groupBy(_._1)
        .view.mapValues(_.groupBy(_._4).toSeq.sortBy(_._1).map {
          case (_, hits) =>
            posNames.map(n => hits.filter(_._2 == n).map(_._3).sorted.toSeq)
        }).toMap

      strings.foreach { case (k, s) =>
        val m = regex.matcher(s)
        val expected = scala.collection.mutable.ArrayBuffer
          .empty[Seq[Seq[Long]]]
        var from = 0
        while (from <= s.length && m.find(from)) {
          expected += posNames.indices.map { g =>
            val st = m.start(g + 1)
            if (st < 0) Seq.empty[Long]
            else (st.toLong until m.end(g + 1).toLong).toSeq
          }
          from = if (m.end > m.start) m.end else m.start + 1
        }
        val actual = got.getOrElse(k, Seq.empty)
        assert(actual === expected.toSeq,
          s"trial $trial pattern '$spec' regex '${regexSb}' events '$s': " +
            s"NFA=$actual regex=${expected.toSeq}")
        totalMatches += expected.map(_.map(_.size).sum).sum
      }
    }
    assert(totalMatches > 150, s"only $totalMatches matched events")
  }

  test("streaming NFA == batch NFA on random strict/relaxed/negated/alt patterns") {
    // the strongest guard on the incremental matcher's emission
    // discipline (touchedEnd / provisional-guard logic): for random
    // patterns over the full surface and random streams split across
    // micro-batches, the streaming output must equal the batch scan of
    // the same data. A trailing round of one event per letter closes
    // every key's open tail (both sides see it, so parity is exact).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rnd = new Random(20260815L)
    var totalMatches = 0
    (1 to 6).foreach { trial =>
      val nPos = 2 + rnd.nextInt(2)
      val tokens = scala.collection.mutable.ArrayBuffer.empty[String]
      var preds = Map.empty[String, org.apache.spark.sql.Row => Boolean]
      (0 until nPos).foreach { i =>
        def letterPred(l: String): org.apache.spark.sql.Row => Boolean =
          r => r.getString(3) == l
        val relaxed = i > 0 && rnd.nextBoolean()
        if (i > 0 && rnd.nextInt(10) < 3) { // negation before the step
          val gl = letters(rnd.nextInt(3)); val gname = s"n$i"
          preds += gname -> letterPred(gl)
          if (relaxed && rnd.nextBoolean()) { tokens += "~>"; tokens += s"!$gname" }
          else tokens += s"!$gname"
        }
        if (relaxed) tokens += "~>"
        if (!relaxed && rnd.nextInt(10) < 3) { // alternation group
          val l1 = letters(rnd.nextInt(3))
          val l2 = letters.filterNot(_ == l1)(rnd.nextInt(2))
          preds += s"x$i" -> letterPred(l1)
          preds += s"y$i" -> letterPred(l2)
          val q = if (i == 0) "+" else quants(rnd.nextInt(quants.size))._1
          tokens += s"(x$i|y$i)$q"
        } else {
          val name = s"s$i"
          preds += name -> letterPred(letters(rnd.nextInt(3)))
          val q =
            if (relaxed) "" // relaxed steps: quant-One keeps runtimes sane
            else if (i == 0) quants.filterNot(p => zeroMin(p._1))(
              rnd.nextInt(quants.size - zeroMin.size))._1
            else quants(rnd.nextInt(quants.size))._1
          tokens += name + q
        }
      }
      val spec = tokens.mkString(" ")
      val steps = Cep.pattern(spec, preds)
      // skip strategy fuzzed too: skip-past-last (disjoint matches) and
      // skip-to-next (overlapping) exercise the position-based
      // after-match arithmetic on non-contiguous relaxed matches
      val skip = if (rnd.nextBoolean()) Cep.SkipPastLast else Cep.SkipToNext

      // timeline starts WELL past the initial watermark (0): an event at
      // ms 0 would be dropped as late by the EventTimeTimeout operator
      // before reaching the NFA — standard watermark semantics, not a
      // matcher property
      val t0 = 3_600_000L
      val baseRows = (0 until 12).flatMap { k =>
        (0 until 6 + rnd.nextInt(8)).map(i =>
          (k.toLong, t0 + 1000L * i, i.toLong, letters(rnd.nextInt(3))))
      }
      // closers: one event of each letter per key near the end (creates
      // tail matches), plus ONE far-future no-letter sentinel that
      // advances the watermark past every start's `within` horizon so
      // the stream force-resolves open greedy tails (flushOnHorizon) —
      // without a flush, a trailing `x{0,2}` at end-of-input is
      // legitimately provisional forever. The sentinel matches no
      // predicate, so it anchors nothing on either side; `within` is
      // far wider than the stream span, so it never constrains a match.
      val keys = baseRows.map(_._1).distinct
      val closers = keys.flatMap(k => letters.zipWithIndex.map {
        case (l, j) => (k, t0 + 100000L + 1000L * j, 500L + j, l)
      })
      val withinMs = 1000_000L // 1000 s >> the ~103 s stream span
      val sentinel = Seq((0L, 10_000_000_000L, 999L, "z"))
      val all = baseRows ++ closers ++ sentinel

      val mem = MemoryStream[(Long, Long, Long, String)]
      val df = mem.toDF().toDF("user_id", "ms", "event_id", "event_type")
        .select(col("user_id"),
          (col("ms") / 1000).cast("timestamp").as("ts"),
          col("event_id"), col("event_type"))
        .withWatermark("ts", "1 second")
      val name = s"t_cep_rand_$trial"
      val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id", steps,
          withinMicros = Some(withinMs * 1000L), flushOnHorizon = true,
          skip = skip)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      // time-ordered arrival, three batch splits + the closer batch
      val ordered = all.sortBy(e => (e._2, e._3))
      ordered.grouped(math.max(1, ordered.length / 3)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq); q.processAllAvailable()
      }
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      q.stop()
      val batchDf = all.toDF("user_id", "ms", "event_id", "event_type")
        .select(col("user_id"),
          (col("ms") / 1000).cast("timestamp").as("ts"),
          col("event_id"), col("event_type"))
      val want = Cep.matchPattern(batchDf, "user_id", "ts", "event_id",
          steps, withinMicros = Some(withinMs * 1000L), skip = skip)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getInt(3).toLong)).toSet
      assert(got === want, s"trial $trial pattern '$spec'")
      totalMatches += want.size

      // event-time mode under DISORDERED arrival: shuffle within 5-row
      // blocks (≤ 5 s displacement, inside the 30 s watermark delay so
      // nothing is dropped as late); the pending buffer must restore
      // (ts, id) order and reproduce the same batch result
      val memEt = MemoryStream[(Long, Long, Long, String)]
      val dfEt = memEt.toDF().toDF("user_id", "ms", "event_id", "event_type")
        .select(col("user_id"),
          (col("ms") / 1000).cast("timestamp").as("ts"),
          col("event_id"), col("event_type"))
        .withWatermark("ts", "30 seconds")
      val nameEt = s"t_cep_rand_et_$trial"
      val qEt = Cep.matchPatternStream(dfEt, "user_id", "ts", "event_id",
          steps, withinMicros = Some(withinMs * 1000L),
          flushOnHorizon = true, eventTime = true, skip = skip)
        .writeStream.format("memory").queryName(nameEt)
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      val disordered = ordered.grouped(5).flatMap(b =>
        rnd.shuffle(b)).toIndexedSeq
      disordered.grouped(math.max(1, disordered.length / 3)).foreach { c =>
        memEt.addData(c); qEt.processAllAvailable()
      }
      val gotEt = spark.table(nameEt).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      qEt.stop()
      assert(gotEt === want, s"trial $trial (event-time) pattern '$spec'")
    }
    assert(totalMatches > 100, s"only $totalMatches matched rows")
  }

  test("streaming NFA == batch NFA on random until/timesOrMore loop patterns") {
    // the predicate stop-condition surface: random loop quantifiers
    // (Plus / timesOrMore / bounded Times), strict and relaxed, with an
    // `until` stop letter that the following step consumes. Streaming
    // must equal batch, and for STRICT loops `until` must equal the
    // conjunction rewrite pred ∧ ¬stop (they are provably the same for
    // contiguous runs — a cheap cross-engine-path oracle; for RELAXED
    // loops they differ by design: the conjunction skips the stop
    // event, until hard-stops at it).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rnd = new Random(20260813L)
    var total = 0
    (1 to 5).foreach { trial =>
      def letterPred(l: String): org.apache.spark.sql.Row => Boolean =
        r => r.getString(3) == l
      val aL = letters(rnd.nextInt(3))
      val stopL = letters(rnd.nextInt(3))
      val bL = letters(rnd.nextInt(3))
      val bPred: org.apache.spark.sql.Row => Boolean =
        if (rnd.nextBoolean()) (r => r.getString(3) != aL) else letterPred(bL)
      val quant = Seq(Cep.Plus, Cep.timesOrMore(2),
        Cep.Times(1, 3))(rnd.nextInt(3))
      val relaxed = rnd.nextBoolean()
      val steps = Seq(
        Cep.Step("A", letterPred(aL)),
        Cep.Step("B", bPred, quant, relaxed = relaxed,
          until = Some(letterPred(stopL))),
        Cep.Step("C", letterPred(stopL), relaxed = relaxed))
      val skip = if (rnd.nextBoolean()) Cep.SkipPastLast else Cep.SkipToNext

      val t0 = 3_600_000L
      val baseRows = (0 until 12).flatMap { k =>
        (0 until 6 + rnd.nextInt(8)).map(i =>
          (k.toLong, t0 + 1000L * i, i.toLong, letters(rnd.nextInt(3))))
      }
      val keys = baseRows.map(_._1).distinct
      val closers = keys.flatMap(k => letters.zipWithIndex.map {
        case (l, j) => (k, t0 + 100000L + 1000L * j, 500L + j, l)
      })
      val withinMs = 1000_000L
      val sentinel = Seq((0L, 10_000_000_000L, 999L, "z"))
      val all = baseRows ++ closers ++ sentinel

      val batchDf = all.toDF("user_id", "ms", "event_id", "event_type")
        .select(col("user_id"),
          (col("ms") / 1000).cast("timestamp").as("ts"),
          col("event_id"), col("event_type"))
      val want = Cep.matchPattern(batchDf, "user_id", "ts", "event_id",
          steps, withinMicros = Some(withinMs * 1000L), skip = skip)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getInt(3).toLong)).toSet

      if (!relaxed) {
        val conj = Seq(
          Cep.Step("A", letterPred(aL)),
          Cep.Step("B", r => bPred(r) && !letterPred(stopL)(r), quant),
          Cep.Step("C", letterPred(stopL)))
        val wantConj = Cep.matchPattern(batchDf, "user_id", "ts",
            "event_id", conj, withinMicros = Some(withinMs * 1000L),
            skip = skip)
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            r.getInt(3).toLong)).toSet
        assert(want === wantConj,
          s"trial $trial: strict until != conjunction rewrite")
      }

      val mem = MemoryStream[(Long, Long, Long, String)]
      val df = mem.toDF().toDF("user_id", "ms", "event_id", "event_type")
        .select(col("user_id"),
          (col("ms") / 1000).cast("timestamp").as("ts"),
          col("event_id"), col("event_type"))
        .withWatermark("ts", "1 second")
      val name = s"t_cep_until_$trial"
      val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id",
          steps, withinMicros = Some(withinMs * 1000L),
          flushOnHorizon = true, skip = skip)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      val ordered = all.sortBy(e => (e._2, e._3))
      ordered.grouped(math.max(1, ordered.length / 3)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq); q.processAllAvailable()
      }
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      q.stop()
      assert(got === want, s"trial $trial until pattern " +
        s"(a=$aL stop=$stopL quant=$quant relaxed=$relaxed skip=$skip)")
      total += want.size
    }
    assert(total > 20, s"only $total matched rows across until trials")
  }

  test("NFA sequence-group matches == java.util.regex on random inputs") {
    // strict sequence groups map exactly onto regex: `(A B+){1,2} C` ==
    // `((?:ab+){1,2})(c)` — the group capture spans ALL iterations, and
    // both engines explore the same DFS order (greedy outer-first,
    // most-recent choice point varied first), so consumed position
    // ranges must agree match-for-match under the find() loop.
    import spark.implicits._
    val rnd = new Random(20260814L)
    val groupQuants = Vector("+" -> "+", "+?" -> "+?", "{1,2}" -> "{1,2}",
      "{2}" -> "{2}", "{1,}" -> "{1,}", "?" -> "?")
    val subQuants = Vector("" -> "", "+" -> "+", "{1,2}" -> "{1,2}")
    var totalMatches = 0
    (1 to 14).foreach { trial =>
      val hasPrefix = rnd.nextBoolean()
      // without an anchoring prefix keep the group non-zero-min so a
      // match always consumes at least one event
      val gq = if (hasPrefix) groupQuants(rnd.nextInt(groupQuants.size))
        else groupQuants(rnd.nextInt(groupQuants.size - 1))
      val sq = subQuants(rnd.nextInt(subQuants.size))
      val pL = letters(rnd.nextInt(3))
      val g0L = letters(rnd.nextInt(3))
      val g1L = letters(rnd.nextInt(3))
      val sL = letters(rnd.nextInt(3))
      val spec = (if (hasPrefix) "p0 " else "") +
        s"(g0 g1${sq._1})${gq._1} s2"
      val regex = java.util.regex.Pattern.compile(
        (if (hasPrefix) s"($pL)" else "") +
          s"((?:$g0L$g1L${sq._2})${gq._2})($sL)")
      val preds: Map[String, org.apache.spark.sql.Row => Boolean] = Map(
        "p0" -> (_.getString(3) == pL),
        "g0" -> (_.getString(3) == g0L),
        "g1" -> (_.getString(3) == g1L),
        "s2" -> (_.getString(3) == sL))
      val steps = Cep.pattern(spec, preds)

      val strings = (0 until 15).map(k =>
        k.toLong -> (1 to 8 + rnd.nextInt(7))
          .map(_ => letters(rnd.nextInt(3))).mkString).toMap
      val rows = strings.toSeq.flatMap { case (k, s) =>
        s.zipWithIndex.map { case (ch, i) =>
          (k, new java.sql.Timestamp(1000L * i), i.toLong, ch.toString)
        }
      }
      val df = rows.toDF("user_id", "ts", "event_id", "event_type")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
      // per match: element-wise sorted consumed positions, group
      // sub-labels merged into the group element
      val elemOf: Map[String, Int] =
        if (hasPrefix) Map("p0" -> 0, "g0" -> 1, "g1" -> 1, "s2" -> 2)
        else Map("g0" -> 0, "g1" -> 0, "s2" -> 1)
      val nElems = if (hasPrefix) 3 else 2
      val got = Cep.matchPattern(df, "user_id", "ts", "event_id", steps)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
        .groupBy(_._1)
        .view.mapValues(_.groupBy(_._4).toSeq.sortBy(_._1).map {
          case (_, hits) =>
            (0 until nElems).map(e => hits.filter(h => elemOf(h._2) == e)
              .map(_._3).sorted.toSeq)
        }).toMap
      strings.foreach { case (k, s) =>
        val m = regex.matcher(s)
        val expected = scala.collection.mutable.ArrayBuffer
          .empty[Seq[Seq[Long]]]
        var from = 0
        while (from <= s.length && m.find(from)) {
          expected += (1 to nElems).map { g =>
            val st = m.start(g)
            if (st < 0) Seq.empty[Long]
            else (st.toLong until m.end(g).toLong).toSeq
          }
          from = if (m.end > m.start) m.end else m.start + 1
        }
        val actual = got.getOrElse(k, Seq.empty)
        assert(actual === expected.toSeq,
          s"trial $trial pattern '$spec' events '$s': NFA=$actual " +
            s"regex=${expected.toSeq}")
        totalMatches += expected.map(_.map(_.size).sum).sum
      }
    }
    assert(totalMatches > 150, s"only $totalMatches matched events")
  }

  test("streaming NFA == batch NFA on random sequence-group patterns") {
    // the incremental matcher's group-boundary provisionality logic
    // (an iteration boundary at the buffer tip must hold the match open)
    // under random group shapes, micro-batch splits, and both skip
    // strategies; ordered and disordered (event-time) arrival.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rnd = new Random(20260816L)
    var total = 0
    (1 to 5).foreach { trial =>
      val gq = Vector("+", "{1,2}", "{2}", "+?")(rnd.nextInt(4))
      val sq = Vector("", "+", "{1,2}")(rnd.nextInt(3))
      val relaxedGroup = rnd.nextBoolean()
      val hasPrefix = rnd.nextBoolean()
      val spec = (if (hasPrefix) "p0 " else "") +
        (if (relaxedGroup && hasPrefix) "~> " else "") +
        s"(g0 g1$sq)$gq s2"
      // letters hoisted OUT of the lambdas: evaluating rnd inside the
      // predicate would draw a fresh letter per row (and drag the
      // test-class closure into the task)
      val Seq(pL, g0L, g1L, sL) =
        Seq.fill(4)(letters(rnd.nextInt(3)))
      def letterPred(l: String): org.apache.spark.sql.Row => Boolean =
        r => r.getString(3) == l
      val preds: Map[String, org.apache.spark.sql.Row => Boolean] = Map(
        "p0" -> letterPred(pL), "g0" -> letterPred(g0L),
        "g1" -> letterPred(g1L), "s2" -> letterPred(sL))
      val steps = Cep.pattern(spec, preds)
      // skip fuzz includes SKIP_TO of a group SUB-STEP name — both
      // engines must resolve it to the group element and prefer
      // positions consumed under that label
      val skip = Seq(Cep.SkipPastLast, Cep.SkipToNext,
        Cep.SkipToFirst("g1"), Cep.SkipToLast("g0"))(rnd.nextInt(4))

      val t0 = 3_600_000L
      val baseRows = (0 until 12).flatMap { k =>
        (0 until 6 + rnd.nextInt(8)).map(i =>
          (k.toLong, t0 + 1000L * i, i.toLong, letters(rnd.nextInt(3))))
      }
      val keys = baseRows.map(_._1).distinct
      val closers = keys.flatMap(k => letters.zipWithIndex.map {
        case (l, j) => (k, t0 + 100000L + 1000L * j, 500L + j, l)
      })
      val withinMs = 1000_000L
      val sentinel = Seq((0L, 10_000_000_000L, 999L, "z"))
      val all = baseRows ++ closers ++ sentinel

      val batchDf = all.toDF("user_id", "ms", "event_id", "event_type")
        .select(col("user_id"),
          (col("ms") / 1000).cast("timestamp").as("ts"),
          col("event_id"), col("event_type"))
      val want = Cep.matchPattern(batchDf, "user_id", "ts", "event_id",
          steps, withinMicros = Some(withinMs * 1000L), skip = skip)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getInt(3).toLong)).toSet

      val mem = MemoryStream[(Long, Long, Long, String)]
      val df = mem.toDF().toDF("user_id", "ms", "event_id", "event_type")
        .select(col("user_id"),
          (col("ms") / 1000).cast("timestamp").as("ts"),
          col("event_id"), col("event_type"))
        .withWatermark("ts", "1 second")
      val name = s"t_cep_group_$trial"
      val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id",
          steps, withinMicros = Some(withinMs * 1000L),
          flushOnHorizon = true, skip = skip)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      val ordered = all.sortBy(e => (e._2, e._3))
      ordered.grouped(math.max(1, ordered.length / 3)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq); q.processAllAvailable()
      }
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      q.stop()
      assert(got === want, s"trial $trial group pattern '$spec' skip=$skip")
      total += want.size

      // event-time mode under disordered arrival
      val memEt = MemoryStream[(Long, Long, Long, String)]
      val dfEt = memEt.toDF().toDF("user_id", "ms", "event_id", "event_type")
        .select(col("user_id"),
          (col("ms") / 1000).cast("timestamp").as("ts"),
          col("event_id"), col("event_type"))
        .withWatermark("ts", "30 seconds")
      val nameEt = s"t_cep_group_et_$trial"
      val qEt = Cep.matchPatternStream(dfEt, "user_id", "ts", "event_id",
          steps, withinMicros = Some(withinMs * 1000L),
          flushOnHorizon = true, eventTime = true, skip = skip)
        .writeStream.format("memory").queryName(nameEt)
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      val disordered = ordered.grouped(5).flatMap(b =>
        rnd.shuffle(b)).toIndexedSeq
      disordered.grouped(math.max(1, disordered.length / 3)).foreach { c =>
        memEt.addData(c); qEt.processAllAvailable()
      }
      val gotEt = spark.table(nameEt).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      qEt.stop()
      assert(gotEt === want,
        s"trial $trial (event-time) group pattern '$spec' skip=$skip")
    }
    assert(total > 20, s"only $total matched rows across group trials")
  }

  test("streaming NFA == batch NFA under TIGHT within horizons") {
    // every other battery uses a horizon wider than the stream span, so
    // the window never constrains a match; here the horizon is a few
    // events wide — matches die mid-attempt on window failure, the
    // flushOnHorizon timer force-resolves expired starts, and the
    // pruning must still equal the batch scan's within semantics
    // exactly. Patterns mix plain quantified steps and sequence groups.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rnd = new Random(20260817L)
    var total = 0
    (1 to 6).foreach { trial =>
      val Seq(aL, bL, cL) = Seq.fill(3)(letters(rnd.nextInt(3)))
      def lp(l: String): org.apache.spark.sql.Row => Boolean =
        r => r.getString(3) == l
      val preds: Map[String, org.apache.spark.sql.Row => Boolean] =
        Map("a0" -> lp(aL), "b1" -> lp(bL), "c2" -> lp(cL))
      val spec = rnd.nextInt(3) match {
        case 0 => "a0 b1+ c2"          // greedy tail the horizon must cut
        case 1 => "a0 ~> b1{1,2} c2"   // relaxed gap under the window
        case 2 => "(a0 b1)+ c2"        // group iterations under the window
      }
      val steps = Cep.pattern(spec, preds)
      val skip = if (rnd.nextBoolean()) Cep.SkipPastLast else Cep.SkipToNext
      // 4-14 s horizon over 1 s event spacing: matches span at most a
      // handful of events
      val withinMs = (4 + rnd.nextInt(11)) * 1000L

      val t0 = 3_600_000L
      val baseRows = (0 until 12).flatMap { k =>
        (0 until 8 + rnd.nextInt(8)).map(i =>
          (k.toLong, t0 + 1000L * i, i.toLong, letters(rnd.nextInt(3))))
      }
      // far-future sentinel pushes the watermark past every horizon so
      // the stream force-resolves all remaining starts
      val sentinel = Seq((0L, 10_000_000_000L, 999L, "z"))
      val all = baseRows ++ sentinel

      val batchDf = all.toDF("user_id", "ms", "event_id", "event_type")
        .select(col("user_id"),
          (col("ms") / 1000).cast("timestamp").as("ts"),
          col("event_id"), col("event_type"))
      val want = Cep.matchPattern(batchDf, "user_id", "ts", "event_id",
          steps, withinMicros = Some(withinMs * 1000L), skip = skip)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getInt(3).toLong)).toSet

      val mem = MemoryStream[(Long, Long, Long, String)]
      val df = mem.toDF().toDF("user_id", "ms", "event_id", "event_type")
        .select(col("user_id"),
          (col("ms") / 1000).cast("timestamp").as("ts"),
          col("event_id"), col("event_type"))
        .withWatermark("ts", "1 second")
      val name = s"t_cep_tight_$trial"
      val q = Cep.matchPatternStream(df, "user_id", "ts", "event_id",
          steps, withinMicros = Some(withinMs * 1000L),
          flushOnHorizon = true, skip = skip)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      val ordered = all.sortBy(e => (e._2, e._3))
      ordered.grouped(math.max(1, ordered.length / 4)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq); q.processAllAvailable()
      }
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      q.stop()
      assert(got === want,
        s"trial $trial pattern '$spec' within=${withinMs}ms skip=$skip")
      total += want.size

      // event-time mode under DISORDERED arrival with the same tight
      // horizon: the pending buffer's watermark-gated release must
      // interleave correctly with the flush timers (5-row shuffle stays
      // inside the 30 s watermark delay, so nothing is dropped as late)
      val memEt = MemoryStream[(Long, Long, Long, String)]
      val dfEt = memEt.toDF().toDF("user_id", "ms", "event_id", "event_type")
        .select(col("user_id"),
          (col("ms") / 1000).cast("timestamp").as("ts"),
          col("event_id"), col("event_type"))
        .withWatermark("ts", "30 seconds")
      val nameEt = s"t_cep_tight_et_$trial"
      val qEt = Cep.matchPatternStream(dfEt, "user_id", "ts", "event_id",
          steps, withinMicros = Some(withinMs * 1000L),
          flushOnHorizon = true, eventTime = true, skip = skip)
        .writeStream.format("memory").queryName(nameEt)
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      val disordered = ordered.grouped(5).flatMap(b =>
        rnd.shuffle(b)).toIndexedSeq
      disordered.grouped(math.max(1, disordered.length / 4)).foreach { c =>
        memEt.addData(c); qEt.processAllAvailable()
      }
      val gotEt = spark.table(nameEt).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      qEt.stop()
      assert(gotEt === want, s"trial $trial (event-time) pattern " +
        s"'$spec' within=${withinMs}ms skip=$skip")
    }
    assert(total > 20, s"only $total matched rows across tight trials")
  }
}
