package graft.cep

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

/** CEP / MATCH_RECOGNIZE core (reference StreamExecMatch.java:90 +
  * flink-libraries/flink-cep Pattern.java:50 — NFA pattern API): a
  * compact strict-contiguity NFA with One/Plus quantifiers and an
  * optional `within` horizon, run per key over event-time order.
  *
  * Execution shape: one shuffle on the key (groupBy via flatMapGroups),
  * in-memory sort of each key's timeline, linear NFA scan with
  * after-match skip-past-last (the reference's default skip strategy).
  * Per-key timelines are the unit of state — the same contract the
  * reference's keyed NFA state holds; a key's history must fit an
  * executor, keys scale out horizontally.
  *
  * Batch-first: on bounded input this equals the reference's streaming
  * result; an incremental `flatMapGroupsWithState` variant would buffer
  * until watermark — documented as round-2 work.
  */
object Cep {

  sealed trait Quant
  case object One extends Quant
  /** one or more, greedy */
  case object Plus extends Quant
  /** zero or one, greedy (reference Pattern.optional) */
  case object Opt extends Quant
  /** between min and max occurrences inclusive (reference
    * Pattern.times(from, to)); max = Int.MaxValue → unbounded.
    * `greedy = false` is the reference's reluctant mode (`oneOrMore`
    * without `.greedy()`): the quantifier consumes as FEW events as let
    * the rest of the pattern match, instead of as many. */
  final case class Times(min: Int, max: Int,
      greedy: Boolean = true) extends Quant

  private def bounds(q: Quant): (Int, Int, Boolean) = q match {
    case One => (1, 1, true)
    case Plus => (1, Int.MaxValue, true)
    case Opt => (0, 1, true)
    case Times(mn, mx, g) =>
      require(mn >= 0 && mx >= mn && mx >= 1, s"bad Times($mn,$mx)")
      (mn, mx, g)
  }

  /** What the scan does after a completed match (reference
    * AfterMatchSkipStrategy.java): resume after the last consumed event
    * (the default — matches never overlap), at the event right after the
    * match's start (overlapping matches allowed), or at the first/last
    * event the named step consumed (SKIP_TO_FIRST/SKIP_TO_LAST). Where
    * the reference throws on a skip that would not advance (skip-to-first
    * of the starting step), the scan advances one event instead. */
  sealed trait SkipStrategy
  case object SkipPastLast extends SkipStrategy
  case object SkipToNext extends SkipStrategy
  final case class SkipToFirst(step: String) extends SkipStrategy
  final case class SkipToLast(step: String) extends SkipStrategy

  final case class Step(name: String, pred: Row => Boolean,
      quant: Quant = One)

  /** Event time in microseconds — Timestamp.getTime truncates to ms and
    * the fixtures (and oracles) carry microsecond precision, so ordering
    * and `within` arithmetic must not quantize. */
  private def tsMicros(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000 + t.getNanos / 1000

  /** A match: key, per-step matched event ids, first/last timestamps. */
  final case class PatternMatch(key: Long, step_ids: Map[String, Seq[Long]],
      first_ts: Long, last_ts: Long)

  /** Run `steps` over each key's timeline. `df` must contain keyCol
    * (long), tsCol (timestamp), idCol (long). Returns one row per match:
    * (key, step name, matched event id, match_seq). Leftmost-start scan;
    * within each start, quantifiers are greedy with backtracking (a later
    * step failing hands events back to an earlier Times/Plus/Opt). */
  def matchPattern(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, steps: Seq[Step],
      withinMicros: Option[Long] = None,
      skip: SkipStrategy = SkipPastLast): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fields = df.schema.fieldNames
    val kIdx = fields.indexOf(keyCol)
    val tIdx = fields.indexOf(tsCol)
    val iIdx = fields.indexOf(idCol)
    require(kIdx >= 0 && tIdx >= 0 && iIdx >= 0)

    val out = df.groupByKey(_.getLong(kIdx))
      .flatMapGroups { (key: Long, it: Iterator[Row]) =>
        val events = it.toArray.sortBy(r =>
          (tsMicros(r.getTimestamp(tIdx)), r.getLong(iIdx)))
        val matches = scala.collection.mutable.ArrayBuffer
          .empty[(Long, String, Long, Int)]
        var seq = 0
        var i = 0
        while (i < events.length) {
          attemptAt(events, i, steps, withinMicros, tIdx) match {
            case Some(stepHits) =>
              stepHits.zip(steps).foreach { case (hits, st) =>
                hits.foreach(e =>
                  matches += ((key, st.name, e.getLong(iIdx), seq)))
              }
              seq += 1
              i += (skip match {
                // all-optional patterns can match zero events; always move
                case SkipPastLast => math.max(1, stepHits.map(_.length).sum)
                case SkipToNext => 1
                case SkipToFirst(name) =>
                  val idx = steps.indexWhere(_.name == name)
                  require(idx >= 0, s"skip-to-first: no step '$name'")
                  math.max(1, stepHits.take(idx).map(_.length).sum)
                case SkipToLast(name) =>
                  val idx = steps.indexWhere(_.name == name)
                  require(idx >= 0, s"skip-to-last: no step '$name'")
                  math.max(1, stepHits.take(idx + 1).map(_.length).sum - 1)
              })
            case None => i += 1
          }
        }
        matches.iterator
      }
    out.toDF("key", "step", "event_id", "match_seq")
  }

  /** Try to match the full pattern starting at events(start) with strict
    * contiguity. Each quantifier consumes greedily (longest first) and
    * backtracks one event at a time when the remaining steps can't match —
    * the reference NFA's greedy semantics over a bounded run. Returns the
    * per-step consumed events (empty seq for an Opt/Times(0,_) that
    * matched zero). */
  private def attemptAt(events: Array[Row], start: Int, steps: Seq[Step],
      withinMicros: Option[Long], tIdx: Int): Option[Seq[Seq[Row]]] = {
    val startUs = tsMicros(events(start).getTimestamp(tIdx))
    def inWindow(r: Row): Boolean = withinMicros.forall(w =>
      tsMicros(r.getTimestamp(tIdx)) - startUs <= w)

    def rec(si: Int, pos: Int, acc: List[Seq[Row]]): Option[Seq[Seq[Row]]] = {
      if (si == steps.length) return Some(acc.reverse)
      val st = steps(si)
      val (mn, mx, greedy) = bounds(st.quant)
      // longest feasible contiguous run for this step from pos
      var run = 0
      while (run < mx && pos + run < events.length
        && st.pred(events(pos + run)) && inWindow(events(pos + run))) run += 1
      // greedy: longest first, hand back on failure; reluctant: shortest
      // first, extend on failure
      val order = if (greedy) run to mn by -1 else mn to run
      for (k <- order) {
        val res = rec(si + 1, pos + k,
          events.slice(pos, pos + k).toSeq :: acc)
        if (res.isDefined) return res
      }
      None
    }
    rec(0, start, Nil)
  }

  /** Incremental streaming NFA (strict contiguity): keyed partial-match
    * state carries over micro-batch boundaries — the reference's
    * streaming `StreamExecMatch`. Supports the FULL batch pattern surface
    * (One / Plus / Opt / Times, greedy AND reluctant, any number of
    * quantified steps): per key, a bounded replay buffer holds
    * (event id, event-time micros, step-predicate bitmask) for the events
    * of the current leftmost match attempt — never the rows themselves —
    * and the same backtracking scan batch `matchPattern` runs is re-run
    * over that buffer as events arrive.
    *
    * Emission discipline (append mode): a completed match emits as soon
    * as NO future event could alter it — every explored quantifier run
    * was closed by an in-buffer predicate/horizon failure or its max
    * bound, never by simply running out of buffered events. A match still
    * extendable at the buffer tip (e.g. a greedy trailing `B+`) holds
    * until a closing event arrives, or — with `flushOnHorizon` — until
    * the watermark passes the match start's `within` horizon (the
    * reference's within-bounded NFA pruning), which also garbage-collects
    * dead prefixes, so state stays bounded even for keys that stop
    * receiving events.
    *
    * A dead attempt replays from every later start position inside the
    * consumed run (the buffer IS the replay window), so self-overlapping
    * prefixes (`A A B` over stream A A A B) and non-disjoint step
    * predicates match exactly what batch `matchPattern` finds.
    *
    * Events are processed in event-time order within each batch and
    * arrival order across batches (proctime semantics across batches;
    * align file/offset order with time for event-time behavior). State
    * per key is O(active attempt span); a `within` horizon bounds that
    * span in event time.
    */
  def matchPatternStream(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, steps: Seq[Step],
      withinMicros: Option[Long] = None,
      flushOnHorizon: Boolean = false,
      skip: SkipStrategy = SkipPastLast): DataFrame = {
    require(!flushOnHorizon || withinMicros.isDefined,
      "flushOnHorizon needs a withinMicros horizon (and a watermarked input)")
    require(steps.length <= 63, "streaming NFA supports at most 63 steps")
    skip match {
      case SkipToFirst(name) => require(steps.exists(_.name == name),
        s"skip-to-first: no step '$name'")
      case SkipToLast(name) => require(steps.exists(_.name == name),
        s"skip-to-last: no step '$name'")
      case _ =>
    }
    val spark = events.sparkSession
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val fields = events.schema.fieldNames
    val kIdx = fields.indexOf(keyCol)
    val tIdx = fields.indexOf(tsCol)
    val iIdx = fields.indexOf(idCol)
    require(kIdx >= 0 && tIdx >= 0 && iIdx >= 0,
      s"matchPatternStream: missing column among " +
        s"$keyCol/$tsCol/$idCol in ${fields.mkString(",")}")
    val nSteps = steps.length
    val stepBounds = steps.map(s => bounds(s.quant)).toArray
    val stepNames = steps.map(_.name).toArray
    val stepPreds = steps.map(_.pred).toArray

    val timeoutConf =
      if (flushOnHorizon) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val out = events.groupByKey(_.getLong(kIdx))
      .flatMapGroupsWithState[(Seq[(Long, Long, Long)], Long), (Long, String, Long, Long)](
        OutputMode.Append, timeoutConf) {
        (key: Long, it: Iterator[Row],
            state: GroupState[(Seq[(Long, Long, Long)], Long)]) =>
          val st0 = state.getOption.getOrElse((Seq.empty[(Long, Long, Long)], 0L))
          var buffer: Vector[(Long, Long, Long)] = st0._1.toVector
          var seq: Long = st0._2
          val emitted = scala.collection.mutable.ListBuffer
            .empty[(Long, String, Long, Long)]

          // One attempt of the batch backtracking NFA over the buffer,
          // leftmost start = buffer head. Outcome:
          //   DEAD     — no match from this start, no future event helps
          //   PARTIAL  — no match yet, but more events could complete one
          //   COMPLETE — hits (per-step ids) + end (consumed count);
          //              `closed` = no future event could change it.
          // `touchedEnd` is set whenever a step's feasible run was cut
          // short by buffer exhaustion (run < max && ran off the end) on
          // any branch explored up to the first success: exactly the
          // branches whose outcome a future event could flip. In flush
          // mode every future event is out of horizon, so exhaustion is
          // equivalent to a window failure and touchedEnd is moot.
          final case class Att(hits: Array[List[Long]], end: Int,
              closed: Boolean)
          def attempt(flush: Boolean): (Int, Att) = { // (0 dead,1 partial,2 complete)
            if (buffer.isEmpty) return (1, null)
            val startUs = buffer(0)._2
            def inWin(i: Int): Boolean =
              withinMicros.forall(w => buffer(i)._2 - startUs <= w)
            var touchedEnd = false
            def rec(si: Int, pos: Int, acc: List[List[Long]]): Att = {
              if (si == nSteps)
                return Att(acc.reverse.toArray, pos, closed = true)
              val (mn, mx, greedy) = stepBounds(si)
              var run = 0
              while (run < mx && pos + run < buffer.length
                && ((buffer(pos + run)._3 >> si) & 1L) == 1L
                && inWin(pos + run)) run += 1
              val truncated = run < mx && pos + run == buffer.length
              // a truncated GREEDY run flips the first k tried, so any
              // success below is provisional; a truncated RELUCTANT run
              // only matters if every k ≤ run fails (larger k was never
              // explorable) — reluctant tries shortest first, so a found
              // match can't change with more events
              if (greedy && truncated) touchedEnd = true
              val order = if (greedy) run to mn by -1 else mn to run
              for (k <- order) {
                val hit = rec(si + 1, pos + k,
                  buffer.slice(pos, pos + k).map(_._1).toList :: acc)
                if (hit != null) return hit
              }
              if (!greedy && truncated) touchedEnd = true
              null
            }
            val att = rec(0, 0, Nil)
            if (att == null) (if (touchedEnd && !flush) 1 else 0, null)
            else (2, att.copy(closed = !touchedEnd || flush))
          }

          def emitMatch(att: Att): Unit = {
            var si = 0
            while (si < nSteps) {
              att.hits(si).foreach(id =>
                emitted += ((key, stepNames(si), id, seq)))
              si += 1
            }
            seq += 1
            // after-match skip — same arithmetic as the batch scan; an
            // all-optional empty match still advances one event
            val advance = skip match {
              case SkipPastLast => att.end
              case SkipToNext => 1
              case SkipToFirst(name) =>
                val idx = steps.indexWhere(_.name == name)
                att.hits.take(idx).map(_.length).sum
              case SkipToLast(name) =>
                val idx = steps.indexWhere(_.name == name)
                att.hits.take(idx + 1).map(_.length).sum - 1
            }
            buffer = buffer.drop(math.max(1, advance))
          }

          // Resolve the buffer as far as certainty allows: emit closed
          // matches, slide past dead starts, stop at the first open
          // match / live partial.
          def pump(): Unit = {
            var go = true
            while (go && buffer.nonEmpty) {
              val (outcome, att) = attempt(flush = false)
              if (outcome == 2 && att.closed) emitMatch(att)
              else if (outcome == 0) buffer = buffer.drop(1)
              else go = false
            }
          }

          if (flushOnHorizon && state.hasTimedOut) {
            // watermark passed the head anchor's horizon: no future event
            // can be in-window for it, so force-resolve every expired
            // start (open greedy tails become complete matches — the
            // reference's within-pruning emit), then re-pump the rest
            val wmUs = state.getCurrentWatermarkMs * 1000L
            val w = withinMicros.get
            while (buffer.nonEmpty && wmUs - buffer(0)._2 > w) {
              val (outcome, att) = attempt(flush = true)
              if (outcome == 2) emitMatch(att)
              else buffer = buffer.drop(1)
            }
            pump()
          } else {
            val ordered = it.toArray.sortBy(r =>
              (tsMicros(r.getTimestamp(tIdx)), r.getLong(iIdx)))
            ordered.foreach { e =>
              var bits = 0L
              var s = 0
              while (s < nSteps) {
                if (stepPreds(s)(e)) bits |= (1L << s)
                s += 1
              }
              buffer = buffer :+ ((e.getLong(iIdx),
                tsMicros(e.getTimestamp(tIdx)), bits))
            }
            // ONE pump per batch: attempt() is a pure function of the
            // final buffer and only closed (future-proof) matches emit,
            // so per-event pumping would produce identical output while
            // re-scanning the whole buffer per event — O(batch²) on a
            // long open run
            pump()
          }
          state.update((buffer, seq))
          if (flushOnHorizon && buffer.nonEmpty) {
            // wake when the head anchor's horizon expires
            state.setTimeoutTimestamp(math.max(
              (buffer(0)._2 + withinMicros.get) / 1000L + 1,
              state.getCurrentWatermarkMs + 1))
          }
          emitted.iterator
      }
    out.toDF("key", "step", "event_id", "match_seq")
  }

  /** Parse a MATCH_RECOGNIZE-style pattern string into steps (reference
    * Pattern API / MATCH_RECOGNIZE PATTERN clause — Pattern.java:50,
    * quantifier grammar of Quantifier.java): whitespace-separated step
    * names, each optionally quantified with `+` (one-or-more), `?`
    * (optional), `{m}`, `{m,n}`, `{m,}` — any of them suffixed with `?`
    * for reluctant mode (e.g. `+?`, `{1,3}?`). Each name must have a
    * predicate in `preds`; the name doubles as the output step label.
    *
    * `Cep.pattern("signup error+ purchase?", preds)` ==
    * `Seq(Step("signup",…), Step("error",…,Plus), Step("purchase",…,Opt))`.
    */
  def pattern(spec: String,
      preds: Map[String, Row => Boolean]): Seq[Step] = {
    val StepRe =
      """([A-Za-z_][A-Za-z0-9_]*)(\+\??|\?\??|\{\d+(?:,\d*)?\}\??)?""".r
    spec.trim.split("\\s+").toSeq.map {
      case StepRe(name, quant) =>
        val pred = preds.getOrElse(name,
          throw new IllegalArgumentException(s"no predicate for step '$name'"))
        val q = Option(quant).getOrElse("") match {
          case "" => One
          case "+" => Plus
          case "+?" => Times(1, Int.MaxValue, greedy = false)
          case "?" => Opt
          case "??" => Times(0, 1, greedy = false)
          case s =>
            val greedy = !s.endsWith("}?")
            val body = s.stripSuffix("?").stripPrefix("{").stripSuffix("}")
            body.split(",", -1) match {
              case Array(m) => Times(m.toInt, m.toInt, greedy)
              case Array(m, "") => Times(m.toInt, Int.MaxValue, greedy)
              case Array(m, n) => Times(m.toInt, n.toInt, greedy)
            }
        }
        Step(name, pred, q)
      case tok =>
        throw new IllegalArgumentException(s"bad pattern token '$tok'")
    }
  }

  /** The catalog's demo pattern: signup followed immediately by one or
    * more errors, per user (`A B+` strict). */
  def signupThenErrors(events: DataFrame): DataFrame =
    matchPattern(
      events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")),
      keyCol = "user_id", tsCol = "ts", idCol = "event_id",
      steps = Seq(
        Step("A", _.getString(3) == "signup"),
        Step("B", _.getString(3) == "error", Plus)))
}
