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
    * streaming `StreamExecMatch`. Supported pattern class: a One-chain
    * with at most ONE greedy quantifier (Plus / Times(m≥1,n≥2)) anywhere
    * in it — `A B`, `A B+`, `A B+ C`, `B{2,3} C D`, … A One-only match
    * emits as its last event arrives; a quantified match emits when its
    * greedy run closes (the first non-matching event, the suffix chain
    * completing, a bounded tail hitting capacity, or — with
    * `flushOnHorizon` — the watermark passing the `within` horizon).
    * Events are processed in event-time order within each batch and
    * arrival order across batches (proctime semantics across batches;
    * align file/offset order with time for event-time behavior).
    *
    * `flushOnHorizon = true` (requires `withinMicros` AND a watermarked
    * input) registers an event-time timer at match-start + within: an
    * open greedy tail EMITS when the watermark passes its horizon — the
    * reference's `within`-bounded NFA pruning — and expired prefix
    * partials are garbage-collected, so state stays bounded even for
    * keys that stop receiving events.
    */
  def matchPatternStream(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, steps: Seq[Step],
      withinMicros: Option[Long] = None,
      flushOnHorizon: Boolean = false): DataFrame = {
    require(!flushOnHorizon || withinMicros.isDefined,
      "flushOnHorizon needs a withinMicros horizon (and a watermarked input)")
    // one greedy repetition (Plus or Times(m≥1, n≥2)) — trailing OR
    // interior — runs as an incremental open tail; the steps after it
    // (the suffix) are a strict One-chain consumed as the tail closes.
    // Reluctant/optional quantifiers need lookahead and stay batch-mode.
    val quantIdx = steps.indexWhere(_.quant != One)
    val hasQuant = quantIdx >= 0
    require(!hasQuant || steps.count(_.quant != One) == 1,
      "streaming NFA supports at most one quantified step")
    val (tailMin, tailMax) =
      if (!hasQuant) (0, 0)
      else steps(quantIdx).quant match {
        case Plus => (1, Int.MaxValue)
        case Times(mn, mx, true) if mn >= 1 && mx >= 2 => (mn, mx)
        case q => throw new IllegalArgumentException(
          s"streaming NFA supports greedy Plus/Times(m>=1,n>=2) " +
            s"quantifiers; got $q — use matchPattern")
      }
    val prefixSteps = if (hasQuant) steps.take(quantIdx) else steps
    val suffixSteps = if (hasQuant) steps.drop(quantIdx + 1) else Seq.empty
    require(steps.length <= 63, "streaming NFA supports at most 63 steps")
    val spark = events.sparkSession
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val fields = events.schema.fieldNames
    val kIdx = fields.indexOf(keyCol)
    val tIdx = fields.indexOf(tsCol)
    val iIdx = fields.indexOf(idCol)
    val nSteps = steps.length
    val nPrefix = prefixSteps.length
    val nSuffix = suffixSteps.length

    // State per key: the pending One-prefix partial as (event id, event
    // ms, step-predicate bitmask), the open greedy tail (ids + first ms)
    // when the pattern ends in Plus, and the match counter. Storing each
    // buffered event's full predicate bitmask (bit s = steps(s).pred(e))
    // lets a failed partial REPLAY from every later start position inside
    // the consumed run without keeping the rows themselves — the
    // KMP-style slide the batch leftmost scan performs implicitly.
    // O(pattern + open tail) state per key. A trailing-Plus match is
    // greedy, so it emits when the first non-matching event closes it —
    // possibly batches later; a tail still open when the stream ends
    // never closes (a `within` horizon bounds that wait in event time).
    val timeoutConf =
      if (flushOnHorizon) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val out = events.groupByKey(_.getLong(kIdx))
      .flatMapGroupsWithState[(Seq[(Long, Long, Long)], Seq[Long], Seq[Long], Long, Long), (Long, String, Long, Long)](
        OutputMode.Append, timeoutConf) {
        (key: Long, it: Iterator[Row],
            state: GroupState[(Seq[(Long, Long, Long)], Seq[Long], Seq[Long], Long, Long)]) =>
          var (buf, tail, sufBuf, tailStartMs, seq) = state.getOption
            .getOrElse((Seq.empty[(Long, Long, Long)], Seq.empty[Long],
              Seq.empty[Long], 0L, 0L))
          val emitted = scala.collection.mutable.ListBuffer
            .empty[(Long, String, Long, Long)]

          // emit the open prefix+tail+suffix match, skip past last
          def emitOpen(): Unit = {
            buf.zip(prefixSteps).foreach { case ((cid, _, _), st) =>
              emitted += ((key, st.name, cid, seq))
            }
            tail.foreach(cid =>
              emitted += ((key, steps(quantIdx).name, cid, seq)))
            sufBuf.zip(suffixSteps).foreach { case (cid, st) =>
              emitted += ((key, st.name, cid, seq))
            }
            seq += 1
            buf = Seq.empty
            tail = Seq.empty
            sufBuf = Seq.empty
          }

          // smallest drop-count j (0 = plain advance, buf.length = e
          // restarts alone) whose suffix is a valid in-horizon prefix
          def slide(id: Long, ms: Long, bits: Long): Unit = {
            val j = (0 to buf.length).indexWhere { j =>
              val stillValid = (j until buf.length).forall { k =>
                ((buf(k)._3 >> (k - j)) & 1L) == 1L
              }
              stillValid && ((bits >> (buf.length - j)) & 1L) == 1L &&
                (j == buf.length || withinMicros.forall(w =>
                  ms - buf(j)._2 <= w))
            }
            if (j < 0) buf = Seq.empty
            else {
              buf = buf.drop(j) :+ ((id, ms, bits))
              if (!hasQuant && buf.length == nSteps) {
                buf.zip(steps).foreach { case ((cid, _, _), st) =>
                  emitted += ((key, st.name, cid, seq))
                }
                seq += 1
                buf = Seq.empty // after-match skip past last
              }
            }
          }

          if (flushOnHorizon && state.hasTimedOut) {
            // watermark passed some open horizon: close an expired open
            // tail (it's a complete greedy match), GC prefix entries that
            // can no longer anchor a match
            val wmUs = state.getCurrentWatermarkMs * 1000L
            val w = withinMicros.get
            val startUs =
              if (buf.nonEmpty) buf.head._2
              else if (tail.nonEmpty) tailStartMs else Long.MaxValue
            if (tail.nonEmpty && wmUs - startUs > w) {
              // a pattern ending in its quantifier completes at horizon
              // expiry; an unfinished suffix means no match
              if (nSuffix == 0 && tail.length >= tailMin) emitOpen()
              else { buf = Seq.empty; tail = Seq.empty; sufBuf = Seq.empty }
            }
            buf = buf.dropWhile(e => wmUs - e._2 > w)
          } else {
            val ordered = it.toArray.sortBy(r =>
              (tsMicros(r.getTimestamp(tIdx)), r.getLong(iIdx)))
            ordered.foreach { e =>
              val id = e.getLong(iIdx)
              val ms = tsMicros(e.getTimestamp(tIdx)) // microseconds
              var bits = 0L
              var s = 0
              while (s < nSteps) {
                if (steps(s).pred(e)) bits |= (1L << s)
                s += 1
              }
              // at most one retry: a closing event re-enters as a fresh
              // match candidate after the emitted match's skip-past-last
              var retry = true
              var rounds = 0
              while (retry && rounds < 2) {
                retry = false
                rounds += 1
                if (hasQuant && buf.length == nPrefix) {
                  val inHorizon =
                    if (nPrefix == 0 && tail.isEmpty) true // e starts the match
                    else {
                      val startMs = if (nPrefix > 0) buf.head._2 else tailStartMs
                      withinMicros.forall(w => ms - startMs <= w)
                    }
                  if (sufBuf.nonEmpty) {
                    // SUFFIX phase: the One-chain after the quantifier
                    val nextBit =
                      ((bits >> (nPrefix + 1 + sufBuf.length)) & 1L) == 1L
                    if (nextBit && inHorizon) {
                      sufBuf = sufBuf :+ id
                      if (sufBuf.length == nSuffix) emitOpen()
                    } else {
                      // mid-suffix failure kills the match; consumed
                      // events are not replayed (exact when the suffix
                      // predicates are disjoint from tail/prefix — the
                      // common telemetry class)
                      buf = Seq.empty; tail = Seq.empty; sufBuf = Seq.empty
                      retry = true
                    }
                  } else {
                    // TAIL phase: accumulate greedily, then close into
                    // the suffix (or emit, for a trailing quantifier)
                    val tailBit = ((bits >> nPrefix) & 1L) == 1L
                    val suf0Bit = nSuffix > 0 &&
                      ((bits >> (nPrefix + 1)) & 1L) == 1L
                    if (tailBit && inHorizon && tail.length < tailMax) {
                      if (tail.isEmpty && nPrefix == 0) tailStartMs = ms
                      tail = tail :+ id
                      // a bounded TRAILING tail at capacity can't grow
                      if (tail.length == tailMax && nSuffix == 0) emitOpen()
                    } else if (tail.length >= tailMin && suf0Bit
                        && inHorizon) {
                      sufBuf = Seq(id) // greedy tail closes into suffix
                      if (nSuffix == 1) emitOpen()
                    } else if (nSuffix == 0 && tail.length >= tailMin
                        && tail.nonEmpty) {
                      emitOpen()
                      retry = true // e may start / extend a fresh match
                    } else if (tail.nonEmpty) {
                      // tail died (below min, or no suffix entry); the
                      // consumed events are not replayed (exact for
                      // disjoint step predicates)
                      buf = Seq.empty
                      tail = Seq.empty
                      retry = true
                    } else if (nPrefix > 0) {
                      // prefix done but the tail never opened: the partial
                      // dies; replay from later starts inside it (bit
                      // nPrefix of e is unset here, so j = 0 can't enter
                      // the tail)
                      slide(id, ms, bits)
                    } // else nPrefix == 0, nothing open, no match: drop e
                  }
                } else {
                  slide(id, ms, bits)
                }
              }
            }
          }
          state.update((buf, tail, sufBuf, tailStartMs, seq))
          if (flushOnHorizon && (buf.nonEmpty || tail.nonEmpty)) {
            // wake when the earliest open anchor's horizon expires
            val anchorUs =
              if (buf.nonEmpty) buf.head._2 else tailStartMs
            state.setTimeoutTimestamp(math.max(
              (anchorUs + withinMicros.get) / 1000L + 1,
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
