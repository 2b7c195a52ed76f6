package graft.cep

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

/** CEP / MATCH_RECOGNIZE core (reference StreamExecMatch.java:90 +
  * flink-libraries/flink-cep Pattern.java:50 — NFA pattern API): a
  * compact NFA with One/Plus/Opt/Times quantifiers, strict (`next`) and
  * relaxed (`followedBy`) contiguity, negative guards (`notNext` /
  * `notFollowedBy`) and an optional `within` horizon, run per key over
  * event-time order.
  *
  * Execution shape: one shuffle on the key, linear NFA scan with
  * after-match skip-past-last (the reference's default skip strategy).
  * With a `within` horizon, the shuffle feeds Spark's spillable
  * external sort and a horizon-bounded streaming scan — peak task
  * state is O(events per `within` window), so a single hot key with an
  * arbitrarily long history cannot OOM a task. Without a horizon the
  * key's full timeline is the unit of state (the same contract the
  * reference's keyed NFA holds): a key's history must fit an executor,
  * keys scale out horizontally.
  *
  * Batch `matchPattern` and the incremental `matchPatternStream` share
  * the same pattern surface — quantifiers, contiguity modes, negations,
  * alternation groups, skip strategies — and are differentially tested
  * for parity (`CepPropSpec`).
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

  /** `min` or more occurrences, unbounded above (reference
    * Pattern.timesOrMore — Pattern.java:50): `timesOrMore(2)` =
    * `Times(2, ∞)`. Pair with `Step.until` to predicate-bound the
    * otherwise open-ended loop. */
  def timesOrMore(min: Int, greedy: Boolean = true): Times =
    Times(min, Int.MaxValue, greedy)

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

  /** One pattern element. `relaxed` is the reference's FOLLOWED_BY
    * contiguity (Pattern.followedBy — Pattern.java:50): the step may
    * skip events that do not match it between the previous step's last
    * consumed event and its own first take (and between its own
    * iterations when quantified). `negated` inverts the element into a
    * guard that consumes nothing: strict ⇒ notNext (the event
    * immediately after the previous consumed one must not match);
    * relaxed ⇒ notFollowedBy (no event the NEXT positive step's relaxed
    * scan skips before its first take may match). Guard checks are
    * window-scoped: an event beyond the `within` horizon cannot kill a
    * match (the reference prunes such branches identically, since any
    * later take would be out of window too). A notFollowedBy armed
    * before a strict-attach step guards an empty gap — a no-op, as in
    * the reference. `until` is the reference's predicate stop-condition
    * for looping patterns (Pattern.until — Pattern.java:50): the moment
    * an event satisfies it, the loop accepts NO further events — the
    * stop event itself is not consumed by the loop (the next step may
    * consume it), and a relaxed loop may not skip past it either. Only
    * meaningful on a looping quantifier (Plus / Times with max > 1);
    * with an open-ended `timesOrMore` it is what bounds the run. */
  final case class Step(name: String, pred: Row => Boolean,
      quant: Quant = One, relaxed: Boolean = false,
      negated: Boolean = false,
      alts: Seq[(String, Row => Boolean)] = Nil,
      until: Option[Row => Boolean] = None,
      group: Seq[Step] = Nil)

  /** A quantifiable sequence group `(A B)` as one step (reference
    * GroupPattern.java — flink-cep/.../pattern/GroupPattern.java): the
    * quantifier applies to the whole sub-sequence, so `group(a, b)` with
    * `Plus` is `(A B)+` — one or more complete A-then-B runs. Sub-steps
    * keep their own names (emitted rows are labeled A and B, not the
    * group), quantifiers, and strict/relaxed contiguity; consecutive
    * iterations (and iteration 1's first sub-step) attach with the
    * GROUP's contiguity — `followedBy(group)` admits gaps between
    * iterations, `next(group)` demands contiguous runs. An iteration
    * must consume at least one event (an all-optional group cannot loop
    * on emptiness). `until` on the group stops the iteration loop at the
    * first boundary event satisfying it. Not supported inside a group:
    * nested groups, alternation sub-steps, `until` on a sub-step. */
  def group(sub: Step*): Step = {
    require(sub.nonEmpty, "empty sequence group")
    Step("(" + sub.map(_.name).mkString(" ") + ")",
      _ => false, group = sub.toVector)
  }

  /** An alternation group `(A|B)` as one step: matches events satisfying
    * ANY alternative; each consumed event is emitted under the FIRST
    * alternative (in declaration order) whose predicate holds — the
    * classifier contract. Quantifies like any step (`(A|B)+` = a run of
    * events each matching A or B). Calcite's MATCH_RECOGNIZE grammar
    * admits this; the reference SQL layer rejects it (parity-plus here,
    * library-level only). */
  def alt(alternatives: (String, Row => Boolean)*): Step = {
    require(alternatives.size >= 2, "alternation needs >= 2 alternatives")
    Step(alternatives.map(_._1).mkString("|"),
      r => alternatives.exists(_._2(r)), alts = alternatives)
  }

  /** Shared structural validation for batch and streaming runs. */
  private def validateSteps(steps: Seq[Step]): Unit = {
    require(steps.nonEmpty, "empty pattern")
    require(!steps.head.negated,
      "pattern cannot start with a negation (reference Pattern.begin)")
    steps.zipWithIndex.foreach { case (s, i) =>
      if (s.negated) {
        require(s.quant == One,
          s"negated step '${s.name}' cannot be quantified " +
            "(reference notNext/notFollowedBy take no quantifier)")
        require(s.alts.isEmpty,
          s"negated step '${s.name}' cannot be an alternation")
        if (s.relaxed)
          require(steps.drop(i + 1).exists(!_.negated),
            s"notFollowedBy '${s.name}' needs a later positive step to " +
              "bound its gap (reference forbids trailing notFollowedBy)")
      }
      if (s.until.isDefined) {
        require(!s.negated,
          s"until on negated step '${s.name}' (guards consume nothing)")
        val (_, mx, _) = bounds(s.quant)
        require(mx > 1,
          s"until on non-looping step '${s.name}' (reference restricts " +
            "until to looping patterns — oneOrMore/times)")
      }
      if (s.group.nonEmpty) {
        require(!s.negated, s"group '${s.name}' cannot be negated")
        require(s.alts.isEmpty,
          s"group '${s.name}' cannot also be an alternation")
        s.group.foreach { g =>
          require(g.group.isEmpty,
            s"nested group inside '${s.name}' is not supported")
          require(g.alts.isEmpty,
            s"alternation sub-step '${g.name}' inside group " +
              s"'${s.name}' is not supported")
          require(g.until.isEmpty,
            s"until on sub-step '${g.name}' — put it on the group")
          if (g.negated) require(g.quant == One,
            s"negated sub-step '${g.name}' cannot be quantified")
        }
        require(s.group.exists(!_.negated),
          s"group '${s.name}' needs at least one positive sub-step")
        // an iteration is a sub-pattern: like the top-level rule
        // ("pattern cannot start with a negation"), it may not START
        // with a guard — the iteration-attach contiguity rewrite in
        // BOTH matchers (batch attemptAt and the streaming NFA) targets
        // the head sub-step, and rewriting a strict notNext guard into
        // a relaxed notFollowedBy would silently change its semantics
        require(!s.group.head.negated,
          s"group '${s.name}' cannot start with a negation " +
            "(reference Pattern.begin applies per iteration)")
        // a trailing relaxed guard's gap is bounded by the NEXT positive
        // step — inside a loop that may be the next iteration's first
        // positive sub-step, but on the last iteration it needs one
        // after the group (mirrors the top-level notFollowedBy rule)
        if (s.group.last.negated && s.group.last.relaxed)
          require(steps.drop(i + 1).exists(!_.negated),
            s"group '${s.name}' ends with a notFollowedBy guard and no " +
              "later positive step bounds its final gap")
      }
    }
  }

  /** Output label for the event a step consumed: the step name, or the
    * first matching alternative of an alternation group. */
  private def labelFor(st: Step, row: Row): String =
    if (st.alts.isEmpty) st.name
    else st.alts.find(_._2(row)).fold(st.name)(_._1)

  /** Event time in microseconds — Timestamp.getTime truncates to ms and
    * the fixtures (and oracles) carry microsecond precision, so ordering
    * and `within` arithmetic must not quantize. */
  private def tsMicros(t: java.sql.Timestamp): Long =
    // floorDiv: getTime truncates toward zero, which mis-orders
    // pre-epoch timestamps with fractional seconds (getNanos is always
    // the positive sub-second part, so the millis must floor)
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

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

    validateSteps(steps)
    val out = withinMicros match {
      case Some(w) =>
        // Hot-key bound: with a `within` horizon the leftmost-start scan
        // never needs the whole timeline at once — an attempt at position
        // i is decided entirely by events in [ts_i, ts_i + within] (every
        // take and every negation check is window-scoped), and the scan
        // position only moves forward. So: shuffle on the key, let
        // Spark's SPILLABLE external sort order each partition by
        // (key, ts, id) — replacing the in-task toArray.sortBy — and
        // stream the sorted rows through a HorizonScanner that buffers
        // only the active attempt's horizon. Peak task state is O(events
        // per `within` window), not O(timeline): a single hot key with a
        // 100M-event history no longer OOMs its task.
        df.repartition(col(keyCol))
          .sortWithinPartitions(col(keyCol), col(tsCol), col(idCol))
          .mapPartitions { it =>
            new Iterator[(Long, String, Long, Int)] {
              private var cur: HorizonScanner = null
              private var curKey = 0L
              private val pending =
                scala.collection.mutable.Queue.empty[(Long, String, Long, Int)]
              private def fill(): Unit = {
                while (pending.isEmpty && (it.hasNext || cur != null)) {
                  if (!it.hasNext) { pending ++= cur.finish(); cur = null }
                  else {
                    val r = it.next()
                    val k = r.getLong(kIdx)
                    if (cur == null || k != curKey) {
                      if (cur != null) pending ++= cur.finish()
                      cur = new HorizonScanner(k, steps, w, skip, tIdx, iIdx)
                      curKey = k
                    }
                    pending ++= cur.push(r)
                  }
                }
              }
              def hasNext: Boolean = { fill(); pending.nonEmpty }
              def next(): (Long, String, Long, Int) = { fill(); pending.dequeue() }
            }
          }
      case None =>
        // No horizon ⇒ an attempt may reach arbitrarily far ahead, so the
        // key's FULL timeline is the unit of state (the same bound the
        // reference's keyed NFA holds). Documented contract: a key's
        // history must fit an executor; keys scale out horizontally. For
        // unbounded single-key timelines, set a `within` horizon to get
        // the bounded-scan path above.
        df.groupByKey(_.getLong(kIdx))
          .flatMapGroups { (key: Long, it: Iterator[Row]) =>
            val events = it.toArray.sortBy(r =>
              (tsMicros(r.getTimestamp(tIdx)), r.getLong(iIdx)))
            scanTimeline(events, key, steps, None, skip, tIdx, iIdx)
          }
    }
    out.toDF("key", "step", "event_id", "match_seq")
  }

  /** Leftmost-start scan of one key's full in-memory timeline (the
    * `within`-less batch path; also the differential reference for
    * `HorizonScanner`). */
  private[graft] def scanTimeline(events: scala.collection.IndexedSeq[Row], key: Long,
      steps: Seq[Step], withinMicros: Option[Long], skip: SkipStrategy,
      tIdx: Int, iIdx: Int): Iterator[(Long, String, Long, Int)] = {
    val matches = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Int)]
    val compiled = compileBatch(steps)
    var seq = 0
    var i = 0
    while (i < events.length) {
      attemptAt(events, i, compiled, withinMicros, tIdx) match {
        case Some(posHits) =>
          i = emitAndSkip(events, i, posHits, steps, skip, iIdx, key, seq,
            matches)
          seq += 1
        case None => i += 1
      }
    }
    matches.iterator
  }

  /** Emit one completed match and return the position the after-match
    * skip resumes at. Hits carry (position, label) pairs — the label was
    * fixed at consume time (step name, first matching alternative of an
    * alternation, or the consuming sub-step of a group). Skip works on
    * CONSUMED POSITIONS (with relaxed contiguity a match is not a
    * contiguous run, so length sums no longer locate its events);
    * all-optional patterns can match zero events — always advance at
    * least one. A skip-to NAME resolves to a top-level step first, then
    * to a group sub-step or alternation label. */
  private def emitAndSkip(events: scala.collection.IndexedSeq[Row], i: Int,
      posHits: Seq[Seq[(Int, String)]], steps: Seq[Step],
      skip: SkipStrategy, iIdx: Int, key: Long, seq: Int,
      out: scala.collection.mutable.Growable[(Long, String, Long, Int)])
      : Int = {
    posHits.foreach(_.foreach { case (p, label) =>
      out += ((key, label, events(p).getLong(iIdx), seq))
    })
    val all = posHits.flatten.map(_._1)
    def resolve(name: String): Int = {
      val idx = steps.indexWhere(_.name == name)
      if (idx >= 0) idx
      else steps.indexWhere(s =>
        s.alts.exists(_._1 == name) ||
          s.group.exists(g => g.name == name || g.alts.exists(_._1 == name)))
    }
    skip match {
      case SkipPastLast => if (all.isEmpty) i + 1 else all.max + 1
      case SkipToNext => i + 1
      case SkipToFirst(name) =>
        val idx = resolve(name)
        require(idx >= 0, s"skip-to-first: no step '$name'")
        val named = posHits(idx).collect { case (p, `name`) => p }
        val cand =
          if (named.nonEmpty) named
          else posHits.drop(idx).flatten.map(_._1)
        math.max(i + 1, if (cand.nonEmpty) cand.min
          else if (all.isEmpty) i + 1 else all.max + 1)
      case SkipToLast(name) =>
        val idx = resolve(name)
        require(idx >= 0, s"skip-to-last: no step '$name'")
        val named = posHits(idx).collect { case (p, `name`) => p }
        val cand =
          if (named.nonEmpty) named
          else posHits.take(idx + 1).flatten.map(_._1)
        math.max(i + 1, if (cand.nonEmpty) cand.max else i + 1)
    }
  }

  /** Streaming per-key scanner for the `within`-bounded batch path: feed
    * (ts, id)-ordered events via `push`, then `finish()`. An attempt at
    * buffer position a runs only once its horizon is COMPLETE — an event
    * with ts > ts_a + within has arrived, so nothing still unseen can be
    * in window (any event the scan or a window-scoped negation check
    * would consult is already buffered) — or on finish(). The decided
    * prefix is compacted away once it dominates the buffer (amortized
    * O(1)/event), so peak state is ~2× the largest number of events
    * inside one `within` window plus the 64-row compaction floor,
    * independent of timeline length. `peakBufferSize` exposes the
    * high-water mark for the spec's bound pin. */
  private[graft] final class HorizonScanner(key: Long, steps: Seq[Step],
      withinMicros: Long, skip: SkipStrategy, tIdx: Int, iIdx: Int) {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    private val compiled = compileBatch(steps)
    private var attempt = 0 // next attempt start, index into buf
    private var seq = 0
    private var peak = 0
    def peakBufferSize: Int = peak

    def push(r: Row): Seq[(Long, String, Long, Int)] = {
      buf += r
      if (buf.length > peak) peak = buf.length
      drain(tsMicros(r.getTimestamp(tIdx)), fin = false)
    }

    def finish(): Seq[(Long, String, Long, Int)] = drain(0L, fin = true)

    private def drain(tipUs: Long, fin: Boolean)
        : Seq[(Long, String, Long, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, Long, Int)]
      var live = true
      while (live && attempt < buf.length) {
        val startUs = tsMicros(buf(attempt).getTimestamp(tIdx))
        if (!fin && tipUs - startUs <= withinMicros) live = false // horizon open
        else attemptAt(buf, attempt, compiled, Some(withinMicros), tIdx) match {
          case Some(posHits) =>
            attempt = emitAndSkip(buf, attempt, posHits, steps, skip, iIdx,
              key, seq, out)
            seq += 1
          case None => attempt += 1
        }
      }
      if (attempt >= 64 && attempt * 2 >= buf.length) {
        buf.remove(0, attempt)
        attempt = 0
      }
      out.toSeq
    }
  }

  /** Compiled pattern element for the SHARED sequence-matcher core
    * ([[seqMatch]]): quantifier bounds + contiguity + negation, a `tag`
    * indexing the caller's per-element evaluation data (predicates for
    * the batch matcher, bitmask slots for the streaming one), and the
    * compiled sub-elements of a sequence group. */
  private final case class MDesc(tag: Int, mn: Int, mx: Int,
      greedy: Boolean, relaxed: Boolean, negated: Boolean,
      sub: Array[MDesc]) extends Serializable

  /** Position environment the shared core matches over. `G` is the
    * armed-guard representation (predicate / bitmask), `L` the
    * consume-time label (step name / slot index). The `on*` hooks are
    * the streaming matcher's provisionality tracking — a branch whose
    * outcome a FUTURE event could flip; the batch matcher (complete
    * data) leaves them as no-ops. */
  private trait MatchEnv[G, L] {
    def length: Int
    def inWin(p: Int): Boolean
    def matches(tag: Int, p: Int): Boolean
    def untilHit(tag: Int, p: Int): Boolean
    def arm(tag: Int): G
    def guardHit(guards: List[G], p: Int): Boolean
    def label(tag: Int, p: Int): L
    def onNotNextAtTip(): Unit = ()
    def onGreedyTruncated(): Unit = ()
    def onReluctantTruncated(): Unit = ()
    def onIterBoundaryAtTip(): Unit = ()
  }

  /** THE backtracking sequence matcher — the single implementation of
    * the pattern semantics (quantifier greed/reluctance, strict/relaxed
    * contiguity, notNext/notFollowedBy guards, `until` stop-conditions,
    * sequence-group iteration), shared by batch [[attemptAt]] and the
    * streaming NFA. Returns per-element consumed positions with their
    * consume-time labels (forward order), or None. Semantic
    * RESTRICTIONS live in [[validateSteps]]; evaluation differences
    * live in the [[MatchEnv]]; nothing pattern-semantic may be
    * implemented outside this method. */
  private def seqMatch[G, L](env: MatchEnv[G, L], elems: Array[MDesc],
      start: Int): Option[List[List[(Int, L)]]] = {
    type Res = List[List[(Int, L)]]

    // Consume one positive non-group element at `pos`: scan its
    // feasible run, then hand each quantifier choice k (greedy: longest
    // first; reluctant: shortest first) to `cont` with the labeled
    // takes. Consuming k > 0 events releases the armed guards (the gap
    // they bound has closed). A run cut short by data exhaustion
    // (p == length with room below mx) is PROVISIONAL — a future event
    // could extend it — reported through the truncation hooks: a
    // truncated GREEDY run flips the first k tried, so any success
    // below is provisional up front; a truncated RELUCTANT run only
    // matters if every k ≤ run fails (larger k was never explorable).
    def consume(m: MDesc, pos: Int, guards: List[G],
        cont: (Int, List[G], List[(Int, L)]) => Option[Res])
        : Option[Res] = {
      val takes = scala.collection.mutable.ArrayBuffer.empty[Int]
      var p = pos
      var truncated = false
      if (!m.relaxed) {
        // contiguous run; an armed guard sees an empty gap — no-op.
        // An until stop exits with p < length, so the run reads as
        // closed, not truncated — correct: future events cannot reopen
        // a predicate-stopped loop.
        while (takes.length < m.mx && p < env.length
          && !env.untilHit(m.tag, p)
          && env.matches(m.tag, p) && env.inWin(p)) { takes += p; p += 1 }
        truncated = takes.length < m.mx && p == env.length
      } else {
        // skip non-matching events; before the first take, a skipped
        // event matching an armed guard caps the scan (STOP state) —
        // takes found earlier are impossible then (takes.isEmpty), so
        // only a zero-consume branch can survive and the guard stays
        // armed for the next positive step, which re-encounters the
        // offending event in its own gap. An until stop is final the
        // same way (the loop may not skip past it).
        var live = true
        while (live && takes.length < m.mx && p < env.length
          && env.inWin(p)) {
          if (env.untilHit(m.tag, p)) live = false
          else if (env.matches(m.tag, p)) { takes += p; p += 1 }
          else if (takes.isEmpty && env.guardHit(guards, p)) live = false
          else p += 1
        }
        truncated = live && takes.length < m.mx && p == env.length
      }
      if (m.greedy && truncated) env.onGreedyTruncated()
      val order =
        if (m.greedy) takes.length to m.mn by -1 else m.mn to takes.length
      for (k <- order) {
        val (nPos, nGuards) =
          if (k == 0) (pos, guards) else (takes(k - 1) + 1, Nil)
        val res = cont(nPos, nGuards,
          takes.take(k).toList.map(p2 => (p2, env.label(m.tag, p2))))
        if (res.isDefined) return res
      }
      if (!m.greedy && truncated) env.onReluctantTruncated()
      None
    }

    // Generic sequence matcher: match ms(mi..) starting at pos, then
    // call `cont` with (position after, surviving guards, per-element
    // hits in REVERSE order). Both the top-level pattern and each group
    // iteration run through here.
    def seqRec(ms: Array[MDesc], mi: Int, pos: Int, guards: List[G],
        acc: Res, cont: (Int, List[G], Res) => Option[Res]): Option[Res] = {
      if (mi == ms.length) return cont(pos, guards, acc)
      val m = ms(mi)
      if (m.negated) {
        if (!m.relaxed) {
          // notNext: window-scoped check of the immediately-following
          // event; absence (end of data) passes — provisionally for the
          // streaming matcher (the target event may not have arrived)
          if (pos < env.length) {
            if (env.matches(m.tag, pos) && env.inWin(pos)) return None
            seqRec(ms, mi + 1, pos, guards, Nil :: acc, cont)
          } else {
            env.onNotNextAtTip()
            seqRec(ms, mi + 1, pos, guards, Nil :: acc, cont)
          }
        } else
          // notFollowedBy: arm the guard for the next positive step's gap
          seqRec(ms, mi + 1, pos, env.arm(m.tag) :: guards,
            Nil :: acc, cont)
      } else if (m.sub.nonEmpty) {
        // sequence group: iterations 2..k (and iteration 1's first
        // sub-step — validated non-negated) attach with the GROUP's
        // contiguity
        val sub =
          if (m.relaxed && !m.sub(0).relaxed) {
            val c = m.sub.clone(); c(0) = c(0).copy(relaxed = true); c
          } else m.sub
        def iterate(k: Int, pos2: Int, guards2: List[G],
            takenRev: Res): Option[Res] = {
          def more: Option[Res] =
            if (k >= m.mx) None
            else if (pos2 >= env.length) {
              // at the data tip a future event could begin iteration
              // k+1 — provisional for streaming; with complete data the
              // sub-match below would fail anyway, so cutting here is
              // equivalent and cheaper
              env.onIterBoundaryAtTip()
              None
            }
            // group-level until: checked at the iteration boundary —
            // the stop event is left for the next step
            else if (env.inWin(pos2) && env.untilHit(m.tag, pos2)) None
            else seqRec(sub, 0, pos2, guards2, Nil, (p3, g3, subAcc) =>
              // an iteration must consume ≥1 event: a zero-width pass
              // makes no progress and would loop forever under mx = ∞
              if (p3 == pos2) None
              else iterate(k + 1, p3, g3,
                subAcc.reverse.flatten :: takenRev))
          def stop: Option[Res] =
            if (k >= m.mn)
              seqRec(ms, mi + 1, pos2, guards2,
                takenRev.reverse.flatten :: acc, cont)
            else None
          if (m.greedy) more.orElse(stop) else stop.orElse(more)
        }
        iterate(0, pos, guards, Nil)
      } else
        consume(m, pos, guards, (nPos, nGuards, taken) =>
          seqRec(ms, mi + 1, nPos, nGuards, taken :: acc, cont))
    }

    seqRec(elems, 0, start, Nil, Nil, (_, _, acc) => Some(acc.reverse))
  }

  /** Try to match the full pattern starting at events(start). Strict
    * steps consume a contiguous run; relaxed steps scan forward skipping
    * events that do not match them (the reference's FOLLOWED_BY ignore
    * transition). Each quantifier consumes greedily (longest first) and
    * backtracks when the remaining steps can't match — the reference
    * NFA's greedy semantics over a bounded run. Negated steps consume
    * nothing: strict ⇒ the event at the current position must not match
    * (notNext); relaxed ⇒ the predicate is armed as a gap guard and
    * kills any branch whose next positive relaxed scan skips a matching
    * event before its first take (notFollowedBy — the reference's STOP
    * state). Returns the per-step consumed POSITIONS (empty for a
    * zero-match quantifier or a negation). Semantics live in the shared
    * [[seqMatch]] core; this wrapper only supplies Row evaluation. */
  /** Compile Steps for the Row-evaluating batch matcher: MDesc elements
    * plus the tag→Step table. Hoisted out of [[attemptAt]] so a
    * timeline scan compiles once, not once per start position. */
  private def compileBatch(steps: Seq[Step]): (Array[MDesc], Array[Step]) = {
    val flat = scala.collection.mutable.ArrayBuffer.empty[Step]
    def desc(st: Step): MDesc = {
      val tag = flat.length
      flat += st
      val (mn, mx, greedy) = bounds(st.quant)
      MDesc(tag, mn, mx, greedy, st.relaxed, st.negated,
        st.group.map(desc).toArray)
    }
    val elems = steps.map(desc).toArray
    (elems, flat.toArray)
  }

  private def attemptAt(events: scala.collection.IndexedSeq[Row], start: Int,
      compiled: (Array[MDesc], Array[Step]),
      withinMicros: Option[Long], tIdx: Int): Option[Seq[Seq[(Int, String)]]] = {
    val startUs = tsMicros(events(start).getTimestamp(tIdx))
    val (elems, flatArr) = compiled
    val env = new MatchEnv[Row => Boolean, String] {
      def length: Int = events.length
      def inWin(p: Int): Boolean = withinMicros.forall(w =>
        tsMicros(events(p).getTimestamp(tIdx)) - startUs <= w)
      def matches(tag: Int, p: Int): Boolean = flatArr(tag).pred(events(p))
      def untilHit(tag: Int, p: Int): Boolean =
        flatArr(tag).until.exists(_(events(p)))
      def arm(tag: Int): Row => Boolean = flatArr(tag).pred
      def guardHit(gs: List[Row => Boolean], p: Int): Boolean =
        gs.exists(_(events(p)))
      def label(tag: Int, p: Int): String = labelFor(flatArr(tag), events(p))
    }
    seqMatch(env, elems, start).map(_.map(_.toSeq))
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
    * Ordering: by default events are processed in event-time order
    * within each batch and arrival order across batches (proctime
    * semantics across batches). With `eventTime = true` (requires a
    * watermarked input) the operator is FULLY event-time ordered — the
    * reference's rowtime NFA contract: arrivals wait in a pending
    * buffer and enter the NFA in (ts, id) order only once the watermark
    * passes their timestamp (nothing earlier can still arrive; Spark
    * drops at-or-below-watermark input), so out-of-order events ACROSS
    * micro-batches match exactly like the batch scan of the time-sorted
    * data. State per key is O(active attempt span + in-flight pending);
    * a `within` horizon bounds the attempt span in event time.
    */
  def matchPatternStream(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, steps: Seq[Step],
      withinMicros: Option[Long] = None,
      flushOnHorizon: Boolean = false,
      skip: SkipStrategy = SkipPastLast,
      eventTime: Boolean = false): DataFrame = {
    require(!flushOnHorizon || withinMicros.isDefined,
      "flushOnHorizon needs a withinMicros horizon (and a watermarked input)")
    // a skip-to NAME may be a top-level step, a group sub-step, or an
    // alternation label (the batch emitAndSkip resolution contract)
    def skipTarget(name: String): Boolean = steps.exists(s =>
      s.name == name || s.alts.exists(_._1 == name) ||
        s.group.exists(g => g.name == name || g.alts.exists(_._1 == name)))
    skip match {
      case SkipToFirst(name) => require(skipTarget(name),
        s"skip-to-first: no step '$name'")
      case SkipToLast(name) => require(skipTarget(name),
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
    validateSteps(steps)
    // predicate SLOTS: one per plain step, one per alternative of an
    // alternation group, one per sub-step of a sequence group — the
    // per-event bitmask stores slot bits, so the emit-time classifier
    // label is recoverable without the row (state never holds rows). A
    // step matches when any of its slots match; a consumed position
    // records WHICH slot consumed it (lowest set bit in the consuming
    // step's mask — first declared alternative, the classifier
    // contract).
    val slotPreds = scala.collection.mutable.ArrayBuffer.empty[Row => Boolean]
    val slotLabels = scala.collection.mutable.ArrayBuffer.empty[String]
    def allocSlot(label: String, p: Row => Boolean): Long = {
      require(slotPreds.length < 63,
        "streaming NFA supports at most 63 predicate slots " +
          "(steps + alternatives + group sub-steps + until conditions)")
      val bit = 1L << slotPreds.length
      slotPreds += p
      slotLabels += label
      bit
    }
    // compile the pattern into the shared core's MDesc elements, with a
    // per-element slot MASK (this element's slots) and UNTIL mask (the
    // stop-condition slot, 0 = none — evaluated at ingest like any
    // predicate but excluded from the element mask so the classifier
    // can never pick it as an output label), indexed by MDesc.tag
    val flatMasks = scala.collection.mutable.ArrayBuffer.empty[Long]
    val flatUntils = scala.collection.mutable.ArrayBuffer.empty[Long]
    def desc(st: Step): MDesc = {
      val tag = flatMasks.length
      flatMasks += 0L
      flatUntils += 0L
      if (st.group.isEmpty) {
        val slots = if (st.alts.isEmpty) Seq(st.name -> st.pred) else st.alts
        flatMasks(tag) = slots.map { case (l, p) => allocSlot(l, p) }
          .reduce(_ | _)
      }
      flatUntils(tag) =
        st.until.fold(0L)(up => allocSlot(st.name + "#until", up))
      val (mn, mx, greedy) = bounds(st.quant)
      MDesc(tag, mn, mx, greedy, st.relaxed, st.negated,
        st.group.map(desc).toArray)
    }
    val elems: Array[MDesc] = steps.map(desc).toArray
    val maskArr = flatMasks.toArray
    val untilArr = flatUntils.toArray
    val slotPredArr = slotPreds.toArray
    val slotLabelArr = slotLabels.toArray

    val timeoutConf =
      if (flushOnHorizon || eventTime) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val out = events.groupByKey(_.getLong(kIdx))
      .flatMapGroupsWithState[
          (Seq[(Long, Long, Long)], Seq[(Long, Long, Long)], Long),
          (Long, String, Long, Long)](
        OutputMode.Append, timeoutConf) {
        (key: Long, it: Iterator[Row],
            state: GroupState[(Seq[(Long, Long, Long)], Seq[(Long, Long, Long)], Long)]) =>
          val st0 = state.getOption.getOrElse(
            (Seq.empty[(Long, Long, Long)], Seq.empty[(Long, Long, Long)], 0L))
          // pending = watermark-held arrivals (eventTime mode only)
          var pending: Vector[(Long, Long, Long)] = st0._1.toVector
          var buffer: Vector[(Long, Long, Long)] = st0._2.toVector
          var seq: Long = st0._3
          val emitted = scala.collection.mutable.ListBuffer
            .empty[(Long, String, Long, Long)]

          // One attempt of the batch backtracking NFA over the buffer,
          // leftmost start = buffer head. Outcome:
          //   DEAD     — no match from this start, no future event helps
          //   PARTIAL  — no match yet, but more events could complete one
          //   COMPLETE — hits: per top-level element, consumed BUFFER
          //              POSITIONS with their consuming SLOT (label fixed
          //              at consume time — group iterations flatten into
          //              the group's element in iteration order);
          //              `closed` = no future event could change it.
          // `touchedEnd` is set whenever a step's feasible run was cut
          // short by buffer exhaustion (run < max && ran off the end) on
          // any branch explored up to the first success — exactly the
          // branches whose outcome a future event could flip — when a
          // notNext guard's target event has not arrived yet, and when a
          // group's iteration boundary sits at the buffer tip with
          // iterations to spare (a future event could begin iteration
          // k+1). In flush mode every future event is out of horizon, so
          // exhaustion is equivalent to a window failure (guards are
          // window-scoped) and touchedEnd is moot.
          final case class Att(hits: Array[List[(Int, Int)]], closed: Boolean)
          def attempt(flush: Boolean): (Int, Att) = { // (0 dead,1 partial,2 complete)
            if (buffer.isEmpty) return (1, null)
            val startUs = buffer(0)._2
            var touchedEnd = false
            // the SHARED seqMatch core over the bitmask replay buffer:
            // guards are armed notFollowedBy masks, labels are slot
            // indices (lowest set bit of the consuming element's mask —
            // first declared alternative, the classifier contract), and
            // the provisionality hooks record branches a future event
            // could flip. In flush mode every future event is beyond the
            // horizon, so tip exhaustion is equivalent to a window
            // failure (guards are window-scoped) and the tip hooks are
            // inert; scan-truncation flags stay moot through `closed =
            // … || flush` below.
            val env = new MatchEnv[Long, Int] {
              def length: Int = buffer.length
              def inWin(p: Int): Boolean =
                withinMicros.forall(w => buffer(p)._2 - startUs <= w)
              def matches(tag: Int, p: Int): Boolean =
                (buffer(p)._3 & maskArr(tag)) != 0L
              def untilHit(tag: Int, p: Int): Boolean = {
                val u = untilArr(tag)
                u != 0L && (buffer(p)._3 & u) != 0L
              }
              def arm(tag: Int): Long = maskArr(tag)
              def guardHit(gs: List[Long], p: Int): Boolean =
                gs.exists(g => (buffer(p)._3 & g) != 0L)
              def label(tag: Int, p: Int): Int =
                java.lang.Long.numberOfTrailingZeros(
                  buffer(p)._3 & maskArr(tag))
              override def onNotNextAtTip(): Unit =
                if (!flush) touchedEnd = true
              override def onGreedyTruncated(): Unit = touchedEnd = true
              override def onReluctantTruncated(): Unit = touchedEnd = true
              override def onIterBoundaryAtTip(): Unit =
                if (!flush) touchedEnd = true
            }
            seqMatch(env, elems, 0) match {
              case None => (if (touchedEnd && !flush) 1 else 0, null)
              case Some(hits) =>
                (2, Att(hits.toArray, closed = !touchedEnd || flush))
            }
          }

          def emitMatch(att: Att): Unit = {
            att.hits.foreach(_.foreach { case (p, slot) =>
              // classifier label fixed at consume time: the lowest set
              // slot of the consuming element — first declared
              // alternative / the consuming group sub-step
              emitted += ((key, slotLabelArr(slot), buffer(p)._1, seq))
            })
            seq += 1
            // after-match skip on consumed positions — same arithmetic
            // as the batch scan (buffer head = position 0); an
            // all-optional empty match still advances one event. A
            // skip-to NAME resolves to a top-level step first, then to a
            // group sub-step or alternation label (the batch emitAndSkip
            // contract), preferring positions consumed UNDER that label.
            val all = att.hits.toIndexedSeq.flatten.map(_._1)
            def resolve(name: String): Int = {
              val idx = steps.indexWhere(_.name == name)
              if (idx >= 0) idx
              else steps.indexWhere(s => s.alts.exists(_._1 == name) ||
                s.group.exists(g => g.name == name ||
                  g.alts.exists(_._1 == name)))
            }
            def named(idx: Int, name: String): Seq[Int] =
              att.hits(idx).collect {
                case (p, slot) if slotLabelArr(slot) == name => p }
            val advance = skip match {
              case SkipPastLast => if (all.isEmpty) 1 else all.max + 1
              case SkipToNext => 1
              case SkipToFirst(name) =>
                val idx = resolve(name)
                val nm = named(idx, name)
                val cand = if (nm.nonEmpty) nm
                  else att.hits.drop(idx).toIndexedSeq.flatten.map(_._1)
                if (cand.nonEmpty) cand.min
                else if (all.isEmpty) 1 else all.max + 1
              case SkipToLast(name) =>
                val idx = resolve(name)
                val nm = named(idx, name)
                val cand = if (nm.nonEmpty) nm
                  else att.hits.take(idx + 1).toIndexedSeq.flatten.map(_._1)
                if (cand.nonEmpty) cand.max else 1
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

          if (!state.hasTimedOut) {
            val ordered = it.toArray.sortBy(r =>
              (tsMicros(r.getTimestamp(tIdx)), r.getLong(iIdx)))
            ordered.foreach { e =>
              var bits = 0L
              var s = 0
              while (s < slotPredArr.length) {
                if (slotPredArr(s)(e)) bits |= (1L << s)
                s += 1
              }
              val triple = (e.getLong(iIdx),
                tsMicros(e.getTimestamp(tIdx)), bits)
              if (eventTime) pending = pending :+ triple
              else buffer = buffer :+ triple
            }
          }
          if (eventTime) {
            // release watermark-finalized arrivals into the NFA in
            // (ts, id) order: later arrivals are strictly above the
            // watermark, so nothing can land before a released event
            val wmUs = state.getCurrentWatermarkMs * 1000L
            val (ripe, hold) = pending.partition(_._2 <= wmUs)
            if (ripe.nonEmpty) {
              pending = hold
              buffer = buffer ++ ripe.sortBy(e => (e._2, e._1))
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
          }
          // ONE pump per invocation: attempt() is a pure function of the
          // final buffer and only closed (future-proof) matches emit,
          // so per-event pumping would produce identical output while
          // re-scanning the whole buffer per event — O(batch²) on a
          // long open run
          pump()
          state.update((pending, buffer, seq))
          // wake at the earliest actionable instant: the next pending
          // release (eventTime) and/or the head anchor's horizon expiry
          val wakeups =
            (if (eventTime && pending.nonEmpty)
              Seq(pending.map(_._2).min / 1000L + 1) else Nil) ++
            (if (flushOnHorizon && buffer.nonEmpty)
              Seq((buffer(0)._2 + withinMicros.get) / 1000L + 1) else Nil)
          if (wakeups.nonEmpty)
            state.setTimeoutTimestamp(math.max(wakeups.min,
              state.getCurrentWatermarkMs + 1))
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
    * Contiguity (reference Pattern.next/followedBy/notNext/
    * notFollowedBy — Pattern.java:50): a bare step attaches strictly
    * (`next`); a `~>` token before it attaches it relaxed
    * (`followedBy` — non-matching events between are skipped). A `!`
    * prefix negates: `!C` is `notNext(C)` (the immediately-following
    * event must not match), `~> !C` is `notFollowedBy(C)` (no matching
    * event in the gap before the next positive step's first take).
    * Negated steps take no quantifier. `(A|B)` is an alternation group
    * (see [[alt]]) and quantifies like any step — `(A|B)+` consumes a
    * run of events each matching A or B, labeling every consumed event
    * with its first matching alternative. `(A B)+` / `(A B){m,n}` is a
    * quantifiable SEQUENCE group (see [[group]], reference
    * GroupPattern.java): the quantifier repeats the whole sub-sequence;
    * sub-steps may carry their own quantifiers and `~>` contiguity
    * (`(A ~> B+){2}`); one nesting level, no `|` inside.
    *
    * `Cep.pattern("signup error+ purchase?", preds)` ==
    * `Seq(Step("signup",…), Step("error",…,Plus), Step("purchase",…,Opt))`;
    * `Cep.pattern("signup ~> !error ~> purchase", preds)` ==
    * signup `notFollowedBy` error `followedBy` purchase.
    */
  def pattern(spec: String,
      preds: Map[String, Row => Boolean]): Seq[Step] = {
    val StepRe =
      """(!)?([A-Za-z_][A-Za-z0-9_]*)(\+\??|\?\??|\{\d+(?:,\d*)?\}\??)?""".r
    val AltRe =
      """\(([A-Za-z_]\w*(?:\|[A-Za-z_]\w*)+)\)(\+\??|\?\??|\{\d+(?:,\d*)?\}\??)?""".r
    def parseQuant(quant: String): Quant = Option(quant).getOrElse("") match {
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
    // a SEQUENCE group `(A B)+` / `(A ~> B){1,3}` (reference
    // GroupPattern.java): parens containing whitespace; the quantifier
    // applies to the whole sub-sequence. Distinguished from an
    // alternation `(A|B)+` by the space. One nesting level only.
    val GroupRe =
      """\(([^()|]*\s[^()]*)\)(\+\??|\?\??|\{\d+(?:,\d*)?\}\??)?""".r
    def predOf(name: String): Row => Boolean = preds.getOrElse(name,
      throw new IllegalArgumentException(s"no predicate for step '$name'"))
    def parseSeq(body: String): Seq[Step] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Step]
      var relaxedNext = false
      // a parenthesized segment (with its trailing quantifier) is one
      // token; everything else splits on whitespace
      val tokRe =
        """\([^()]*\)(?:\+\??|\?\??|\{\d+(?:,\d*)?\}\??)?|[^\s()]+""".r
      val trimmed = body.trim
      // findAllIn silently SKIPS characters no alternative matches —
      // a stray '(' or ')' (typo'd/unbalanced group) would quietly
      // parse as a different pattern. Every inter-token gap must be
      // whitespace-only.
      var covered = 0
      tokRe.findAllMatchIn(trimmed).foreach { m =>
        require(trimmed.substring(covered, m.start).isBlank,
          s"bad pattern near '${trimmed.substring(covered,
            math.min(covered + 12, trimmed.length))}' — unbalanced " +
            "parenthesis or stray character")
        covered = m.end
      }
      require(trimmed.substring(covered).isBlank,
        s"bad pattern near '${trimmed.substring(covered)}' — " +
          "unbalanced parenthesis or stray character")
      tokRe.findAllIn(trimmed).foreach {
        case "~>" =>
          require(!relaxedNext, "dangling '~>' in pattern")
          // a leading '~>' has nothing to relax: the first step's
          // contiguity is defined by its container, and inside a group
          // body a relaxed HEAD sub-step would silently make every
          // iteration attach relaxed even when the group itself is
          // strict — the one strict/relaxed mismatch validateSteps
          // cannot see after the fact. Reject at parse time.
          require(out.nonEmpty,
            "pattern (or group body) cannot start with '~>' — contiguity" +
              " of the first step is set by the group's own quantifier" +
              " attachment, not a leading '~>'")
          relaxedNext = true
        case AltRe(names, quant) =>
          val g = alt(names.split('|').toIndexedSeq
            .map(n => n -> predOf(n)): _*)
          out += g.copy(quant = parseQuant(quant), relaxed = relaxedNext)
          relaxedNext = false
        case GroupRe(inner, quant) =>
          val sub = parseSeq(inner)
          require(sub.forall(_.group.isEmpty),
            s"nested group in '($inner)' is not supported")
          out += group(sub: _*)
            .copy(quant = parseQuant(quant), relaxed = relaxedNext)
          relaxedNext = false
        case StepRe(bang, name, quant) =>
          val pred = predOf(name)
          val negated = bang != null
          require(!negated || quant == null,
            s"negated step '!$name' cannot carry a quantifier")
          out += Step(name, pred, parseQuant(quant),
            relaxed = relaxedNext, negated = negated)
          relaxedNext = false
        case tok =>
          throw new IllegalArgumentException(s"bad pattern token '$tok'")
      }
      require(!relaxedNext, "pattern ends with a dangling '~>'")
      out.toSeq
    }
    parseSeq(spec)
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
