package graft.cep

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

/** SQL `MATCH_RECOGNIZE` surface over the graft NFA (reference
  * StreamExecMatch.java:90 + MatchCodeGenerator.scala — the reference
  * exposes its CEP NFA through SQL; graft does the same through a
  * `SparkSessionExtensions.injectParser` rewrite).
  *
  * Supported clause subset (the reference's core MATCH_RECOGNIZE
  * surface):
  *
  * {{{
  * SELECT ... FROM <table> MATCH_RECOGNIZE (
  *   PARTITION BY <keyCol>            -- long
  *   ORDER BY <tsCol>, <idCol>        -- timestamp, long id/tie-breaker
  *   [MEASURES [RUNNING|FINAL] FIRST(v.col)|LAST(v.col)|COUNT(v.*)
  *     |MATCH_NUMBER()|CLASSIFIER() AS name, ...]
  *   [ONE ROW PER MATCH | ALL ROWS PER MATCH]
  *   [AFTER MATCH SKIP PAST LAST ROW | SKIP TO NEXT ROW
  *     | SKIP TO FIRST <step> | SKIP TO LAST <step>]
  *   PATTERN ( <vars with quantifiers: A B+ C? D{1,3} E+?;
  *     alternation groups (A|B)+ — beyond the reference, which
  *     rejects alternation; CLASSIFIER() labels each event with its
  *     matching alternative> )
  *   [WITHIN INTERVAL '<n>' <SECOND|MINUTE|HOUR|DAY>]
  *   [SUBSET <name> = (<var>, ...), ...]
  *     -- union variables (SQL:2016 R010): a SUBSET name used in a
  *     -- MEASURES item aggregates over the union of its members'
  *     -- rows; parity-plus — the reference SQL surface has none
  *   DEFINE <var> AS <boolean sql expr> [, ...]
  *     -- exprs may navigate the ordered input partition with
  *     -- PREV(col[, n]) / NEXT(col[, n]) (bounded inputs only)
  * ) [AS <alias>] ...
  * }}}
  *
  * Output schema of the match relation: without MEASURES, `(key, step,
  * event_id, match_seq)` — one row per consumed event, the same
  * contract as [[Cep.matchPattern]]; with MEASURES (one row per
  * match), `(key, match_seq, <measure aliases...>)`; with ALL ROWS PER
  * MATCH, every input row consumed by a match with its ORIGINAL columns
  * plus the measure aliases — FIRST/LAST/COUNT take the SQL standard's
  * RUNNING semantics (the aggregate over the match's rows up to and
  * including the current row), `MATCH_NUMBER()` is the per-key match
  * ordinal and `CLASSIFIER()` the matched variable of the row. A pattern variable with no DEFINE entry
  * matches any row (SQL standard). The surrounding query (projection,
  * WHERE, ORDER BY, joins) is handled by the default parser: the
  * rewrite substitutes the match relation for the
  * `table MATCH_RECOGNIZE (...)` fragment and splices its logical plan
  * into the delegate-parsed outer plan — no temp-view registration, no
  * catalog side effects on the parser path.
  */
object MatchRecognize {

  private val counter = new AtomicInteger()

  /** One MEASURES item: fn ∈ FIRST/LAST/COUNT/MATCH_NUMBER/CLASSIFIER,
    * variable ("" for the niladic fns), column (None = COUNT(v.*) and
    * the niladic fns), output alias. */
  private final case class Measure(fn: String, variable: String,
      column: Option[String], alias: String, finalSem: Boolean = false)

  private final case class Clause(
      table: String, alias: Option[String],
      key: String, ts: String, id: String,
      skip: Cep.SkipStrategy, patternSpec: String,
      withinMicros: Option[Long], defines: Seq[(String, String)],
      measures: Seq[Measure], allRows: Boolean,
      subsets: Seq[(String, Seq[String])],
      start: Int, end: Int)

  /** The `<table> MATCH_RECOGNIZE (` head; the clause body is found by
    * balanced-paren scan (DEFINE expressions may contain parens). */
  private val Head =
    """(?is)([A-Za-z_][\w.]*)\s+MATCH_RECOGNIZE\s*\(""".r

  /** `PREV([var.]col[, n])` / `NEXT([var.]col[, n])` in DEFINE — per the
    * SQL standard both navigate the input partition's row order, so a
    * qualifier may only name the variable being defined (the reference
    * validates this and rejects foreign-variable navigation; accepting
    * `PREV(A.x)` inside DEFINE B would silently run bare current-row
    * navigation the author did not intend). Groups: dir, qualifier
    * (optional), column, offset (optional). */
  private val NavRe =
    """(?i)\b(PREV|NEXT)\s*\(\s*(?:([A-Za-z_]\w*)\s*\.\s*)?([A-Za-z_]\w*)\s*(?:,\s*(\d+))?\s*\)""".r

  def containsMatchRecognize(text: String): Boolean =
    Head.findFirstIn(text).isDefined

  private def parseClause(text: String): Clause = {
    val m = Head.findFirstMatchIn(text).getOrElse(
      throw new IllegalArgumentException("no MATCH_RECOGNIZE clause"))
    val open = m.end - 1
    var depth = 0
    var i = open
    while (i < text.length && (depth != 0 || i == open)) {
      text.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
      }
      i += 1
    }
    require(depth == 0, "unbalanced parens in MATCH_RECOGNIZE clause")
    val body = text.substring(m.end, i - 1)
    val aliasRe = """(?is)^\s+AS\s+([A-Za-z_]\w*)""".r
    val alias = aliasRe.findFirstMatchIn(text.substring(i)).map(_.group(1))
    val end = alias.fold(i)(a =>
      i + aliasRe.findFirstMatchIn(text.substring(i)).get.end)

    // MEASURES: [RUNNING|FINAL] FIRST/LAST(var.col), COUNT(var.*),
    // MATCH_NUMBER(), CLASSIFIER(). RUNNING (the all-rows default) sees
    // the match's rows up to the current one; FINAL sees the whole
    // match. In one-row mode the two coincide (the standard: the single
    // output row sits at the match's end).
    val measures = """(?is)MEASURES\s+(.*?)(?=(?:ONE\s+ROW|ALL\s+ROWS|AFTER\s+MATCH|PATTERN\s*\(|WITHIN\s|DEFINE\s))""".r
      .findFirstMatchIn(body).map(_.group(1)).map { txt =>
        val itemRe =
          """(?is)^\s*(?:(RUNNING|FINAL)\s+)?(FIRST|LAST|COUNT)\s*\(\s*([A-Za-z_]\w*)\s*\.\s*(\*|[A-Za-z_]\w*)\s*\)\s+AS\s+([A-Za-z_]\w*)\s*$""".r
        val niladicRe =
          """(?is)^\s*(MATCH_NUMBER|CLASSIFIER)\s*\(\s*\)\s+AS\s+([A-Za-z_]\w*)\s*$""".r
        txt.split(",").toSeq.map {
          case itemRe(sem, fn, v, c, as) =>
            val fnU = fn.toUpperCase
            require(fnU != "COUNT" || c == "*",
              s"MATCH_RECOGNIZE: COUNT measure must be COUNT($v.*)")
            require(fnU == "COUNT" || c != "*",
              s"MATCH_RECOGNIZE: $fnU measure needs a column, not *")
            Measure(fnU, v, if (c == "*") None else Some(c), as,
              finalSem = sem != null && sem.toUpperCase == "FINAL")
          case niladicRe(fn, as) => Measure(fn.toUpperCase, "", None, as)
          case item => throw new IllegalArgumentException(
            "MATCH_RECOGNIZE: unsupported MEASURES item '" + item.trim +
              "' — supported: [RUNNING|FINAL] FIRST(v.col)|LAST(v.col)" +
              "|COUNT(v.*)|MATCH_NUMBER()|CLASSIFIER() AS name")
        }
      }.getOrElse(Seq.empty)
    val allRows = """(?is)ALL\s+ROWS\s+PER\s+MATCH""".r
      .findFirstIn(body).isDefined
    def one(re: String, what: String): List[String] =
      re.r.findFirstMatchIn(body) match {
        case Some(g) => (1 to g.groupCount).toList
          .map(g.group).filter(_ != null)
        case None => throw new IllegalArgumentException(
          s"MATCH_RECOGNIZE: missing/bad $what clause")
      }
    val List(key) = one("""(?is)PARTITION\s+BY\s+([A-Za-z_]\w*)""",
      "PARTITION BY <col>")
    val List(ts, id) = one(
      """(?is)ORDER\s+BY\s+([A-Za-z_]\w*)\s*,\s*([A-Za-z_]\w*)""",
      "ORDER BY <tsCol>, <idCol> (two columns: event time + long id)")
    // one nesting level admits alternation groups: PATTERN ((A|B)+ C)
    val List(patternSpec) = one(
      """(?is)PATTERN\s*\(((?:[^()]|\([^()]*\))*)\)""",
      "PATTERN (...)")
    val skip = """(?is)AFTER\s+MATCH\s+SKIP\s+(PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW|TO\s+FIRST\s+[A-Za-z_]\w*|TO\s+LAST\s+[A-Za-z_]\w*)""".r
      .findFirstMatchIn(body).map(_.group(1)) match {
      case None => Cep.SkipPastLast
      case Some(s) =>
        val norm = s.trim.split("\\s+").map(_.toUpperCase).toList
        norm match {
          case List("PAST", "LAST", "ROW") => Cep.SkipPastLast
          case List("TO", "NEXT", "ROW") => Cep.SkipToNext
          case List("TO", "FIRST", _) =>
            Cep.SkipToFirst(s.trim.split("\\s+").last)
          case List("TO", "LAST", _) =>
            Cep.SkipToLast(s.trim.split("\\s+").last)
          case _ => throw new IllegalArgumentException(
            s"MATCH_RECOGNIZE: bad AFTER MATCH SKIP '$s'")
        }
    }
    val within = """(?is)WITHIN\s+INTERVAL\s+'(\d+)'\s+([A-Za-z]+)""".r
      .findFirstMatchIn(body).map { g =>
        val n = g.group(1).toLong
        g.group(2).toUpperCase.stripSuffix("S") match {
          case "SECOND" => n * 1000000L
          case "MINUTE" => n * 60000000L
          case "HOUR" => n * 3600000000L
          case "DAY" => n * 86400000000L
          case u => throw new IllegalArgumentException(
            s"MATCH_RECOGNIZE: bad WITHIN unit '$u'")
        }
      }
    // SUBSET U = (A, B), V = (B, C): union variables (SQL standard
    // 2016 R010; Calcite grammar puts the clause between PATTERN and
    // DEFINE). A subset name stands for the union of its members' rows
    // and is usable wherever a MEASURES item names a variable —
    // parity-plus: the reference's 1.13 SQL surface has no SUBSET.
    val subsets = """(?is)\bSUBSET\s+(.*?)(?=DEFINE\s|$)""".r
      .findFirstMatchIn(body).map(_.group(1)).map { txt =>
        val entryRe = """(?s)([A-Za-z_]\w*)\s*=\s*\(([^)]*)\)""".r
        val entries = entryRe.findAllMatchIn(txt).map { e =>
          e.group(1) -> e.group(2).split(",").map(_.trim).toSeq
            .filter(_.nonEmpty)
        }.toSeq
        val leftover = entryRe.replaceAllIn(txt, "")
          .replaceAll("[,\\s]", "")
        require(entries.nonEmpty && leftover.isEmpty,
          s"MATCH_RECOGNIZE: bad SUBSET clause '${txt.trim}' — expected " +
            "SUBSET name = (var, ...), ...")
        entries.foreach { case (n, ms) => require(ms.nonEmpty,
          s"MATCH_RECOGNIZE: SUBSET $n has no members") }
        // case-SENSITIVE like pattern-variable resolution (varMatch and
        // the collision/member checks): SUBSET U and u are distinct names
        require(entries.map(_._1).distinct.size ==
          entries.size, "MATCH_RECOGNIZE: duplicate SUBSET name")
        entries
      }.getOrElse(Seq.empty)
    val defines = """(?is)DEFINE\s+(.*)$""".r.findFirstMatchIn(body)
      .map(_.group(1)).map { defs =>
        defs.split("""(?i),(?=\s*[A-Za-z_]\w*\s+AS\s)""").toSeq.map { d =>
          val kv = """(?is)^\s*([A-Za-z_]\w*)\s+AS\s+(.*)$""".r
          d match {
            case kv(name, e) => name -> e.trim
            case _ => throw new IllegalArgumentException(
              s"MATCH_RECOGNIZE: bad DEFINE entry '$d'")
          }
        }
      }.getOrElse(Seq.empty)
    // fail fast on shapes the single-clause splice can't handle, instead
    // of letting the delegate parser choke on a half-rewritten statement
    require(!containsMatchRecognize(text.substring(end)),
      "MATCH_RECOGNIZE: only one clause per statement is supported")
    Clause(m.group(1), alias, key, ts, id, skip, patternSpec.trim,
      within, defines, measures, allRows, subsets, m.start, end)
  }

  /** The statement's WITH prefix (all CTE definitions, balanced-paren
    * scan) and the LOWERCASED set of CTE names it defines — so a
    * MATCH_RECOGNIZE whose input is a CTE can be resolved by re-running
    * that prefix. Best-effort: callers treat a parse failure as "no
    * usable prefix" and fall back to catalog resolution, so exotic WITH
    * shapes this scanner can't read (string literals with unbalanced
    * parens, etc.) degrade to the pre-CTE behavior instead of erroring. */
  private def withPrefix(text: String): Option[(String, Set[String])] = {
    val head = """(?is)^\s*WITH\s+""".r.findFirstMatchIn(text)
      .getOrElse(return None)
    // optional column-alias list: name(a, b) AS ( ... )
    val nameRe =
      """(?is)^\s*([A-Za-z_]\w*)\s*(?:\([^)]*\))?\s+AS\s*\(""".r
    var i = head.end
    val names = scala.collection.mutable.Set.empty[String]
    var more = true
    while (more) {
      val m = nameRe.findFirstMatchIn(text.substring(i)).getOrElse(
        throw new IllegalArgumentException(
          s"MATCH_RECOGNIZE: cannot parse CTE list near '${
            text.substring(i).take(40)}'"))
      names += m.group(1).toLowerCase
      var j = i + m.end - 1 // at the opening paren
      var depth = 0
      val open = j
      while (j < text.length && (depth != 0 || j == open)) {
        text.charAt(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        j += 1
      }
      require(depth == 0, "unbalanced parens in WITH clause")
      i = j
      val rest = text.substring(i)
      if (rest.matches("(?s)\\s*,.*")) i += rest.indexOf(',') + 1
      else more = false
    }
    Some((text.substring(0, i), names.toSet))
  }

  /** Build the match relation for a parsed clause: DEFINE expressions
    * become boolean predicate columns evaluated by Catalyst (codegen'd
    * projection — the NFA reads plain booleans, no per-row SQL eval),
    * then the NFA runs per key via [[Cep.matchPattern]]. A `fullText`
    * WITH prefix defining the input relation is honored by re-running
    * the CTE chain (nested CTE references included). */
  private def buildMatch(spark: SparkSession, c: Clause,
      fullText: String): DataFrame = {
    val cte = scala.util.Try(withPrefix(fullText)).toOption.flatten
    val base =
      if (cte.exists(_._2.contains(c.table.toLowerCase)))
        spark.sql(s"${cte.get._1} SELECT * FROM ${c.table}")
      else try spark.table(c.table)
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"MATCH_RECOGNIZE: input '${c.table}' is neither a catalog " +
              "table/view nor a CTE of this statement", e)
      }
    // PREV/NEXT input navigation in DEFINE (SQL standard semantics:
    // navigate the ORDERED INPUT PARTITION, not the match) — compiled to
    // LAG/LEAD window columns before the NFA runs, so navigation is a
    // codegen'd window over the same (key → ts, id) shuffle the match
    // itself needs; the NFA still reads plain precomputed booleans.
    // NULL navigation (partition edge) makes the predicate false, per
    // the NFA's null-is-false contract.
    val navCalls = c.defines.flatMap { case (name, e) =>
      NavRe.findAllMatchIn(e).map { m =>
        Option(m.group(2)).filterNot(_.equalsIgnoreCase(name)).foreach(q =>
          throw new IllegalArgumentException(
            s"MATCH_RECOGNIZE: ${m.group(1).toUpperCase}($q.${m.group(3)}) " +
              s"inside DEFINE $name — a navigation qualifier may only name " +
              s"the variable being defined (PREV/NEXT navigate the ordered " +
              s"input partition, not another variable's rows)"))
        (m.group(1).toUpperCase,
          m.group(3), Option(m.group(4)).fold(1)(_.toInt))
      }.toSeq
    }.distinct
    require(navCalls.isEmpty || !base.isStreaming,
      "MATCH_RECOGNIZE: PREV/NEXT in DEFINE needs a bounded input " +
        "(navigation is a window over the full partition)")
    val navWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col(c.key)).orderBy(col(c.ts), col(c.id))
    val withNav = navCalls.foldLeft(base) { case (acc, (dir, cn, n)) =>
      // case-insensitive, matching Spark's default column resolution —
      // a bare `Value` that resolves outside PREV() must resolve inside
      require(base.columns.exists(_.equalsIgnoreCase(cn)),
        s"MATCH_RECOGNIZE: $dir($cn) — column '$cn' not in input " +
          s"(${base.columns.mkString(",")})")
      val nav = if (dir == "PREV") lag(col(cn), n).over(navWin)
        else lead(col(cn), n).over(navWin)
      acc.withColumn(s"__nav_${dir.toLowerCase}${n}_$cn", nav)
    }
    val defines = c.defines.map { case (name, e) =>
      name -> NavRe.replaceAllIn(e, m =>
        s"__nav_${m.group(1).toLowerCase}${
          Option(m.group(4)).fold(1)(_.toInt)}_${m.group(3)}")
    }
    val withPreds = defines.foldLeft(withNav) { case (acc, (name, e)) =>
      acc.withColumn(s"__p_$name", expr(e).cast("boolean"))
    }
    val schema = withPreds.schema.fieldNames
    // every identifier in the spec is a pattern variable — alternation
    // `(A|B)+` and sequence groups `(A B)+` contribute their members
    // (each may carry its own DEFINE; classifier labels them
    // separately); quantifier braces hold only digits, so a bare
    // identifier scan cannot pick up quantifier text
    val stepNames = """[A-Za-z_]\w*""".r
      .findAllIn(c.patternSpec).toSeq.distinct
    val preds: Map[String, Row => Boolean] = stepNames.map { n =>
      val i = schema.indexOf(s"__p_$n")
      n -> (if (i < 0) (_: Row) => true
            else (r: Row) => !r.isNullAt(i) && r.getBoolean(i))
    }.toMap
    val steps = Cep.pattern(c.patternSpec, preds)
    // a STREAMING input routes to the incremental NFA (reference
    // StreamExecMatch): same pattern surface, per-key replay-buffer
    // state across micro-batches; measures need the bounded relation
    val matched =
      if (withPreds.isStreaming) {
        require(c.measures.isEmpty && !c.allRows,
          "MATCH_RECOGNIZE: MEASURES / ALL ROWS PER MATCH on a " +
            "streaming input is not supported — join/aggregate the raw " +
            "matched relation downstream")
        // a WATERMARKED stream gets the reference's full rowtime
        // semantics: event-time ordering across micro-batches (arrivals
        // wait until the watermark passes them — StreamExecMatch sorts
        // on rowtime), and with WITHIN also horizon flushing — an open
        // match emits (and dead prefixes GC) once the watermark passes
        // its start's horizon, instead of waiting for a closing event
        // that may never come. An unwatermarked stream keeps
        // arrival-order (proctime) semantics.
        val watermarked = withPreds.queryExecution.analyzed.collectFirst {
          case e: org.apache.spark.sql.catalyst.plans.logical
            .EventTimeWatermark => e
        }.isDefined
        Cep.matchPatternStream(withPreds, c.key, c.ts, c.id, steps,
          c.withinMicros,
          flushOnHorizon = c.withinMicros.isDefined && watermarked,
          c.skip, eventTime = watermarked)
      } else Cep.matchPattern(withPreds, c.key, c.ts, c.id, steps,
        c.withinMicros, c.skip)
    if (c.measures.isEmpty && !c.allRows) return matched

    val inCols = withPreds.columns
    // SUBSET union variables: a subset name stands for the union of its
    // members' matched rows. Resolution is case-sensitive like pattern
    // variables themselves; a subset may not shadow a pattern variable
    // and every member must be one.
    val subsetMap = c.subsets.toMap
    c.subsets.foreach { case (n, members) =>
      require(!stepNames.contains(n),
        s"MATCH_RECOGNIZE: SUBSET '$n' collides with a pattern variable")
      members.foreach(v => require(stepNames.contains(v),
        s"MATCH_RECOGNIZE: SUBSET $n member '$v' is not a pattern " +
          s"variable of (${stepNames.mkString(" ")})"))
    }
    // the variable-match predicate a measure aggregates over: one label
    // for a pattern variable, a label set for a SUBSET union variable
    def varMatch(v: String): Column = subsetMap.get(v) match {
      case Some(members) => col("step").isin(members.map(lit): _*)
      case None => col("step") === v
    }
    c.measures.foreach { ms =>
      if (ms.fn == "CLASSIFIER") require(c.allRows,
        "MATCH_RECOGNIZE: CLASSIFIER() needs ALL ROWS PER MATCH — in " +
          "one-row mode every row of the match collapses into one")
      if (ms.variable.nonEmpty) {
        require(stepNames.contains(ms.variable) ||
            subsetMap.contains(ms.variable),
          s"MATCH_RECOGNIZE: MEASURES variable '${ms.variable}' is not " +
            s"a pattern variable of (${stepNames.mkString(" ")}) or a " +
            s"SUBSET name")
        ms.column.foreach(cn => require(inCols.contains(cn),
          s"MATCH_RECOGNIZE: MEASURES column '$cn' not in input " +
            s"(${inCols.mkString(",")})"))
      }
    }
    // join the matched event ids back to the input rows (prefixed to
    // dodge name collisions); on (key, id) — the id column is only a
    // tie-breaker WITHIN a partition, ids may repeat across keys
    val prefixed = withPreds.toDF(inCols.map("__in_" + _): _*)
    val joined = matched.join(prefixed,
      col("key") === col(s"__in_${c.key}") &&
        col("event_id") === col(s"__in_${c.id}"))
    val ordKey = struct(col(s"__in_${c.ts}"), col(s"__in_${c.id}"))

    if (c.allRows) {
      // ALL ROWS PER MATCH: every consumed input row with its original
      // columns plus the measures under RUNNING semantics — each
      // aggregate sees the match's rows up to and including the current
      // row (the SQL standard default in all-rows mode). One window
      // over (key, match_seq), same shuffle as the match itself.
      val wBase = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key"), col("match_seq"))
        .orderBy(col(s"__in_${c.ts}"), col(s"__in_${c.id}"))
      val running = wBase.rowsBetween(Long.MinValue, 0)
      // FINAL: the aggregate over the WHOLE match on every row — the
      // same window partition with an unbounded-both-ends frame
      val whole = wBase.rowsBetween(Long.MinValue, Long.MaxValue)
      val measureCols = c.measures.map { ms =>
        val isVar = varMatch(ms.variable)
        val w = if (ms.finalSem) whole else running
        ms.fn match {
          case "FIRST" => first(
            when(isVar, col(s"__in_${ms.column.get}")), ignoreNulls = true)
            .over(w).as(ms.alias)
          case "LAST" => last(
            when(isVar, col(s"__in_${ms.column.get}")), ignoreNulls = true)
            .over(w).as(ms.alias)
          case "COUNT" => count(when(isVar, lit(1))).over(w).as(ms.alias)
          case "MATCH_NUMBER" => col("match_seq").as(ms.alias)
          case "CLASSIFIER" => col("step").as(ms.alias)
        }
      }
      val original = inCols
        .filterNot(n => n.startsWith("__p_") || n.startsWith("__nav_"))
        .map(n => col(s"__in_$n").as(n))
      joined.select(original ++ measureCols: _*)
    } else {
      // ONE ROW PER MATCH: fold each measure into a per-(key, match_seq)
      // aggregate — FIRST/LAST are min_by/max_by over the (ts, id) event
      // order, COUNT(v.*) a conditional count. One aggregation on the
      // (small) matched-event relation.
      val aggs = c.measures.map { ms =>
        val isVar = varMatch(ms.variable)
        ms.fn match {
          case "FIRST" => min_by(
            when(isVar, col(s"__in_${ms.column.get}")),
            when(isVar, ordKey)).as(ms.alias)
          case "LAST" => max_by(
            when(isVar, col(s"__in_${ms.column.get}")),
            when(isVar, ordKey)).as(ms.alias)
          case "COUNT" => count(when(isVar, lit(1))).as(ms.alias)
          case "MATCH_NUMBER" => first(col("match_seq")).as(ms.alias)
        }
      }
      joined.groupBy(col("key"), col("match_seq"))
        .agg(aggs.head, aggs.tail: _*)
    }
  }

  /** Parser-path rewrite: returns the outer plan with the match relation
    * spliced where the `table MATCH_RECOGNIZE (...)` fragment stood, or
    * None when the text has no MATCH_RECOGNIZE. */
  def rewritePlan(text: String,
      delegate: String => LogicalPlan): Option[LogicalPlan] = {
    if (!containsMatchRecognize(text)) return None
    val spark = SparkSession.getActiveSession.getOrElse(
      throw new IllegalStateException(
        "MATCH_RECOGNIZE requires an active SparkSession"))
    val c = parseClause(text)
    val ph = s"__graft_mr_${counter.incrementAndGet()}"
    val rewritten =
      text.substring(0, c.start) + ph + " " + text.substring(c.end)
    val matched = buildMatch(spark, c, text)
    val outer = delegate(rewritten)
    Some(outer.transform {
      case u: UnresolvedRelation if u.multipartIdentifier == Seq(ph) =>
        SubqueryAlias(c.alias.getOrElse(ph), matched.queryExecution.logical)
    })
  }

  /** Direct execution path for sessions built WITHOUT the graft parser
    * extension (e.g. the driver's plain Verify session): same rewrite,
    * via an eagerly-analyzed temp view that is dropped immediately after
    * analysis. */
  def sql(spark: SparkSession, text: String): DataFrame = {
    require(containsMatchRecognize(text),
      "MatchRecognize.sql: no MATCH_RECOGNIZE clause; use spark.sql")
    val c = parseClause(text)
    val ph = s"__graft_mr_${counter.incrementAndGet()}"
    val rewritten = (text.substring(0, c.start) +
      s"$ph${c.alias.fold(" ")(a => s" AS $a ")}" + text.substring(c.end))
    buildMatch(spark, c, text).createOrReplaceTempView(ph)
    try spark.sql(rewritten) // analysis is eager: the view resolves here
    finally spark.catalog.dropTempView(ph)
  }
}

/** The injected parser: delegates everything to the session's default
  * parser except plans whose text contains MATCH_RECOGNIZE. */
class MatchRecognizeParser(delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    MatchRecognize.rewritePlan(sqlText, delegate.parsePlan)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    MatchRecognize.rewritePlan(sqlText, delegate.parseQuery)
      .getOrElse(delegate.parseQuery(sqlText))

  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String) =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String) =
    delegate.parseRoutineParam(sqlText)
}
