package graft.planner

import graft.planner.PlannerHooks.SqlGenerator

/** V9 default: a deterministic text-to-SQL generator covering the SQL
  * surface the reference's prompt guarantees the LLM will produce
  * (`langgraph_pipeline.py:461-492`: SELECT with WHERE / GROUP BY /
  * ORDER BY / aggregate functions over the cataloged tables) — so
  * `QueryPipeline.run` closes the NL→SQL→result loop hermetically, with
  * zero network. An LLM-backed generator swaps in behind the same
  * `SqlGenerator` seam for open-vocabulary questions.
  *
  * Grammar (all matching on lowercased word tokens):
  *   - aggregate: "how many"/"count" → COUNT(*); "total"/"sum" → SUM;
  *     "average"/"avg"/"mean" → AVG; "max(imum)"/"highest" → MAX;
  *     "min(imum)"/"lowest" → MIN. No aggregate verb → plain row SELECT.
  *   - measure: the first cataloged column of the chosen table whose
  *     underscore-split parts all appear in the question.
  *   - table: the catalog entry with the most name/column mentions
  *     (ties → catalog order), like the reference's table-identification
  *     node feeding its path map.
  *   - grouping: "per/by/each <column>".
  *   - filters: "<column> is/equals <value>" (string equality, quoted),
  *     "<column> over/above/under/below/at least/at most <number>",
  *     "<column> between <a> and <b>" / "<column> from <a> to <b>";
  *     negation via "<column> is not <value>", "<column> not <value>",
  *     or "excluding <column> [is] <value>" (all render <>); multiple
  *     mentions AND-combine (first unit wins per column, question order
  *     preserved), EXCEPT consecutive predicates linked by "or"
  *     [optionally "or with"], which merge into one parenthesized
  *     OR-disjunction unit (r15 — the reference prompt's disjunction
  *     surface, `langgraph_pipeline.py:482-485`).
  *   - having: "having (count | total/average/max/min <measure>)
  *     over/above/under/below/at least/at most <number>" → a HAVING
  *     clause on the grouped aggregate (masked from the main grammar so
  *     its verb cannot hijack the aggregate rule); dropped when no
  *     grouping is present or the measure does not resolve.
  *   - date ranges (the reference SQL-gen prompt guarantees date-range
  *     WHERE clauses, `langgraph_pipeline.py:482-485`): ISO dates are
  *     lifted to marker tokens before tokenization, then
  *     "<column> between <date> and <date>" and "<column>
  *     after/since/from/before/until/through <date>" build range
  *     predicates — DATE literals for date/timestamp columns, quoted
  *     strings for the reference's date-as-string columns (lexicographic
  *     comparison is exact for ISO yyyy-mm-dd).
  *   - NULL handling (same prompt contract): "<column> is [not]
  *     null/missing/empty/blank" → IS [NOT] NULL.
  *   - explicit sort: "sorted/ordered/order [by] <column>
  *     [ascending|descending]" → ORDER BY when the column appears in the
  *     output (group key, measure, or row-select column), overriding the
  *     default order.
  *   - top-k: "top <n>" → ORDER BY measure DESC LIMIT n.
  *
  * The catalog arrives as the `describe` text QueryPipeline already renders
  * (one line per table: `name (N rows): col type, col type`), so the
  * generator needs no side-channel state and the hook stays a pure
  * (question, catalogText) => Option[SQL] function.
  */
object TemplateSqlGenerator extends SqlGenerator {

  private case class Col(name: String, dataType: String) {
    def parts: Seq[String] = name.toLowerCase.split("_").filter(_.nonEmpty).toSeq
    /** Parts with a 1-2 letter schema prefix dropped (`o_totalprice` →
      * `totalprice`), so prefixed warehouse schemas match natural phrasing. */
    def stripped: Seq[String] =
      if (parts.length > 1 && parts.head.length <= 2) parts.tail else parts
    def numeric: Boolean = {
      val t = dataType.toLowerCase
      t.contains("int") || t.contains("double") || t.contains("float") ||
        t.contains("decimal") || t.contains("long")
    }
  }
  private case class Tab(name: String, cols: Seq[Col])

  /** Join key between two cataloged tables: an exactly-shared column name
    * (the same rule `PlannerHooks.NameMatchIdentifier` uses for its
    * join_key — the reference's tool contract, `multi_file_util.py:8-31`),
    * falling back to a prefix-stripped name match so TPC-H-style schemas
    * (`o_custkey` ↔ `c_custkey`) join on their common stem. KEY-LIKE names
    * (stem ending in "key" or "id") are preferred at every tier: without
    * the preference, a full TPC-H catalog would stem-match `o_comment` ↔
    * `c_comment` (sorts before `custkey`) and join orders×customer on
    * comments. Deterministic: key-likeness first, then name order. */
  private def joinKeyOf(a: Tab, b: Tab): Option[(String, String)] = {
    def strip(n: String): String = {
      val p = n.split("_", 2)
      if (p.length == 2 && p(0).length <= 2) p(1) else n
    }
    def keyLike(n: String): Boolean = {
      val s = strip(n.toLowerCase)
      // "id" must match as a suffix TOKEN, not a raw endsWith: stems like
      // "valid" or "paid" end in the letters 'id' without being keys, and
      // ranking them key-like would prefer a shared flag column over the
      // real join key (ADVICE r13). KNOWN LIMIT (ADVICE r14): schemas that
      // glue id on without an underscore (custid, orderid) lose the
      // key preference and fall back to name order among shared columns —
      // accepted, because un-tokenized 'id' suffixes cannot be told apart
      // from English stems without a dictionary, and a wrong key
      // preference is worse than name-order determinism.
      s.endsWith("key") || s == "id" || s.endsWith("_id")
    }
    // sort key-like names first so join candidates that LOOK like keys win
    // over arbitrary shared columns (comments, flags) at both tiers
    def ranked(names: Seq[String]): Seq[String] =
      names.sortBy(n => (if (keyLike(n)) 0 else 1, n))
    val exact = (a.cols.map(_.name).toSet & b.cols.map(_.name).toSet).toSeq
    if (exact.nonEmpty) {
      val k = ranked(exact).head
      Some((k, k))
    } else {
      val byStem = b.cols.groupBy(c => strip(c.name.toLowerCase))
      ranked(a.cols.map(_.name)).iterator.flatMap { an =>
        byStem.get(strip(an.toLowerCase))
          .flatMap(bs => ranked(bs.map(_.name)).headOption)
          .map(bn => (an, bn))
      }.nextOption()
    }
  }

  private val lineRe = """^(\S+) \(\d+ rows\): (.*)$""".r

  private def parseCatalog(catalogText: String): Seq[Tab] =
    catalogText.split("\n").toSeq.collect { case lineRe(name, cols) =>
      Tab(name, cols.split(", ").toSeq.flatMap { c =>
        c.trim.split("\\s+", 2) match {
          case Array(n, t) => Some(Col(n, t))
          case _ => None
        }
      })
    }

  private def tokens(q: String): Seq[String] =
    q.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq

  private def mentioned(toks: Seq[String], c: Col): Boolean =
    c.parts.forall(toks.contains) || toks.contains(c.name.toLowerCase) ||
      c.stripped.forall(toks.contains)

  def generate(question: String, catalogText: String): Option[String] =
    generateImpl(question, catalogText, Nil)

  /** Semantic-grounded entry (the reference's exact-value rule,
    * `langgraph_pipeline.py:429-437`): each grounded predicate contributes
    * `col = 'value'` with the value's EXACT case from the data, and the
    * (possibly misspelled) question substring it was aligned from is
    * removed before the grammar runs — so the typo can neither hijack the
    * measure/filter rules nor emit a second, lowercased equality on the
    * same column. Grounded predicates win over grammar-derived ones per
    * column; predicates naming columns absent from the chosen table are
    * dropped (the narrowing step upstream makes that rare). */
  override def generateGrounded(question: String, catalogText: String,
      grounded: Seq[Grounding.GroundedEq]): Option[String] = {
    val cleaned = grounded.foldLeft(question) { (q, g) =>
      val i = q.toLowerCase.indexOf(g.matchedText.toLowerCase)
      if (i < 0) q else q.substring(0, i) + q.substring(i + g.matchedText.length)
    }
    generateImpl(cleaned, catalogText, grounded.map(g => (g.column, g.value)))
  }

  private def generateImpl(question: String, catalogText: String,
      groundedEq: Seq[(String, String)]): Option[String] = {
    val catalog = parseCatalog(catalogText)
    if (catalog.isEmpty) return None
    // ISO dates would shatter under the \W+ tokenizer ("2024-01-15" →
    // three number tokens), so lift them into marker tokens first and
    // resolve markers back to their literals at predicate-build time
    val dateRe = "\\d{4}-\\d{2}-\\d{2}".r
    val dates = dateRe.findAllIn(question).toVector
    val qMarked = dates.zipWithIndex.foldLeft(question) {
      case (acc, (d, i)) => acc.replaceFirst(d, s" graftdate$i ")
    }
    val rawToks = tokens(qMarked)
    def dateOf(tok: String): Option[String] =
      if (tok.startsWith("graftdate"))
        tok.stripPrefix("graftdate").toIntOption.flatMap(dates.lift)
      else None

    // HAVING clause (post-aggregate filter — the reference SQL-gen prompt
    // guarantees HAVING when asked, `langgraph_pipeline.py:482-485`):
    // "having (count | <verb> <measure words>) <cmp> <number>" is parsed
    // and MASKED before everything else — its aggregate verb and numeric
    // comparison would otherwise leak into the main aggregate/filter
    // rules ("having count over 100" must not turn the query into a
    // COUNT). Resolution of the measure words to a column happens later,
    // against the chosen table.
    val havingVerb = Map("count" -> "COUNT", "total" -> "SUM", "sum" -> "SUM",
      "average" -> "AVG", "avg" -> "AVG", "mean" -> "AVG",
      "max" -> "MAX", "maximum" -> "MAX", "highest" -> "MAX",
      "min" -> "MIN", "minimum" -> "MIN", "lowest" -> "MIN")
    val havingCmp = Map("over" -> ">", "above" -> ">", "under" -> "<",
      "below" -> "<", "least" -> ">=", "most" -> "<=")
    val numRe = "\\d+(\\.\\d+)?"
    val (havingRaw, toks): (Option[(String, Seq[String], String, String)], Seq[String]) = {
      val hi = rawToks.indexOf("having")
      if (hi < 0 || hi + 2 >= rawToks.length) (None, rawToks)
      else rawToks(hi + 1) match {
        case v if havingVerb.contains(v) =>
          val fn = havingVerb(v)
          // measure words: everything up to the comparison word (≤ 3)
          val restAll = rawToks.drop(hi + 2)
          val cmpAt = restAll.indexWhere(w => havingCmp.contains(w) || w == "at")
          if (cmpAt < 0 || cmpAt > 3) (None, rawToks)
          else {
            val mwords = restAll.take(cmpAt)
            val afterM = restAll.drop(cmpAt)
            val parsed = afterM match {
              case op +: n +: _ if havingCmp.contains(op) && n.matches(numRe) =>
                Some((havingCmp(op), n, 2))
              case "at" +: op +: n +: _
                if havingCmp.contains(op) && n.matches(numRe) =>
                Some((havingCmp(op), n, 3))
              case _ => None
            }
            parsed match {
              case Some(_) if fn == "COUNT" && mwords.nonEmpty =>
                (None, rawToks) // count takes no measure words
              case Some((op, n, cmpLen)) =>
                val end = hi + 2 + cmpAt + cmpLen
                (Some((fn, mwords, op, n)),
                  rawToks.take(hi) ++ rawToks.drop(end))
              case None => (None, rawToks)
            }
          }
        case _ => (None, rawToks)
      }
    }
    val q = toks.mkString(" ")

    // table choice: most name/column mentions, catalog order on ties.
    // Plurals match BOTH ways: question "orders" names table "order" and
    // question "nations" names table "nation" (r15 — singular table names
    // previously only matched their own exact token)
    def namesTable(t: Tab): Boolean =
      toks.contains(t.name.toLowerCase) ||
        toks.contains(t.name.toLowerCase.stripSuffix("s")) ||
        toks.contains(t.name.toLowerCase + "s")
    val scored = catalog.map { t =>
      val nameHit = if (namesTable(t)) 2 else 0
      (t, nameHit + t.cols.count(mentioned(toks, _)))
    }
    val best = scored.maxBy(_._2)
    if (best._2 == 0) return None

    // multi-table: when the question NAMES two or more cataloged tables,
    // chain aliased equi-joins on inferred keys — the reference's defining
    // multi-table move (LLM-identified join key, `multi_file_util.py:8-31`
    // — "two or more tables" — feeding aliased joins,
    // `duckdb_util.py:184-225`). Tables attach GREEDILY in score order:
    // each next named table joins the earliest already-joined table it
    // shares a key with (orders⋈customer on custkey, then nation attaches
    // to customer on nationkey — a chain, not a star, when the schema is
    // one). A named table with no key into the joined set is skipped, the
    // same treatment the previous 2-table form gave tables beyond the
    // first pair. No joinable pair at all → single-table fallback.
    val named = scored.filter { case (t, _) => namesTable(t) }
    val chain: Option[(Seq[Tab], String)] =
      if (named.size < 2) None
      else {
        val ordered = named.sortBy(-_._2).map(_._1).take(4)
        val sb = new StringBuilder(ordered.head.name)
        var joined = Vector(ordered.head)
        ordered.tail.foreach { t2 =>
          joined.iterator
            .flatMap(t1 => joinKeyOf(t1, t2).map(k => (t1, k)))
            .nextOption()
            .foreach { case (t1, (k1, k2)) =>
              sb.append(s" JOIN ${t2.name} ON ${t1.name}.$k1 = ${t2.name}.$k2")
              joined :+= t2
            }
        }
        if (joined.size >= 2) Some((joined, sb.toString)) else None
      }
    val (tab, fromClause, qualify) = chain match {
      case Some((ts, fc)) =>
        // shared-name columns resolve to their FIRST owner in join order,
        // qualified so generated SQL never hits an ambiguous reference
        val firstOwner = scala.collection.mutable.LinkedHashMap.empty[String, (Col, String)]
        ts.foreach(tt => tt.cols.foreach(c =>
          if (!firstOwner.contains(c.name)) firstOwner(c.name) = (c, tt.name)))
        val dup = ts.flatMap(_.cols.map(_.name))
          .groupBy(identity).collect { case (n, v) if v.size >= 2 => n }.toSet
        (Tab(ts.head.name, firstOwner.values.map(_._1).toSeq),
          fc,
          firstOwner.collect { case (n, (_, tn)) if dup(n) => n -> s"$tn.$n" }
            .toMap)
      case None => (best._1, best._1.name, Map.empty[String, String])
    }
    def ref(name: String): String = qualify.getOrElse(name, name)

    val agg: Option[(String, Boolean)] = // (fn, needsMeasure)
      if (q.contains("how many") || toks.contains("count")) Some(("COUNT", false))
      else if (toks.contains("total") || toks.contains("sum")) Some(("SUM", true))
      else if (toks.contains("average") || toks.contains("avg") ||
        toks.contains("mean")) Some(("AVG", true))
      else if (toks.contains("max") || toks.contains("maximum") ||
        toks.contains("highest")) Some(("MAX", true))
      else if (toks.contains("min") || toks.contains("minimum") ||
        toks.contains("lowest")) Some(("MIN", true))
      else None

    // grouping: "per|by|each <column words>" — but "by" that belongs to a
    // sort phrase ("sorted/ordered/order by …") is NOT a grouping
    val groupCol = toks.zipWithIndex.collectFirst(Function.unlift {
      case (w, i) if Set("per", "by", "each").contains(w) &&
        !(w == "by" && i > 0 &&
          Set("sorted", "ordered", "order").contains(toks(i - 1))) =>
        tab.cols.find(c => c.parts.nonEmpty &&
          (toks.drop(i + 1).take(c.parts.size + 1).containsSlice(c.parts) ||
            toks.drop(i + 1).take(c.stripped.size + 1).containsSlice(c.stripped)))
      case _ => None
    })

    // explicit sort: "sorted|ordered|order [by] <column> [asc|desc...]"
    val sortSpec: Option[(Col, String)] =
      toks.zipWithIndex.collectFirst(Function.unlift {
        case (w, i) if Set("sorted", "ordered", "order").contains(w) =>
          val j = if (toks.lift(i + 1).contains("by")) i + 2 else i + 1
          tab.cols.find(c => c.parts.nonEmpty &&
            (toks.drop(j).take(c.parts.size) == c.parts ||
              toks.drop(j).take(c.stripped.size) == c.stripped)).map { c =>
            val matchedLen =
              if (toks.drop(j).take(c.parts.size) == c.parts) c.parts.size
              else c.stripped.size
            val dir = toks.drop(j + matchedLen).headOption match {
              case Some("descending") | Some("desc") => "DESC"
              case _ => "ASC"
            }
            (c, dir)
          }
        case _ => None
      })

    // measure rule: the EARLIEST-mentioned numeric column wins (the
    // measure phrase follows the aggregate verb at the head of the
    // question; filter/sort mentions come later) — positional, because
    // the old first-in-catalog-order rule made the measure depend on
    // which table scored higher in a join chain ("average totalprice …
    // where acctbal over 1000" must aggregate totalprice, not acctbal).
    // Ties and non-consecutive mentions fall back to catalog order.
    val measure = agg match {
      case Some((_, true)) =>
        def firstPos(c: Col): Option[Int] =
          toks.indices.find(i =>
            toks.slice(i, i + c.parts.size) == c.parts ||
              toks.slice(i, i + c.stripped.size) == c.stripped)
        val cands = tab.cols.filter(c => c.numeric && !groupCol.contains(c))
        val positioned = cands.flatMap(c => firstPos(c).map(p => (p, c)))
        if (positioned.nonEmpty) Some(positioned.minBy(_._1)._2)
        else cands.find(mentioned(toks, _)).orElse(cands.headOption)
      case _ => None
    }

    // derived-measure phrases (the reference prompt contract allows any
    // SQL expression as a measure, `langgraph_pipeline.py:482-485` — a
    // real catalog hits "revenue = price × (1 − discount)" immediately):
    //   "product of A and B"        → (A * B)
    //   "ratio of A to B"           → (A / B)
    //   "difference of|between A and B" → (A - B)
    //   "A times one minus B"       → (A * (1 - B))   (net-revenue idiom)
    // Both operands must resolve to numeric columns of the chosen table;
    // an unresolved phrase degrades to the single-column rule above (the
    // grammar's degrade-don't-crash contract). Takes precedence over the
    // single-column rule when present — the phrase IS the measure.
    val exprMeasure: Option[(String, String)] = agg match {
      case Some((_, true)) =>
        def colStarting(j: Int): Option[(Col, Int)] =
          tab.cols.collectFirst(Function.unlift { c =>
            if (c.numeric && c.parts.nonEmpty &&
              toks.slice(j, j + c.parts.size) == c.parts)
              Some((c, c.parts.size))
            else if (c.numeric && c.stripped.nonEmpty &&
              toks.slice(j, j + c.stripped.size) == c.stripped)
              Some((c, c.stripped.size))
            else None
          })
        def slug(c: Col): String =
          (if (c.stripped.nonEmpty) c.stripped else c.parts).mkString("_")
        toks.indices.to(LazyList).map { i =>
          toks(i) match {
            case op @ ("product" | "ratio" | "difference")
                if toks.lift(i + 1).exists(w => w == "of" || w == "between") =>
              for {
                (a, la) <- colStarting(i + 2)
                sep = i + 2 + la
                _ <- toks.lift(sep).filter(w => w == "and" || w == "to")
                (b, _) <- colStarting(sep + 1)
              } yield op match {
                case "product" =>
                  (s"(${ref(a.name)} * ${ref(b.name)})",
                    s"product_${slug(a)}_${slug(b)}")
                case "ratio" =>
                  (s"(${ref(a.name)} / ${ref(b.name)})",
                    s"ratio_${slug(a)}_${slug(b)}")
                case _ =>
                  (s"(${ref(a.name)} - ${ref(b.name)})",
                    s"diff_${slug(a)}_${slug(b)}")
              }
            case _ =>
              colStarting(i).flatMap { case (a, la) =>
                val j = i + la
                if (toks.lift(j).contains("times") &&
                  toks.lift(j + 1).contains("one") &&
                  toks.lift(j + 2).contains("minus"))
                  colStarting(j + 3).map { case (b, _) =>
                    (s"(${ref(a.name)} * (1 - ${ref(b.name)}))",
                      s"net_${slug(a)}_${slug(b)}")
                  }
                else None
              }
          }
        }.collectFirst { case Some(m) => m }
      case _ => None
    }

    // filters: "<col> is|equals <word>", "<col> over|above|... <number>",
    // "<col> between <a> and <b>" / "<col> from <a> to <b>", negation
    // ("<col> is not <v>", "<col> not <v>", "excluding <col> [is] <v>").
    // Every mention contributes; consecutive predicates linked by "or"
    // form a parenthesized OR-group (the disjunction surface the
    // reference prompt allows); groups/lone predicates AND-combine, and
    // the first unit touching a column claims it (question order).
    val cmpOps = Map("over" -> ">", "above" -> ">", "under" -> "<",
      "below" -> "<", "least" -> ">=", "most" -> "<=")
    val dateCmp = Map("after" -> ">", "since" -> ">=", "from" -> ">=",
      "before" -> "<", "until" -> "<=", "through" -> "<=")
    val num = "\\d+(\\.\\d+)?"
    // (column, predicate SQL, first token idx, one-past-last token idx)
    val allFilters: Seq[(String, String, Int, Int)] =
      toks.zipWithIndex.flatMap { case (_, i) =>
        tab.cols.find(c => toks.slice(i, i + c.parts.size) == c.parts ||
          toks.slice(i, i + c.stripped.size) == c.stripped).flatMap { c =>
          val matchedLen =
            if (toks.slice(i, i + c.parts.size) == c.parts) c.parts.size
            else c.stripped.size
          val rest = toks.drop(i + matchedLen)
          // a date-typed column compares against DATE literals; string-typed
          // date columns (the reference's date-as-string shape, FIXTURES §A)
          // compare lexicographically — exact for ISO yyyy-mm-dd
          def dlit(d: String): String = {
            val t = c.dataType.toLowerCase
            if (t.contains("date") || t.contains("timestamp")) s"DATE '$d'"
            else s"'$d'"
          }
          val nullWords = Set("null", "missing", "empty", "blank")
          // "excluding <col> [is] <v>" flips the equality built below
          val excluded = i > 0 && toks(i - 1) == "excluding"
          def eqPred(v: String, neg: Boolean): Option[String] = {
            val op = if (neg) "<>" else "="
            if (v.matches(num)) Some(s"${ref(c.name)} $op $v")
            else if (dateOf(v).isDefined)
              Some(s"${ref(c.name)} $op ${dlit(dateOf(v).get)}")
            else if (c.numeric) None
            else Some(s"${ref(c.name)} $op '${v.replace("'", "''")}'")
          }
          // (predicate, tokens consumed AFTER the column mention)
          val pred: Option[(String, Int)] = rest match {
            case "between" +: a +: "and" +: b +: _
              if a.matches(num) && b.matches(num) =>
              Some((s"${ref(c.name)} BETWEEN $a AND $b", 4))
            case "between" +: a +: "and" +: b +: _
              if dateOf(a).isDefined && dateOf(b).isDefined =>
              Some((s"${ref(c.name)} BETWEEN ${dlit(dateOf(a).get)} AND " +
                s"${dlit(dateOf(b).get)}", 4))
            // "from <a> to <b>" is a closed range — matched before the
            // one-sided "from <a>" (>=) rule below
            case "from" +: a +: "to" +: b +: _
              if a.matches(num) && b.matches(num) =>
              Some((s"${ref(c.name)} BETWEEN $a AND $b", 4))
            case "from" +: a +: "to" +: b +: _
              if dateOf(a).isDefined && dateOf(b).isDefined =>
              Some((s"${ref(c.name)} BETWEEN ${dlit(dateOf(a).get)} AND " +
                s"${dlit(dateOf(b).get)}", 4))
            case op +: v +: _ if dateCmp.contains(op) && dateOf(v).isDefined =>
              Some((s"${ref(c.name)} ${dateCmp(op)} ${dlit(dateOf(v).get)}", 2))
            case op +: v +: _ if cmpOps.contains(op) && v.matches(num) =>
              Some((s"${ref(c.name)} ${cmpOps(op)} $v", 2))
            case "at" +: op +: v +: _ if cmpOps.contains(op) && v.matches(num) =>
              Some((s"${ref(c.name)} ${cmpOps(op)} $v", 3))
            case "is" +: "not" +: w +: _ if nullWords.contains(w) =>
              Some((s"${ref(c.name)} IS NOT NULL", 3))
            case "is" +: w +: _ if nullWords.contains(w) =>
              Some((s"${ref(c.name)} IS NULL", 2))
            case "is" +: "not" +: v +: _ =>
              eqPred(v, neg = true).map((_, 3))
            case "not" +: v +: _ =>
              eqPred(v, neg = true).map((_, 2))
            case rel +: v +: _ if Set("is", "equals").contains(rel) =>
              eqPred(v, neg = excluded).map((_, 2))
            case v +: _ if excluded =>
              eqPred(v, neg = true).map((_, 1))
            case _ => None
          }
          pred.map { case (p, consumed) =>
            (c.name, p, if (excluded) i - 1 else i, i + matchedLen + consumed)
          }
        }
      }
    val filter = {
      // OR-grouping: predicates whose spans are joined by exactly "or"
      // (optionally "or with") merge into one parenthesized disjunction
      val units = scala.collection.mutable.ArrayBuffer
        .empty[(Seq[String], Seq[String])] // (columns, predicates)
      var lastFilterEnd = -1
      allFilters.foreach { case (cn, p, start, end) =>
        val joinsPrev = units.nonEmpty && {
          val prevEnd = lastFilterEnd
          val gap = toks.slice(prevEnd, start)
          gap == Seq("or") || gap == Seq("or", "with")
        }
        if (joinsPrev) {
          val (cs, ps) = units.remove(units.size - 1)
          units += ((cs :+ cn, ps :+ p))
        } else units += ((Seq(cn), Seq(p)))
        lastFilterEnd = end
      }
      val seenCols = scala.collection.mutable.Set.empty[String]
      val kept = scala.collection.mutable.ArrayBuffer.empty[String]
      // grounded equalities first: exact-case values from retrieval hits
      // take the per-column slot before any grammar-derived predicate
      groundedEq.foreach { case (cn, v) =>
        if (tab.cols.exists(_.name == cn) && seenCols.add(cn))
          kept += s"${ref(cn)} = '${v.replace("'", "''")}'"
      }
      units.foreach { case (cs, ps) =>
        if (cs.forall(!seenCols.contains(_))) {
          cs.foreach(seenCols.add)
          kept += (if (ps.size == 1) ps.head
          else ps.mkString("(", " OR ", ")"))
        }
      }
      if (kept.isEmpty) None else Some(kept.mkString(" AND "))
    }

    val topK = "\\btop (\\d+)\\b".r.findFirstMatchIn(q).map(_.group(1).toInt)

    // resolve the masked HAVING phrase against the chosen table: COUNT
    // needs no measure; other verbs need their measure words to name one
    // numeric column exactly (no resolution → the clause is dropped, the
    // degrade-don't-crash contract)
    val having: Option[String] = havingRaw.flatMap { case (fn, mwords, op, n) =>
      if (fn == "COUNT") Some(s"count(*) $op $n")
      else tab.cols.find(c => c.numeric &&
          (c.parts == mwords || c.stripped == mwords))
        .map(c => s"$fn(${ref(c.name)}) $op $n")
    }

    val (selectAgg, aggAlias) = agg match {
      case Some(("COUNT", _)) => (Some("count(*) AS n"), Some("n"))
      case Some((fn, _)) =>
        exprMeasure.map { case (e, sl) =>
          (s"$fn($e) AS ${fn.toLowerCase}_$sl", s"${fn.toLowerCase}_$sl")
        }.orElse(measure.map(m =>
          (s"$fn(${ref(m.name)}) AS ${fn.toLowerCase}_${m.name}",
            s"${fn.toLowerCase}_${m.name}"))) match {
          case Some((s, a)) => (Some(s), Some(a))
          case None => (None, None)
        }
      case None => (None, None)
    }

    val sql = (selectAgg, groupCol) match {
      case (Some(a), Some(g)) =>
        // an explicit sort phrase overrides the default ordering when it
        // names a column that exists in the output (the group key or the
        // aggregated measure); top-k keeps its LIMIT either way
        val explicit = sortSpec.flatMap { case (c, dir) =>
          if (groupCol.contains(c)) Some(s"${ref(g.name)} $dir")
          else if (measure.contains(c))
            aggAlias.map(al => s"$al $dir, ${ref(g.name)} ASC")
          else None
        }
        val order = explicit
          .map(o => s" ORDER BY $o" + topK.map(k => s" LIMIT $k").getOrElse(""))
          .getOrElse(topK
            .map(k => s" ORDER BY ${aggAlias.get} DESC, ${ref(g.name)} ASC LIMIT $k")
            .getOrElse(s" ORDER BY ${ref(g.name)} ASC"))
        Some(s"SELECT ${ref(g.name)}, $a FROM $fromClause" +
          filter.map(f => s" WHERE $f").getOrElse("") +
          s" GROUP BY ${ref(g.name)}" +
          having.map(h => s" HAVING $h").getOrElse("") + order)
      case (Some(a), None) =>
        Some(s"SELECT $a FROM $fromClause" +
          filter.map(f => s" WHERE $f").getOrElse(""))
      case (None, _) =>
        val order = sortSpec.map { case (c, dir) => s" ORDER BY ${ref(c.name)} $dir" }
          .orElse(measureOrderCol(tab, toks).map(c => s" ORDER BY ${ref(c.name)} DESC"))
        val lim = topK.getOrElse(20)
        Some(s"SELECT * FROM $fromClause" +
          filter.map(f => s" WHERE $f").getOrElse("") +
          order.getOrElse("") +
          s" LIMIT $lim")
    }
    sql
  }

  /** Row-select questions still get a deterministic order when they name a
    * numeric column ("top 5 loans by amount" without an aggregate verb). */
  private def measureOrderCol(tab: Tab, toks: Seq[String]): Option[Col] =
    tab.cols.find(c => c.numeric && mentioned(toks, c))
}
