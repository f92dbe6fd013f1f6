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
  *     "<column> over/above/under/below/at least/at most <number>", or
  *     "<column> between <a> and <b>"; multiple mentions AND-combine
  *     (first predicate wins per column, question order preserved).
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
      // real join key (ADVICE r13)
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

  def generate(question: String, catalogText: String): Option[String] = {
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
    val toks = tokens(qMarked)
    def dateOf(tok: String): Option[String] =
      if (tok.startsWith("graftdate"))
        tok.stripPrefix("graftdate").toIntOption.flatMap(dates.lift)
      else None
    val q = toks.mkString(" ")

    // table choice: most name/column mentions, catalog order on ties
    val scored = catalog.map { t =>
      val nameHit =
        if (toks.contains(t.name.toLowerCase) ||
          toks.contains(t.name.toLowerCase.stripSuffix("s"))) 2 else 0
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
    val named = scored.filter { case (t, _) =>
      toks.contains(t.name.toLowerCase) ||
        toks.contains(t.name.toLowerCase.stripSuffix("s"))
    }
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

    // filters: "<col> is|equals <word>", "<col> over|above|... <number>",
    // "<col> between <a> and <b>" — every mention contributes, combined
    // with AND (first predicate wins per column, question order preserved)
    val cmpOps = Map("over" -> ">", "above" -> ">", "under" -> "<",
      "below" -> "<", "least" -> ">=", "most" -> "<=")
    val dateCmp = Map("after" -> ">", "since" -> ">=", "from" -> ">=",
      "before" -> "<", "until" -> "<=", "through" -> "<=")
    val num = "\\d+(\\.\\d+)?"
    val allFilters = toks.zipWithIndex.flatMap { case (_, i) =>
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
        val pred = rest match {
          case "between" +: a +: "and" +: b +: _
            if a.matches(num) && b.matches(num) =>
            Some(s"${ref(c.name)} BETWEEN $a AND $b")
          case "between" +: a +: "and" +: b +: _
            if dateOf(a).isDefined && dateOf(b).isDefined =>
            Some(s"${ref(c.name)} BETWEEN ${dlit(dateOf(a).get)} AND ${dlit(dateOf(b).get)}")
          case op +: v +: _ if dateCmp.contains(op) && dateOf(v).isDefined =>
            Some(s"${ref(c.name)} ${dateCmp(op)} ${dlit(dateOf(v).get)}")
          case op +: v +: _ if cmpOps.contains(op) && v.matches(num) =>
            Some(s"${ref(c.name)} ${cmpOps(op)} $v")
          case "at" +: op +: v +: _ if cmpOps.contains(op) && v.matches(num) =>
            Some(s"${ref(c.name)} ${cmpOps(op)} $v")
          case "is" +: "not" +: w +: _ if nullWords.contains(w) =>
            Some(s"${ref(c.name)} IS NOT NULL")
          case "is" +: w +: _ if nullWords.contains(w) =>
            Some(s"${ref(c.name)} IS NULL")
          case rel +: v +: _ if Set("is", "equals").contains(rel) =>
            if (v.matches(num)) Some(s"${ref(c.name)} = $v")
            else if (dateOf(v).isDefined) Some(s"${ref(c.name)} = ${dlit(dateOf(v).get)}")
            else if (c.numeric) None
            else Some(s"${ref(c.name)} = '${v.replace("'", "''")}'")
          case _ => None
        }
        pred.map(p => (c.name, p))
      }
    }
    val filter = {
      val seen = scala.collection.mutable.LinkedHashMap.empty[String, String]
      allFilters.foreach { case (cn, p) => if (!seen.contains(cn)) seen(cn) = p }
      if (seen.isEmpty) None else Some(seen.values.mkString(" AND "))
    }

    val topK = "\\btop (\\d+)\\b".r.findFirstMatchIn(q).map(_.group(1).toInt)

    val (selectAgg, aggAlias) = agg match {
      case Some(("COUNT", _)) => (Some("count(*) AS n"), Some("n"))
      case Some((fn, _)) =>
        measure.map(m =>
          (s"$fn(${ref(m.name)}) AS ${fn.toLowerCase}_${m.name}",
            s"${fn.toLowerCase}_${m.name}")) match {
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
          s" GROUP BY ${ref(g.name)}$order")
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
