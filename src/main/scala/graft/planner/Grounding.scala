package graft.planner

import graft.ops.CatalogOps.TableEntry

/** The semantic→SQL grounding loop — the deterministic rebuild of the
  * reference's signature RAG move (`langgraph_pipeline.py:429-437`): when a
  * question routes to SEMANTIC_SEARCH, the retrieved chunks are not the
  * answer — they are CONTEXT for SQL generation. The reference's prompt
  * tells its LLM to "identify exact column values (names, IDs, categories)"
  * in the retrieved chunks, "handle potential typos or variations in user
  * input", and "apply EXACT values from semantic context in WHERE clauses"
  * (case-sensitive). Retrieval hits also NARROW the target tables before
  * SQL-gen (`langgraph_pipeline.py:377-397` reloads the parquet context
  * from the hit files).
  *
  * This module is the deterministic core of that loop: given the top-k hit
  * chunks (already scored by the production cosine path), it parses the
  * chunk text back into column/value pairs (the chunker's own row
  * serialization, `IngestionPipeline.chunkTable`: `[index N] col:value |
  * col:value`), and fuzzy-aligns question tokens against the exact values —
  * a misspelled or mis-cased user string becomes a case-exact equality
  * predicate for the SQL generator. Everything is driver-side arithmetic
  * over ≤ k chunks of text — bounded by the retrieval k, never data-sized.
  */
object Grounding {

  /** One retrieved chunk, in rank order (score desc, chunk_id asc). */
  case class Hit(chunkId: Long, scoreE6: Long, text: String)

  /** A grounded equality: `column = 'value'` with the value's EXACT case
    * from the data, plus the question substring it replaces and the
    * best-ranked evidence chunk it was extracted from. */
  case class GroundedEq(column: String, value: String, matchedText: String,
      chunkId: Long, scoreE6: Long)

  /** Grammar/connector vocabulary that must never be mistaken for a data
    * value (the TemplateSqlGenerator surface plus common fillers). */
  private val stopWords: Set[String] = Set(
    "how", "many", "count", "total", "sum", "average", "avg", "mean",
    "max", "maximum", "highest", "min", "minimum", "lowest",
    "per", "by", "each", "top", "sorted", "ordered", "order",
    "ascending", "descending", "asc", "desc",
    "is", "are", "equals", "over", "above", "under", "below", "at",
    "least", "most", "between", "and", "or", "not", "null", "missing",
    "empty", "blank", "after", "since", "from", "before", "until",
    "through", "named", "called", "like", "about", "similar", "related",
    "mentioning", "roughly", "something", "show", "me", "records", "rows",
    "row", "where", "for", "with", "in", "of", "the", "a", "an", "all",
    "list", "give", "find", "what", "which", "who", "that", "these",
    "those", "their", "them")

  /** Optimal-string-alignment distance (Damerau–Levenshtein with adjacent
    * transposition as ONE edit): user typos are dominated by swapped
    * neighbors ("jhon"), which plain Levenshtein charges 2 for. */
  private[graft] def editDistance(a: String, b: String): Int = {
    val d = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 0 to a.length) d(i)(0) = i
    for (j <- 0 to b.length) d(0)(j) = j
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
      if (i > 1 && j > 1 && a(i - 1) == b(j - 2) && a(i - 2) == b(j - 1))
        d(i)(j) = math.min(d(i)(j), d(i - 2)(j - 2) + 1)
    }
    d(a.length)(b.length)
  }

  /** Typo budget: short values tolerate one edit, length-6+ values two —
    * below that an edit-2 match on a 4-char value aliases half the
    * dictionary ("cars" ~ "care" ~ "cart"). */
  private def budget(value: String): Int = if (value.length >= 6) 2 else 1

  /** Parse one chunk's text back into (column, value) pairs. Lines are the
    * chunker's serialization `[index N] col:value | col:value | …`; values
    * longer than 3 words or 32 chars are not equality-predicate material
    * (free-text columns) and are dropped. */
  private[graft] def parseChunkValues(text: String): Seq[(String, String)] =
    text.split("\n").toSeq.flatMap { line =>
      val body = line.indexOf("] ") match {
        case -1 => line
        case i => line.substring(i + 2)
      }
      body.split(" \\| ").toSeq.flatMap { cell =>
        cell.split(":", 2) match {
          case Array(c, v)
            if v.trim.nonEmpty && v.trim != "NULL" && v.trim.length <= 32 &&
              v.trim.split("\\s+").length <= 3 =>
            Some((c.trim, v.trim))
          case _ => None
        }
      }
    }

  /** Align question tokens against exact values from the hit chunks.
    *
    * Deterministic resolution: candidate values are taken in hit-rank
    * order (first = best-scoring chunk that carries the value); question
    * windows are scanned longest-first then leftmost; each window grounds
    * to the candidate with the minimum edit distance (ties → better hit
    * rank, then column name, then value); a grounded window consumes its
    * tokens, and each column grounds at most once. Windows containing
    * grammar keywords, numbers, column-name parts, or table names never
    * ground — they are the question's structure, not its values. */
  def ground(question: String, hits: Seq[Hit],
      catalog: Seq[TableEntry]): Seq[GroundedEq] = {
    val stringCols: Set[String] = catalog.flatMap(_.columns)
      .filter(c => c.dataType.toUpperCase.contains("VARCHAR") ||
        c.dataType.toUpperCase.contains("STRING") ||
        c.dataType.toUpperCase.contains("CHAR"))
      .map(_.name).toSet
    val structureTokens: Set[String] = (
      catalog.flatMap(e => Seq(e.logicalName, e.logicalName.stripSuffix("s"),
        e.logicalName + "s")) ++
        catalog.flatMap(_.columns).flatMap(c =>
          c.name.toLowerCase +: c.name.toLowerCase.split("_").toSeq)
      ).map(_.toLowerCase).toSet
    // a word ONE edit away from a table/column token is the question's
    // structure with a typo (or an unlisted plural), not a data value —
    // without this, "nations" (d=2 from NATION_0, inside the typo budget)
    // would ground to an arbitrary name and consume the column slot
    def nearStructure(w: String): Boolean =
      structureTokens.exists(t => editDistance(w, t) <= 1)
    // candidate values, best hit first, one entry per (col, value)
    val seen = scala.collection.mutable.Set.empty[(String, String)]
    val candidates: Vector[(String, String, Hit, Int)] =
      hits.zipWithIndex.toVector.flatMap { case (h, rank) =>
        parseChunkValues(h.text).collect {
          case (c, v) if stringCols(c) && seen.add((c, v)) => (c, v, h, rank)
        }
      }
    if (candidates.isEmpty) return Nil
    // raw tokens with their spans, so matchedText is the question's own text
    val tokRe = "[A-Za-z0-9_']+".r
    val toks = tokRe.findAllMatchIn(question).toVector
    val consumed = scala.collection.mutable.Set.empty[Int]
    val groundedCols = scala.collection.mutable.Set.empty[String]
    val out = Vector.newBuilder[GroundedEq]
    for (win <- 3 to 1 by -1; start <- 0 to toks.length - win) {
      val idxs = start until (start + win)
      val words = idxs.map(i => toks(i).matched.toLowerCase)
      val eligible = idxs.forall(i => !consumed(i)) &&
        words.forall(w => !stopWords(w) && !nearStructure(w) &&
          !w.forall(_.isDigit))
      if (eligible) {
        val windowText = words.mkString(" ")
        val best = candidates.iterator
          .filter { case (c, v, _, _) =>
            !groundedCols(c) && v.split("\\s+").length == win &&
              editDistance(windowText, v.toLowerCase) <= budget(v)
          }
          .map { case (c, v, h, rank) =>
            (editDistance(windowText, v.toLowerCase), rank, c, v, h)
          }
          .toVector.sortBy(t => (t._1, t._2, t._3, t._4)).headOption
        best.foreach { case (_, _, c, v, h) =>
          idxs.foreach(consumed.add)
          groundedCols.add(c)
          out += GroundedEq(c, v,
            question.substring(toks(start).start, toks(start + win - 1).end),
            h.chunkId, h.scoreE6)
        }
      }
    }
    out.result()
  }
}
