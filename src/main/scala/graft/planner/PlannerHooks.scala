package graft.planner

import graft.ops.CatalogOps.TableEntry

/** Deterministic planner hooks — the engine-side seams where the reference
  * plugs an LLM (SURVEY §2d V6–V9). Each hook is a trait with a
  * deterministic default so the pipeline runs hermetically; an LLM-backed
  * implementation can be swapped in behind the same interface without
  * touching the engine.
  *
  * Reference analogs: query decomposition (`decomposition_util.py:25-84`),
  * table identification + join key (`multi_file_util.py:34-71`), intent
  * routing (`langgraph_pipeline.py:287-349`), text-to-SQL
  * (`langgraph_pipeline.py:416-521`).
  */
object PlannerHooks {

  sealed trait Intent
  case object SqlQuery extends Intent
  case object SemanticSearch extends Intent

  /** V6: split a multi-intent question into atomic sub-queries. The
    * deterministic default splits on explicit conjunction markers, falling
    * back to the whole question (the reference's own fallback,
    * `decomposition_util.py:78-84`). */
  trait QueryDecomposer {
    def decompose(question: String): Seq[String]
  }
  object ConjunctionDecomposer extends QueryDecomposer {
    private val splitRe = "(?i)\\s*(?:;|\\band also\\b|\\bas well as\\b|\\? )\\s*".r
    def decompose(question: String): Seq[String] = {
      val parts = splitRe.split(question).map(_.trim).filter(_.nonEmpty).toSeq
      if (parts.isEmpty) Seq(question.trim) else parts
    }
  }

  /** V7: identify the tables a question needs plus a join key, from catalog
    * metadata. Deterministic default: a table matches if its name or any of
    * its column names appears as a token in the question; the join key is a
    * column shared by >= 2 matched tables (the reference's tool contract:
    * join_key "MUST be populated if two or more tables required",
    * `multi_file_util.py:8-31`). */
  trait TableIdentifier {
    def identify(question: String, catalog: Seq[TableEntry]): (Seq[String], Option[String])
  }
  object NameMatchIdentifier extends TableIdentifier {
    def identify(question: String, catalog: Seq[TableEntry]): (Seq[String], Option[String]) = {
      val toks = question.toLowerCase.split("\\W+").filter(_.nonEmpty).toSet
      val matched = catalog.filter { e =>
        toks.contains(e.logicalName.toLowerCase) ||
          toks.contains(e.logicalName.toLowerCase.stripSuffix("s")) ||
          toks.contains(e.logicalName.toLowerCase + "s") ||
          e.columns.exists(c => toks.contains(c.name.toLowerCase))
      }
      val names = matched.map(_.logicalName)
      val joinKey =
        if (matched.size < 2) None
        else matched.flatMap(_.columns.map(_.name))
          .groupBy(identity).collect { case (k, v) if v.size >= 2 => k }
          .toSeq.sorted.headOption
      (if (names.nonEmpty) names else catalog.map(_.logicalName), joinKey)
    }
  }

  /** V8: route a question to SQL vs semantic search. Deterministic default
    * mirrors the reference's router rules (`langgraph_pipeline.py:305-315`):
    * aggregation/comparison/date vocabulary → SQL_QUERY; fuzzy "like/about/
    * similar" phrasing → SEMANTIC_SEARCH; fallback SQL_QUERY
    * (`langgraph_pipeline.py:346-349`). */
  trait IntentRouter {
    def route(question: String): Intent
  }
  object KeywordRouter extends IntentRouter {
    private val sqlMarkers = Set("sum", "total", "count", "average", "avg",
      "max", "maximum", "min", "minimum", "group", "top", "highest", "lowest",
      "between", "before", "after", "per", "each")
    private val semanticMarkers = Set("like", "about", "similar", "related",
      "mentioning", "roughly", "something")
    def route(question: String): Intent = {
      val toks = question.toLowerCase.split("\\W+").toSet
      if ((toks & sqlMarkers).nonEmpty) SqlQuery
      else if ((toks & semanticMarkers).nonEmpty) SemanticSearch
      else SqlQuery
    }
  }

  /** V9: text-to-SQL seam. The engine-side equivalent is executing SQL over
    * registered temp views (`spark.sql`); generation itself is pluggable.
    *
    * `generateGrounded` is the semantic-context entry (the reference's
    * augmented SQL-gen prompt, `langgraph_pipeline.py:429-437`): grounded
    * equalities extracted from retrieval hits arrive as exact-case
    * (column, value) predicates, to be applied verbatim in WHERE clauses.
    * The default ignores them, so a plain generator keeps working. */
  trait SqlGenerator {
    def generate(question: String, catalogText: String): Option[String]
    def generateGrounded(question: String, catalogText: String,
        grounded: Seq[Grounding.GroundedEq]): Option[String] =
      generate(question, catalogText)
  }
  object NoOpSqlGenerator extends SqlGenerator {
    def generate(question: String, catalogText: String): Option[String] = None
  }
}
