package graft

import graft.ops.CatalogOps
import graft.planner.PlannerHooks
import graft.planner.PlannerHooks._

/** Catalog profiling + deterministic planner hook specs. */
class CatalogPlannerSpec extends SparkTestBase {

  lazy val catalog: Seq[CatalogOps.TableEntry] =
    Seq("customer", "orders", "nation").map(CatalogOps.profileTable(spark, sf, _))

  test("profileTable computes row counts and per-column stats in one pass") {
    val nation = catalog.find(_.logicalName == "nation").get
    assert(nation.rowCount == 25)
    assert(nation.columns.map(_.name) == Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(nation.columns.forall(_.nNulls == 0))
    // HLL++ sketch at rsd=0.01: deterministic, measured exact at cardinality 25
    assert(nation.columns.find(_.name == "n_nationkey").get.nDistinct == 25)
  }

  test("profile captures min/max rendered values") {
    val nation = catalog.find(_.logicalName == "nation").get
    val key = nation.columns.find(_.name == "n_nationkey").get
    assert(key.minValue.contains("0") && key.maxValue.contains("24"))
  }

  test("catalog JSON renders and parses") {
    val json = CatalogOps.buildGlobalCatalog(spark, sf, Seq("nation", "region"))
    assert(json.startsWith("[{\"table\":\"nation\""))
    // minimal well-formedness: balanced and field-complete
    assert(json.count(_ == '{') == json.count(_ == '}'))
    assert(json.contains("\"row_count\":25"))
    assert(json.contains("\"type\":\"INTEGER\""))
  }

  test("decomposer splits multi-intent questions and falls back to identity") {
    assert(ConjunctionDecomposer.decompose(
      "total sales per region; top 5 customers by balance").size == 2)
    assert(ConjunctionDecomposer.decompose("max loan amount") ==
      Seq("max loan amount"))
  }

  test("table identifier picks matching tables and a shared join key") {
    val (tables, key) = NameMatchIdentifier.identify(
      "how many orders per customer segment", catalog)
    assert(tables.toSet == Set("orders", "customer"))
    // no shared column name between orders and customer in this schema
    assert(key.isEmpty)
    val (all, _) = NameMatchIdentifier.identify("tell me something", catalog)
    assert(all.toSet == catalog.map(_.logicalName).toSet) // '*' fallback
  }

  test("intent router mirrors the reference rules with SQL fallback") {
    assert(KeywordRouter.route("total revenue per month") == SqlQuery)
    assert(KeywordRouter.route("documents similar to this complaint") == SemanticSearch)
    assert(KeywordRouter.route("weather on mars") == SqlQuery) // fallback
  }
}
