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
    // HLL++ sketch at rsd=0.05 (r17: rsd 0.01 cost 20+ s of quadratic
    // Catalyst planning per wide table — see CatalogOps.profileTable):
    // deterministic, within the sketch's ±5% at cardinality 25
    val nd = nation.columns.find(_.name == "n_nationkey").get.nDistinct
    assert(nd >= 24 && nd <= 27, s"n_nationkey sketch out of band: $nd")
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

  test("full catalog document mirrors the reference entry shape field-for-field") {
    import spark.implicits._
    val json = CatalogOps.buildFullCatalog(spark, sf, Seq("nation", "region"),
      sessionId = "sess1234abcd")
    // structural check through a real JSON parser (Spark's), not substrings
    val doc = spark.read.option("multiLine", "true").json(Seq(json).toDS)
    assert(doc.schema.fieldNames.toSet ==
      Set("success", "session_id", "processing_summary", "failed_files", "catalog"))
    val entry = doc.selectExpr("explode(catalog) AS e").select("e.*")
    val expectFields = Set("id", "partition_key", "file_id", "filename",
      "file_type", "file_category", "file_size_bytes", "mime_type",
      "file_extension", "session_id", "user_id", "organization_id",
      "upload_timestamp", "processing_started", "processing_completed",
      "processing_status", "blob_url", "blob_container", "blob_path",
      "parquet_url", "structured_metadata", "graph_metadata",
      "content_analysis", "access_count", "last_accessed", "accessed_by",
      "is_deleted", "is_public", "is_archived", "custom_fields", "tags")
    assert(entry.schema.fieldNames.toSet == expectFields)
    val rows = entry.selectExpr("structured_metadata.table_name",
      "structured_metadata.row_count", "graph_metadata.node_count",
      "graph_metadata.graph_id", "content_analysis.summary", "tags")
      .collect()
    // idx-derived arithmetic mirrors the reference: 120 + idx*30 nodes
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("nation").getLong(1) == 25L)
    assert(byName("nation").getLong(2) == 120L && byName("region").getLong(2) == 150L)
    // filename[:10] INCLUDING the .parquet extension, as the reference does
    assert(byName("nation").getString(3) == "graph_sess1234_nation.par")
    val regionCols = spark.read.parquet(s"$sf/region.parquet").columns.length
    assert(byName("region").getString(4) ==
      s"Structured data with 5 rows and $regionCols columns")
    assert(rows.forall(_.getSeq[String](5) == Seq("structured_data")))
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
