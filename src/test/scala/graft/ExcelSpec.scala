package graft

import org.apache.spark.sql.types._
import graft.sources.ExcelSource

/** Excel source (S1) against the reference's own fixture
  * (`/root/reference/loan.xlsx`, FIXTURES.md §A): 1 sheet `Data`,
  * 1,000 rows × 16 columns, inline/shared-string xlsx. */
class ExcelSpec extends SparkTestBase {

  lazy val sheets: Map[String, org.apache.spark.sql.DataFrame] =
    ExcelSource.readXlsx(spark, "/root/reference/loan.xlsx")

  test("reads the Data sheet with 1000 rows x 16 cleaned columns") {
    assert(sheets.keySet == Set("Data"))
    val df = sheets("Data")
    assert(df.count() == 1000)
    assert(df.columns.length == 16)
    assert(df.columns.contains("loan_application_id"))
    assert(df.columns.contains("applicant_name"))
    assert(df.columns.contains("application_date"))
  }

  test("type inference matches the pandas-written parquet types") {
    val sch = sheets("Data").schema
    assert(sch("credit_score").dataType == LongType)
    assert(sch("loan_term").dataType == LongType)
    assert(sch("loan_amount_requested").dataType == DoubleType)
    assert(sch("interest_rate").dataType == DoubleType)
    assert(sch("loan_application_id").dataType == StringType)
    assert(sch("application_date").dataType == StringType) // ISO date-as-string
  }

  test("nullable columns carry nulls; key column is unique") {
    val df = sheets("Data")
    assert(df.filter(df("collateral").isNull).count() > 0)
    assert(df.select("loan_application_id").distinct().count() == 1000)
  }
}
