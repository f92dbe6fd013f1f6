package graft

import graft.sources.{ExcelSource, XlsSource}

/** BIFF8/.xls source specs. The fixture workbook is constructed byte-for-byte
  * here (a minimal CFB container + BIFF8 record writer), which exercises the
  * exact [MS-CFB]/[MS-XLS] layouts the reader implements: FAT chains,
  * directory entries, SST with a CONTINUE split that flips the character
  * width mid-string, RK/MULRK compressed numbers, cached FORMULA results,
  * date-styled serials (builtin and custom formats), and the 1904 epoch. */
class XlsSpec extends SparkTestBase {

  import XlsFixtures._

  test("reads a BIFF8 .xls: sheets in order, all cell record types, typed columns") {
    val path = writeXls(cfb(buildWorkbook()), "fixture.xls")
    val sheets = XlsSource.readXls(spark, path)
    assert(sheets.map(_._1) == Seq("alpha", "beta"))

    val alpha = sheets.head._2.orderBy("id")
    assert(alpha.columns.toSeq == Seq("id", "name", "score", "flag", "when"))
    val schema = alpha.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("id") == "double")     // RK ints + x100 RK 2.5
    assert(schema("score") == "double")  // NUMBER, cached FORMULA, MULRK
    assert(schema("flag") == "boolean")  // BOOLERR cells
    assert(schema("when") == "string")   // ISO dates + an inline LABEL

    val rows = alpha.collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(1.0, 2.5, 3.0, 4.0))
    assert(rows.map(_.getString(1)).toSeq == Seq("ann", "héllo", "calc", "5"))
    assert(rows.map(r => Option(r.get(2)).map(_.asInstanceOf[Double])).toSeq ==
      Seq(Some(1.5), Some(7.25), None, Some(6.0)))
    assert(rows.map(r => Option(r.get(3)).map(_.asInstanceOf[Boolean])).toSeq ==
      Seq(Some(true), Some(false), None, Some(true)))
    // serial 45000 styled with builtin fmt 14 AND serial 45001 with the
    // custom "yyyy\-mm" format both render as ISO dates (1900 system)
    val d0 = java.time.LocalDate.of(1899, 12, 30)
    assert(rows.map(r => Option(r.getString(4))).toSeq == Seq(
      Some(d0.plusDays(45000).toString), Some(d0.plusDays(45001).toString),
      None, Some("inline")))

    // the CONTINUE-split SST string: "ab" compressed + "€Ω" wide
    val beta = sheets(1)._2
    assert(beta.columns.toSeq == Seq("id", "name"))
    assert(beta.head.getString(1) == "ab€Ω")
  }

  test("DATEMODE 1904 workbooks date from the 1904 epoch") {
    val path = writeXls(cfb(buildWorkbook(v1904 = true)), "fixture1904.xls")
    val alpha = XlsSource.readXls(spark, path).head._2
    val want = java.time.LocalDate.of(1904, 1, 1).plusDays(45000).toString
    assert(alpha.orderBy("id").head.getString(4) == want)
  }

  test("readXlsx sniffs OLE2 content and delegates (mislabeled extension)") {
    val path = writeXls(cfb(buildWorkbook()), "mislabeled.xlsx")
    val sheets = ExcelSource.readXlsx(spark, path)
    assert(sheets.map(_._1) == Seq("alpha", "beta"))
  }

  test("readAny dispatches .xls to the first non-empty sheet") {
    val path = writeXls(cfb(buildWorkbook()), "dispatch.xls")
    val df = graft.ops.IngestOps.readAny(spark, path)
    assert(df.columns.toSeq == Seq("id", "name", "score", "flag", "when"))
    assert(df.count() == 4)
  }

  test("ingestion pipeline converts a .xls end-to-end: parquet, catalog, collections") {
    val path = writeXls(cfb(buildWorkbook()), "pipeline_fixture.xls")
    val out = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "xls_pipe").toString
    val res = graft.pipeline.IngestionPipeline.run(spark, Seq(path), out)
    assert(res.files.map(_.table).toSet ==
      Set("pipeline_fixture_alpha", "pipeline_fixture_beta"))
    val alpha = spark.read.parquet(
      res.files.find(_.table.endsWith("alpha")).get.parquetPath)
    assert(alpha.count() == 4)
    assert(alpha.schema("flag").dataType.simpleString == "boolean")
    assert(res.catalogJson.contains("pipeline_fixture_alpha"))
  }

  test("a non-workbook OLE2 file and a non-OLE2 file both fail actionably") {
    val junk = writeXls("not an office file at all".getBytes, "junk.xls")
    val e1 = intercept[RuntimeException](XlsSource.readXls(spark, junk))
    assert(e1.getMessage.contains("magic mismatch"))
    val noWb = cfb(bof(0x05) ++ eof)
    val p2 = writeXls(noWb, "nowb.xls")
    // rename the stream by corrupting the directory name so lookup fails
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p2))
    val dirOff = 512 + 512 + 128 // sector 1 + one entry in
    "Xxxxxxxx".getBytes("UTF-16LE").zipWithIndex.foreach { case (b, i) =>
      bytes(dirOff + i) = b
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(p2), bytes)
    val e2 = intercept[RuntimeException](XlsSource.readXls(spark, p2))
    assert(e2.getMessage.contains("no Workbook"))
  }

  test("truncated or sector-corrupt files fail with a diagnosis, never AIOOBE") {
    val full = cfb(buildWorkbook())
    // truncation at arbitrary points: the reader must either still succeed
    // (nothing it touches was cut) or fail with an actionable message —
    // a raw ArrayIndexOutOfBoundsException's message is just a number
    for (frac <- Seq(0.55, 0.70, 0.85, 0.97)) {
      val p = writeXls(full.take((full.length * frac).toInt), s"trunc_$frac.xls")
      try { XlsSource.readXls(spark, p); () }
      catch {
        case e: RuntimeException =>
          assert(!e.isInstanceOf[IndexOutOfBoundsException], s"frac=$frac: raw $e")
          assert(e.getMessage != null && (e.getMessage.contains("truncated") ||
            e.getMessage.contains("corrupt") || e.getMessage.contains("compound") ||
            e.getMessage.contains("past end of file")), s"frac=$frac: ${e.getMessage}")
      }
    }
    // header DIFAT[0] pointing past EOF: the FAT build itself must diagnose
    val badFat = full.clone()
    i32(0x00FFFF0).copyToArray(badFat, 76)
    val e1 = intercept[RuntimeException](
      XlsSource.readXls(spark, writeXls(badFat, "badfat.xls")))
    assert(!e1.isInstanceOf[IndexOutOfBoundsException], e1.toString)
    assert(e1.getMessage.contains("past end of file"), e1.getMessage)
    // first directory sector id corrupted to an absurd value: chain() must
    // bounds-check the sector id before indexing the FAT
    val badDir = full.clone()
    i32(0x00FFFF0).copyToArray(badDir, 48)
    val e2 = intercept[RuntimeException](
      XlsSource.readXls(spark, writeXls(badDir, "baddir.xls")))
    assert(!e2.isInstanceOf[IndexOutOfBoundsException], e2.toString)
    assert(e2.getMessage.contains("corrupt") ||
      e2.getMessage.contains("past end of file"), e2.getMessage)
  }
}
