package graft

import graft.sources.{ExcelSource, XlsSource}

/** BIFF8/.xls source specs. The fixture workbook is constructed byte-for-byte
  * here (a minimal CFB container + BIFF8 record writer), which exercises the
  * exact [MS-CFB]/[MS-XLS] layouts the reader implements: FAT chains,
  * directory entries, SST with a CONTINUE split that flips the character
  * width mid-string, RK/MULRK compressed numbers, cached FORMULA results,
  * date-styled serials (builtin and custom formats), and the 1904 epoch. */
class XlsSpec extends SparkTestBase {

  // ---- byte-level builders ----

  private def u16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def i32(v: Int) =
    Array(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xFF).toByte)
  private def f64(d: Double) = {
    val l = java.lang.Double.doubleToLongBits(d)
    (0 until 8).map(i => ((l >> (8 * i)) & 0xFF).toByte).toArray
  }
  private def rec(id: Int, body: Array[Byte]) = u16(id) ++ u16(body.length) ++ body
  /** XLUnicodeString with 16-bit length, compressed chars. */
  private def cstr16(s: String) =
    u16(s.length) ++ Array(0.toByte) ++ s.getBytes("ISO-8859-1")
  /** SST entry, compressed or UTF-16. */
  private def sstStr(s: String, wide: Boolean) =
    u16(s.length) ++ Array((if (wide) 1 else 0).toByte) ++
      (if (wide) s.getBytes("UTF-16LE") else s.getBytes("ISO-8859-1"))

  private def bof(dt: Int) = rec(0x0809, u16(0x0600) ++ u16(dt) ++ new Array[Byte](12))
  private val eof = rec(0x000A, Array.empty[Byte])
  private def xf(fmt: Int) = rec(0x00E0, u16(0) ++ u16(fmt) ++ new Array[Byte](16))
  private def labelsst(r: Int, c: Int, x: Int, i: Int) =
    rec(0x00FD, u16(r) ++ u16(c) ++ u16(x) ++ i32(i))
  private def number(r: Int, c: Int, x: Int, d: Double) =
    rec(0x0203, u16(r) ++ u16(c) ++ u16(x) ++ f64(d))
  private def rkInt(v: Int) = (v << 2) | 2
  private def rkRec(r: Int, c: Int, x: Int, rk: Int) =
    rec(0x027E, u16(r) ++ u16(c) ++ u16(x) ++ i32(rk))
  private def mulrk(r: Int, cFirst: Int, x: Int, rks: Seq[Int]) =
    rec(0x00BD, u16(r) ++ u16(cFirst) ++
      rks.toArray.flatMap(rk => u16(x) ++ i32(rk)) ++ u16(cFirst + rks.size - 1))
  private def boolerr(r: Int, c: Int, x: Int, b: Boolean) =
    rec(0x0205, u16(r) ++ u16(c) ++ u16(x) ++
      Array((if (b) 1 else 0).toByte, 0.toByte))
  private def formulaNum(r: Int, c: Int, x: Int, d: Double) =
    rec(0x0006, u16(r) ++ u16(c) ++ u16(x) ++ f64(d) ++ new Array[Byte](8))
  private def formulaStr(r: Int, c: Int, x: Int) =
    rec(0x0006, u16(r) ++ u16(c) ++ u16(x) ++
      Array[Byte](0, 0, 0, 0, 0, 0, -1, -1) ++ new Array[Byte](8))
  private def stringRec(s: String) = rec(0x0207, cstr16(s))
  private def label(r: Int, c: Int, x: Int, s: String) =
    rec(0x0204, u16(r) ++ u16(c) ++ u16(x) ++ cstr16(s))
  private def boundsheet(offset: Int, name: String) =
    rec(0x0085, i32(offset) ++ Array[Byte](0, 0) ++
      Array(name.length.toByte, 0.toByte) ++ name.getBytes("ISO-8859-1"))
  private def format(id: Int, code: String) = rec(0x041E, u16(id) ++ cstr16(code))
  private def datemode(v1904: Boolean) = rec(0x0022, u16(if (v1904) 1 else 0))

  /** Wrap a BIFF stream into a single-FAT-sector CFB file: sector 0 = FAT,
    * sector 1 = directory, sectors 2.. = the Workbook stream (padded past
    * the 4096-byte mini cutoff so it lives in regular sectors). */
  private def cfb(biff: Array[Byte]): Array[Byte] = {
    val padded = biff ++ new Array[Byte](
      math.max(4096, (biff.length + 511) / 512 * 512) - biff.length)
    val nStream = padded.length / 512
    def dirEntry(name: String, objType: Int, start: Int, size: Int, child: Int) = {
      val e = new Array[Byte](128)
      val n = name.getBytes("UTF-16LE")
      System.arraycopy(n, 0, e, 0, n.length)
      System.arraycopy(u16(n.length + 2), 0, e, 64, 2)
      e(66) = objType.toByte; e(67) = 1
      System.arraycopy(i32(-1), 0, e, 68, 4)
      System.arraycopy(i32(-1), 0, e, 72, 4)
      System.arraycopy(i32(child), 0, e, 76, 4)
      System.arraycopy(i32(start), 0, e, 116, 4)
      System.arraycopy(i32(size), 0, e, 120, 4)
      e
    }
    val dir = dirEntry("Root Entry", 5, -2, 0, 1) ++
      dirEntry("Workbook", 2, 2, padded.length, -1) ++ new Array[Byte](256)
    val fatEntries = Array(0xFFFFFFFD, 0xFFFFFFFE) ++
      (0 until nStream).map(i => if (i == nStream - 1) 0xFFFFFFFE else 3 + i) ++
      Array.fill(128 - 2 - nStream)(0xFFFFFFFF)
    val fat = fatEntries.flatMap(i32)
    val header = new Array[Byte](512)
    System.arraycopy(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .map(_.toByte), 0, header, 0, 8)
    System.arraycopy(u16(0x003E), 0, header, 24, 2) // minor version
    System.arraycopy(u16(0x0003), 0, header, 26, 2) // major version 3
    System.arraycopy(u16(0xFFFE), 0, header, 28, 2) // little-endian
    System.arraycopy(u16(9), 0, header, 30, 2)      // 512-byte sectors
    System.arraycopy(u16(6), 0, header, 32, 2)      // 64-byte mini sectors
    System.arraycopy(i32(1), 0, header, 44, 4)      // one FAT sector
    System.arraycopy(i32(1), 0, header, 48, 4)      // directory at sector 1
    System.arraycopy(i32(4096), 0, header, 56, 4)   // mini cutoff
    System.arraycopy(i32(-2), 0, header, 60, 4)     // no mini FAT
    System.arraycopy(i32(-2), 0, header, 68, 4)     // no DIFAT chain
    System.arraycopy(i32(0), 0, header, 76, 4)      // DIFAT[0] = FAT sector 0
    (77 until 128).foreach(i => System.arraycopy(i32(-1), 0, header, 4 * i, 4))
    header ++ fat ++ dir ++ padded
  }

  /** The main fixture: two sheets, all cell record types, a CONTINUE-split
    * SST string whose width flips at the boundary, builtin + custom date
    * formats. */
  private def buildWorkbook(v1904: Boolean = false): Array[Byte] = {
    // SST: 7 whole strings + "ab€Ω" split after "ab" (continuation is wide)
    val sstBody = i32(10) ++ i32(8) ++
      Seq("id", "name", "score", "flag", "when", "ann").map(sstStr(_, wide = false))
        .reduce(_ ++ _) ++
      sstStr("héllo", wide = true) ++
      (u16(4) ++ Array(0.toByte) ++ "ab".getBytes("ISO-8859-1"))
    val continueBody = Array(1.toByte) ++ "€Ω".getBytes("UTF-16LE")

    def globals(alphaOff: Int, betaOff: Int) =
      bof(0x05) ++ datemode(v1904) ++
        format(164, "yyyy\\-mm") ++ // custom date format
        xf(0) ++ xf(14) ++ xf(164) ++ // xf 0 general, 1 builtin date, 2 custom
        rec(0x00FC, sstBody) ++ rec(0x003C, continueBody) ++
        boundsheet(alphaOff, "alpha") ++ boundsheet(betaOff, "beta") ++ eof

    val alpha =
      bof(0x10) ++
        labelsst(0, 0, 0, 0) ++ labelsst(0, 1, 0, 1) ++ labelsst(0, 2, 0, 2) ++
        labelsst(0, 3, 0, 3) ++ labelsst(0, 4, 0, 4) ++
        rkRec(1, 0, 0, rkInt(1)) ++ labelsst(1, 1, 0, 5) ++
        number(1, 2, 0, 1.5) ++ boolerr(1, 3, 0, b = true) ++
        number(1, 4, 1, 45000.0) ++
        rkRec(2, 0, 0, rkInt(250) | 1) ++ labelsst(2, 1, 0, 6) ++
        formulaNum(2, 2, 0, 7.25) ++ boolerr(2, 3, 0, b = false) ++
        rkRec(2, 4, 2, rkInt(45001)) ++
        rkRec(3, 0, 0, rkInt(3)) ++ formulaStr(3, 1, 0) ++ stringRec("calc") ++
        mulrk(4, 0, 0, Seq(rkInt(4), rkInt(5), rkInt(6))) ++
        boolerr(4, 3, 0, b = true) ++ label(4, 4, 0, "inline") ++
        eof
    val beta =
      bof(0x10) ++
        labelsst(0, 0, 0, 0) ++ labelsst(0, 1, 0, 1) ++
        rkRec(1, 0, 0, rkInt(10)) ++ labelsst(1, 1, 0, 7) ++
        eof

    val globalsLen = globals(0, 0).length
    globals(globalsLen, globalsLen + alpha.length) ++ alpha ++ beta
  }

  private def writeXls(bytes: Array[Byte], name: String): String = {
    val p = java.nio.file.Paths.get("target", name)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, bytes)
    p.toString
  }

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
