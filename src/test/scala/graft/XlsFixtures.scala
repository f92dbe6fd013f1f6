package graft

/** Byte-level BIFF8/CFB fixture builders shared by XlsSpec (format
  * conformance) and XlsFuzzSpec (corruption robustness). Constructs a
  * minimal [MS-CFB] container + [MS-XLS] BIFF8 workbook byte-for-byte. */
object XlsFixtures {

  // ---- byte-level builders ----

  def u16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  def i32(v: Int) =
    Array(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xFF).toByte)
  def f64(d: Double) = {
    val l = java.lang.Double.doubleToLongBits(d)
    (0 until 8).map(i => ((l >> (8 * i)) & 0xFF).toByte).toArray
  }
  def rec(id: Int, body: Array[Byte]) = u16(id) ++ u16(body.length) ++ body
  /** XLUnicodeString with 16-bit length, compressed chars. */
  def cstr16(s: String) =
    u16(s.length) ++ Array(0.toByte) ++ s.getBytes("ISO-8859-1")
  /** SST entry, compressed or UTF-16. */
  def sstStr(s: String, wide: Boolean) =
    u16(s.length) ++ Array((if (wide) 1 else 0).toByte) ++
      (if (wide) s.getBytes("UTF-16LE") else s.getBytes("ISO-8859-1"))

  def bof(dt: Int) = rec(0x0809, u16(0x0600) ++ u16(dt) ++ new Array[Byte](12))
  val eof = rec(0x000A, Array.empty[Byte])
  def xf(fmt: Int) = rec(0x00E0, u16(0) ++ u16(fmt) ++ new Array[Byte](16))
  def labelsst(r: Int, c: Int, x: Int, i: Int) =
    rec(0x00FD, u16(r) ++ u16(c) ++ u16(x) ++ i32(i))
  def number(r: Int, c: Int, x: Int, d: Double) =
    rec(0x0203, u16(r) ++ u16(c) ++ u16(x) ++ f64(d))
  def rkInt(v: Int) = (v << 2) | 2
  def rkRec(r: Int, c: Int, x: Int, rk: Int) =
    rec(0x027E, u16(r) ++ u16(c) ++ u16(x) ++ i32(rk))
  def mulrk(r: Int, cFirst: Int, x: Int, rks: Seq[Int]) =
    rec(0x00BD, u16(r) ++ u16(cFirst) ++
      rks.toArray.flatMap(rk => u16(x) ++ i32(rk)) ++ u16(cFirst + rks.size - 1))
  def boolerr(r: Int, c: Int, x: Int, b: Boolean) =
    rec(0x0205, u16(r) ++ u16(c) ++ u16(x) ++
      Array((if (b) 1 else 0).toByte, 0.toByte))
  def formulaNum(r: Int, c: Int, x: Int, d: Double) =
    rec(0x0006, u16(r) ++ u16(c) ++ u16(x) ++ f64(d) ++ new Array[Byte](8))
  def formulaStr(r: Int, c: Int, x: Int) =
    rec(0x0006, u16(r) ++ u16(c) ++ u16(x) ++
      Array[Byte](0, 0, 0, 0, 0, 0, -1, -1) ++ new Array[Byte](8))
  def stringRec(s: String) = rec(0x0207, cstr16(s))
  def label(r: Int, c: Int, x: Int, s: String) =
    rec(0x0204, u16(r) ++ u16(c) ++ u16(x) ++ cstr16(s))
  def boundsheet(offset: Int, name: String) =
    rec(0x0085, i32(offset) ++ Array[Byte](0, 0) ++
      Array(name.length.toByte, 0.toByte) ++ name.getBytes("ISO-8859-1"))
  def format(id: Int, code: String) = rec(0x041E, u16(id) ++ cstr16(code))
  def datemode(v1904: Boolean) = rec(0x0022, u16(if (v1904) 1 else 0))

  /** Wrap a BIFF stream into a single-FAT-sector CFB file: sector 0 = FAT,
    * sector 1 = directory, sectors 2.. = the Workbook stream (padded past
    * the 4096-byte mini cutoff so it lives in regular sectors). */
  def cfb(biff: Array[Byte]): Array[Byte] = {
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
  def buildWorkbook(v1904: Boolean = false): Array[Byte] = {
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

  def writeXls(bytes: Array[Byte], name: String): String = {
    val p = java.nio.file.Paths.get("target", name)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, bytes)
    p.toString
  }

}
