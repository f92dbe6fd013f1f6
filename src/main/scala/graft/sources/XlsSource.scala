package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/** Legacy Excel (.xls, BIFF8-in-OLE2) source without external dependencies —
  * closes the one format gap vs the reference's pandas ingestion
  * (`ingestion_pipeline_langgraph.py:164` accepts `.xls` via xlrd): a
  * 97-2003 workbook is a Compound File Binary (CFB/OLE2) container holding a
  * `Workbook` stream of BIFF8 records. Both layers are parsed here from the
  * public [MS-CFB] and [MS-XLS] layouts:
  *
  *  - CFB: 512-byte header → DIFAT → FAT → directory; streams smaller than
  *    the mini cutoff (4096) live in the root entry's mini stream addressed
  *    through the mini FAT.
  *  - BIFF8: (id, length, payload) records. Globals substream: SST shared
  *    strings (with CONTINUE splits that re-declare the compression flag
  *    mid-string), BOUNDSHEET offsets in workbook order, FORMAT/XF for
  *    date-styled cells, DATEMODE for the 1904 epoch. Sheet substreams:
  *    LABELSST / NUMBER / RK / MULRK / FORMULA (cached result, string via a
  *    trailing STRING record) / BOOLERR / LABEL cells.
  *
  * Parsing happens on the driver like the xlsx path (operator-provided
  * workbooks are small); the frame build + type inference is shared with
  * `ExcelSource.sheetToFrame`, so `.xls` and `.xlsx` of the same sheet infer
  * identical schemas.
  */
object XlsSource {

  private val Ole2Magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    .map(_.toByte)

  def isOle2(path: String): Boolean = {
    val in = new java.io.FileInputStream(path)
    try {
      val head = new Array[Byte](8)
      in.read(head) == 8 && java.util.Arrays.equals(head, Ole2Magic)
    } finally in.close()
  }

  /** All non-empty worksheets in WORKBOOK ORDER (the same contract as
    * `ExcelSource.readXlsx`): (sheet name, typed DataFrame). */
  def readXls(spark: SparkSession, path: String): Seq[(String, DataFrame)] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    if (bytes.length < 512 || !java.util.Arrays.equals(bytes.take(8), Ole2Magic))
      sys.error(s"$path is not an OLE2 compound file (.xls) — magic mismatch")
    val cfb = new Cfb(bytes)
    val wb = cfb.stream("Workbook").orElse(cfb.stream("Book"))
      .getOrElse(sys.error(s"$path has no Workbook/Book stream — not an Excel file"))
    val g = parseGlobals(wb)
    g.sheets.collect { case (name, offset) =>
      val rows = parseSheet(wb, offset, g)
      ExcelSource.sheetToFrame(spark, rows).map(name -> _)
    }.flatten
  }

  // ---- CFB (OLE2 compound file) layer ----

  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF

  private final class Cfb(bytes: Array[Byte]) {
    private def u16(off: Int) =
      ((bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8))
    private def i32(off: Int) = ByteBuffer.wrap(bytes, off, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    private def i64(off: Int) = ByteBuffer.wrap(bytes, off, 8)
      .order(ByteOrder.LITTLE_ENDIAN).getLong

    private val sectorSize = 1 << u16(30)
    private val miniSize = 1 << u16(32)
    private val miniCutoff = i32(56)
    private def sectorOff(sec: Int) = (sec + 1) * sectorSize

    // DIFAT: 109 header entries + chained DIFAT sectors, listing FAT sectors
    private val fatSectors: Seq[Int] = {
      val head = (0 until 109).map(i => i32(76 + 4 * i)).filter(_ != FreeSect)
      val chained = mutable.ArrayBuffer.empty[Int]
      var difat = i32(68)
      val perSector = sectorSize / 4 - 1
      var hops = 0
      while (difat != EndOfChain && difat != FreeSect) {
        hops += 1
        val off = sectorOff(difat)
        if (hops > bytes.length / sectorSize || off < 0 ||
          off + sectorSize > bytes.length)
          sys.error("cyclic or corrupt DIFAT chain — not a valid compound file")
        chained ++= (0 until perSector).map(i => i32(off + 4 * i))
          .filter(_ != FreeSect)
        difat = i32(off + 4 * perSector)
      }
      head ++ chained
    }

    private val fat: Array[Int] = {
      val out = Array.newBuilder[Int]
      fatSectors.foreach { sec =>
        val off = sectorOff(sec)
        if (off < 0 || off + sectorSize > bytes.length)
          sys.error("FAT sector extends past end of file — truncated compound file")
        (0 until sectorSize / 4).foreach(i => out += i32(off + 4 * i))
      }
      out.result()
    }

    /** Concatenate a FAT sector chain, truncated to `size`. A chain longer
      * than the FAT itself must contain a cycle — fail instead of spinning
      * until OOM on a corrupt file. Sector ids and the sector body are
      * bounds-checked so a truncated/corrupt file fails with a diagnosis,
      * not a raw ArrayIndexOutOfBoundsException. */
    private def chain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var sec = start
      var hops = 0
      while (sec != EndOfChain && sec >= 0 && out.size < size) {
        hops += 1
        if (hops > fat.length || sec >= fat.length)
          sys.error("cyclic or corrupt FAT sector chain — not a valid compound file")
        val off = sectorOff(sec)
        if (off < 0 || off + sectorSize > bytes.length)
          sys.error("sector extends past end of file — truncated compound file")
        out.write(bytes, off, sectorSize)
        sec = fat(sec)
      }
      out.toByteArray.take(math.min(size, out.size.toLong).toInt)
    }

    private case class DirEntry(name: String, objType: Int, startSec: Int, size: Long)

    private val dirEntries: Seq[DirEntry] = {
      val dir = chain(i32(48), Long.MaxValue)
      (0 until dir.length / 128).map { i =>
        val off = i * 128
        val nameLen = ((dir(off + 64) & 0xFF) | ((dir(off + 65) & 0xFF) << 8))
        val name = new String(dir, off, math.max(0, nameLen - 2), "UTF-16LE")
        DirEntry(name, dir(off + 66) & 0xFF,
          ByteBuffer.wrap(dir, off + 116, 4).order(ByteOrder.LITTLE_ENDIAN).getInt,
          ByteBuffer.wrap(dir, off + 120, 8).order(ByteOrder.LITTLE_ENDIAN).getLong)
      }
    }

    // mini FAT + the root entry's mini stream, for streams under the cutoff
    private lazy val miniFat: Array[Int] = {
      val mf = chain(i32(60), i32(64).toLong * sectorSize)
      Array.tabulate(mf.length / 4)(i =>
        ByteBuffer.wrap(mf, 4 * i, 4).order(ByteOrder.LITTLE_ENDIAN).getInt)
    }
    private lazy val miniStream: Array[Byte] = {
      val root = dirEntries.find(_.objType == 5)
        .getOrElse(sys.error("compound file has no root directory entry"))
      chain(root.startSec, root.size)
    }

    def stream(name: String): Option[Array[Byte]] =
      dirEntries.find(e => e.objType == 2 && e.name == name).map { e =>
        if (e.size >= miniCutoff) chain(e.startSec, e.size)
        else {
          val out = new java.io.ByteArrayOutputStream()
          var sec = e.startSec
          var hops = 0
          while (sec != EndOfChain && sec >= 0 && out.size < e.size) {
            hops += 1
            if (hops > miniFat.length || sec >= miniFat.length)
              sys.error("cyclic or corrupt mini-FAT chain — not a valid compound file")
            if (sec.toLong * miniSize + miniSize > miniStream.length)
              sys.error("mini sector extends past the mini stream — truncated compound file")
            out.write(miniStream, sec * miniSize, miniSize)
            sec = miniFat(sec)
          }
          out.toByteArray.take(e.size.toInt)
        }
      }
  }

  // ---- BIFF8 record layer ----

  private object Rec {
    val BOF = 0x0809; val EOF = 0x000A; val BOUNDSHEET = 0x0085
    val SST = 0x00FC; val CONTINUE = 0x003C; val FORMAT = 0x041E
    val XF = 0x00E0; val DATEMODE = 0x0022
    val LABELSST = 0x00FD; val NUMBER = 0x0203; val RK = 0x027E
    val MULRK = 0x00BD; val BOOLERR = 0x0205; val FORMULA = 0x0006
    val STRING = 0x0207; val LABEL = 0x0204; val RSTRING = 0x00D6
  }

  // every fixed-offset read is bounds-checked: record LENGTHS come from the
  // (possibly corrupt) file itself, so a short payload must fail with a
  // diagnosis, not a raw IndexOutOfBoundsException (XlsFuzzSpec hammers this)
  private def truncated(what: String): Nothing =
    sys.error(s"truncated or corrupt $what — not a valid BIFF8 workbook")
  private def u16(b: Array[Byte], off: Int) = {
    if (off < 0 || off + 2 > b.length) truncated("BIFF record")
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  }
  private def i32of(b: Array[Byte], off: Int) = {
    if (off < 0 || off + 4 > b.length) truncated("BIFF record")
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
  }
  private def f64of(b: Array[Byte], off: Int) = {
    if (off < 0 || off + 8 > b.length) truncated("BIFF record")
    ByteBuffer.wrap(b, off, 8).order(ByteOrder.LITTLE_ENDIAN).getDouble
  }

  /** Iterate (id, payload, offsetOfNextRecord) from `from`; stops at the
    * substream's EOF record or the end of data. */
  private def records(data: Array[Byte], from: Int): Iterator[(Int, Array[Byte], Int)] =
    new Iterator[(Int, Array[Byte], Int)] {
      private var pos = from
      private var done = false
      def hasNext: Boolean = !done && pos + 4 <= data.length
      def next(): (Int, Array[Byte], Int) = {
        val id = u16(data, pos)
        val len = u16(data, pos + 2)
        val payload = java.util.Arrays.copyOfRange(data, pos + 4, pos + 4 + len)
        pos += 4 + len
        if (id == Rec.EOF) done = true
        (id, payload, pos)
      }
    }

  /** Cursor over a record's payload plus its CONTINUE payloads. BIFF
    * strings may split at any CHARACTER boundary into the next CONTINUE,
    * where a fresh option byte re-declares whether the remaining characters
    * are compressed — the part naive readers get wrong. */
  private final class Blocks(blocks: IndexedSeq[Array[Byte]]) {
    private var bi = 0
    private var off = 0
    private def ensure(): Unit =
      while (bi < blocks.length && off >= blocks(bi).length) { bi += 1; off = 0 }
    def atEnd: Boolean = { ensure(); bi >= blocks.length }
    def u8(): Int = {
      ensure()
      // a corrupt string/entry COUNT walks the cursor off the data
      if (bi >= blocks.length) truncated("SST/CONTINUE string data")
      val v = blocks(bi)(off) & 0xFF; off += 1; v
    }
    def u16v(): Int = u8() | (u8() << 8)
    def i32v(): Int = u16v() | (u16v() << 16)
    def skip(n: Int): Unit = (0 until n).foreach(_ => u8())

    /** Read `cch` characters, starting compressed or not per `flags` bit 0;
      * whenever character data resumes in a later block (including when the
      * string's HEADER ended exactly at a block boundary), the continuation
      * leads with a fresh option byte that resets the width for the
      * remaining characters. Splits only occur at character boundaries. */
    def chars(cch: Int, highByte: Boolean): String = {
      val sb = new StringBuilder(cch)
      var wide = highByte
      var lastBi = bi // the block the header was read in
      var read = 0
      while (read < cch) {
        ensure()
        if (bi != lastBi) { wide = (u8() & 1) != 0; lastBi = bi }
        val c = if (wide) (u8() | (u8() << 8)).toChar else u8().toChar
        sb.append(c)
        read += 1
      }
      sb.toString
    }

    /** XLUnicodeRichExtendedString (the SST entry layout). */
    def richString(): String = {
      val cch = u16v()
      val flags = u8()
      val cRun = if ((flags & 8) != 0) u16v() else 0
      val cbExt = if ((flags & 4) != 0) i32v() else 0
      val s = chars(cch, (flags & 1) != 0)
      skip(4 * cRun + cbExt)
      s
    }
  }

  /** XLUnicodeString with a 16-bit length (STRING / FORMAT / RSTRING
    * records). Reads are clamped to the record payload, so a truncated or
    * corrupt record yields a short string instead of an out-of-bounds
    * throw mid-workbook. */
  private def unicodeString16(b: Array[Byte], off: Int): String = {
    val cch = u16(b, off)
    if (off + 3 > b.length) truncated("BIFF string record")
    val flags = b(off + 2) & 0xFF
    val avail = b.length - off - 3
    if ((flags & 1) != 0)
      new String(b, off + 3, math.max(0, math.min(2 * cch, avail & ~1)), "UTF-16LE")
    else new String(b.slice(off + 3, off + 3 + math.min(cch, avail))
      .map(x => (x & 0xFF).toChar))
  }

  private case class Globals(sst: IndexedSeq[String],
      sheets: Seq[(String, Int)], dateXfs: Set[Int], date1904: Boolean)

  private def parseGlobals(wb: Array[Byte]): Globals = {
    val sst = mutable.ArrayBuffer.empty[String]
    val sheets = mutable.ArrayBuffer.empty[(String, Int)]
    val customDateFmts = mutable.Set.empty[Int]
    val xfFmts = mutable.ArrayBuffer.empty[Int]
    var date1904 = false
    val it = records(wb, 0).buffered
    // pre-BIFF8 workbooks (Excel 5.0/95, BOF version 0x0500) use byte
    // strings and no SST — parsing them with BIFF8 layouts would return
    // GARBAGE cells, not an error, so reject them loudly up front
    if (it.hasNext && it.head._1 == Rec.BOF && it.head._2.length >= 2) {
      val vers = u16(it.head._2, 0)
      if (vers != 0x0600)
        sys.error(f"BIFF version 0x$vers%04x workbook (Excel 5.0/95?) is not " +
          "supported — re-save as 97-2003 .xls or .xlsx")
    }
    while (it.hasNext) {
      val (id, p, _) = it.next()
      id match {
        case Rec.DATEMODE => date1904 = u16(p, 0) == 1
        case Rec.FORMAT =>
          val fmtId = u16(p, 0)
          if (ExcelSource.isDateFormatCode(unicodeString16(p, 2)))
            customDateFmts += fmtId
        case Rec.XF => xfFmts += u16(p, 2)
        case Rec.BOUNDSHEET =>
          if (p.length < 8) truncated("BOUNDSHEET record")
          val pos = i32of(p, 0)
          val sheetType = p(5) & 0xFF
          val cch = p(6) & 0xFF
          val wide = (p(7) & 1) != 0
          if (p.length < 8 + (if (wide) 2 * cch else cch))
            truncated("BOUNDSHEET record")
          val name = if (wide) new String(p, 8, 2 * cch, "UTF-16LE")
            else new String(p.slice(8, 8 + cch).map(x => (x & 0xFF).toChar))
          if (sheetType == 0) sheets += ((name, pos)) // worksheets only
        case Rec.SST =>
          val blocks = mutable.ArrayBuffer(p)
          while (it.hasNext && it.head._1 == Rec.CONTINUE)
            blocks += it.next()._2
          val cur = new Blocks(blocks.toIndexedSeq)
          cur.skip(4) // total refs
          val unique = cur.i32v()
          (0 until unique).foreach(_ => sst += cur.richString())
        case _ =>
      }
    }
    val dateXfs = xfFmts.zipWithIndex.collect {
      case (fmt, i) if ExcelSource.builtinDateFormats(fmt) || customDateFmts(fmt) => i
    }.toSet
    Globals(sst.toIndexedSeq, sheets.toSeq, dateXfs, date1904)
  }

  /** Numeric cell → the text the xlsx path would carry: date-styled serials
    * become ISO strings, whole doubles lose the trailing ".0". */
  private def numText(v: Double, xf: Int, g: Globals): String =
    if (g.dateXfs(xf))
      ExcelSource.serialToIso(v.toString, g.date1904).getOrElse(v.toString)
    else if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  /** [MS-XLS] RkNumber: 30-bit payload + integer and ×0.01 flags. */
  private def rkValue(rk: Int): Double = {
    val base = if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) base / 100.0 else base
  }

  private def parseSheet(wb: Array[Byte], offset: Int,
      g: Globals): IndexedSeq[IndexedSeq[Option[String]]] = {
    val cells = mutable.Map.empty[(Int, Int), String]
    var maxRow = -1
    var maxCol = -1
    def put(row: Int, col: Int, v: String): Unit = if (v.nonEmpty) {
      // BIFF8 caps worksheets at 256 columns; a bigger index only occurs in
      // corrupt files and would inflate the dense result grid 256-fold
      if (col > 255) truncated("cell record (column index)")
      cells((row, col)) = v
      maxRow = math.max(maxRow, row)
      maxCol = math.max(maxCol, col)
    }
    val it = records(wb, offset).buffered
    while (it.hasNext) {
      val (id, p, _) = it.next()
      id match {
        case Rec.LABELSST =>
          put(u16(p, 0), u16(p, 2), g.sst.lift(i32of(p, 6)).getOrElse(""))
        case Rec.NUMBER =>
          put(u16(p, 0), u16(p, 2), numText(f64of(p, 6), u16(p, 4), g))
        case Rec.RK =>
          put(u16(p, 0), u16(p, 2), numText(rkValue(i32of(p, 6)), u16(p, 4), g))
        case Rec.MULRK =>
          val row = u16(p, 0)
          val colFirst = u16(p, 2)
          val n = (p.length - 6) / 6
          (0 until n).foreach { i =>
            put(row, colFirst + i,
              numText(rkValue(i32of(p, 6 + 6 * i)), u16(p, 4 + 6 * i), g))
          }
        case Rec.BOOLERR =>
          if (p.length < 8) truncated("BOOLERR record")
          if ((p(7) & 0xFF) == 0) // errors are skipped like blank cells
            put(u16(p, 0), u16(p, 2), if (p(6) != 0) "true" else "false")
        case Rec.LABEL | Rec.RSTRING => // RSTRING = LABEL + trailing runs
          put(u16(p, 0), u16(p, 2), unicodeString16(p, 6))
        case Rec.FORMULA =>
          val row = u16(p, 0); val col = u16(p, 2); val xf = u16(p, 4)
          if (u16(p, 12) == 0xFFFF) (p(6) & 0xFF) match {
            case 0 =>
              // the cached string follows in a STRING record, possibly
              // after a SHRFMLA (0x04BC) / ARRAY (0x0221) companion record
              while (it.hasNext && (it.head._1 == 0x04BC || it.head._1 == 0x0221))
                it.next()
              if (it.hasNext && it.head._1 == Rec.STRING)
                put(row, col, unicodeString16(it.next()._2, 0))
            case 1 => put(row, col, if (p(8) != 0) "true" else "false")
            case _ => // cached error or empty: blank
          } else put(row, col, numText(f64of(p, 6), xf, g))
        case _ =>
      }
    }
    (0 to maxRow).map(r => (0 to maxCol).map(c => cells.get((r, c))))
  }
}
