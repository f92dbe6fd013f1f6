package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.CleanColumns

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Excel (.xlsx) source without external dependencies: xlsx is a zip of XML
  * parts, streamed here with JDK StAX. Mirrors the reference's Excel
  * ingestion semantics (`ingestion_pipeline_langgraph.py:342-402`): every
  * non-empty sheet becomes one table, column names are cleaned, types are
  * inferred. Parsing happens on the driver (workbooks are small,
  * operator-provided files — the reference caps runs at a handful of
  * workbooks, `config.py:184-193`); the resulting DataFrame is distributed
  * and inference runs as Spark jobs.
  *
  * Supported cell types: shared strings (`t="s"`), inline strings
  * (`t="inlineStr"`), formula strings (`t="str"`), booleans (`t="b"`) and
  * numbers (default). Date-STYLED numerics (a serial number whose cell
  * style carries a date number format — how Excel actually stores dates)
  * are rendered as ISO strings, like pandas does through `pd.read_excel`
  * (the reference inherits this via `duckdb_util.py:263`): `xl/styles.xml`
  * is parsed for date-formatted style indices and matching serials become
  * `yyyy-MM-dd` (or `yyyy-MM-dd HH:mm:ss` when a time fraction is present).
  */
object ExcelSource {

  /** Read all non-empty sheets in WORKBOOK ORDER: (sheet name, DataFrame)
    * with cleaned columns and inferred types. Order matters — "first
    * non-empty sheet" is a real contract downstream (`IngestOps.readAny`),
    * and a Map would scramble it past 4 entries. */
  def readXlsx(spark: SparkSession, path: String): Seq[(String, DataFrame)] = {
    // a real (OLE2 binary) workbook mislabeled .xlsx is not a zip: sniff the
    // compound-file magic and delegate to the BIFF8 reader (the reference's
    // pandas ingestion sniffs content the same way,
    // `ingestion_pipeline_langgraph.py:164`)
    val zip =
      try new ZipFile(path)
      catch {
        case e: java.util.zip.ZipException =>
          if (XlsSource.isOle2(path)) return XlsSource.readXls(spark, path)
          else sys.error(s"$path is neither an xlsx (zip) nor an OLE2 (.xls) " +
            s"workbook (${e.getMessage})")
      }
    try {
      val shared = readSharedStrings(zip)
      val dateStyles = dateStyleIndices(zip)
      val date1904 = workbookDate1904(zip)
      sheetTargets(zip).flatMap { case (name, target) =>
        val rows = readSheetRows(zip, target, shared, dateStyles, date1904)
        sheetToFrame(spark, rows.toIndexedSeq).map(name -> _)
      }
    } finally zip.close()
  }

  /** `<workbookPr date1904="1"/>` in xl/workbook.xml switches the whole
    * workbook to the 1904 serial epoch (legacy Mac origin) — without this a
    * 1904-system workbook's every date cell is silently 1,462 days off
    * (the .xls path reads the equivalent DATEMODE record). */
  private def workbookDate1904(zip: ZipFile): Boolean = {
    val entry = zip.getEntry("xl/workbook.xml")
    if (entry == null) return false
    val r = XMLInputFactory.newInstance()
      .createXMLStreamReader(zip.getInputStream(entry))
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "workbookPr") {
          val v = Option(r.getAttributeValue(null, "date1904"))
          return v.exists(x => x == "1" || x.equalsIgnoreCase("true"))
        }
      }
      false
    } finally r.close()
  }

  /** Shared sheet→DataFrame path for both workbook formats: header from the
    * first row (blank/symbol-only headers clean to "": named like pandas,
    * "Unnamed: N" → unnamed_N, so downstream SQL stays valid), an all-string
    * frame, then one-pass distributed type inference. None for header-only
    * or empty sheets. */
  private[sources] def sheetToFrame(spark: SparkSession,
      rows: IndexedSeq[IndexedSeq[Option[String]]]): Option[DataFrame] = {
    if (rows.size < 2) None
    else {
      val rawHeader = rows.head.zipWithIndex.map { case (h, i) =>
        val cleaned = CleanColumns.cleanName(h.getOrElse(""))
        if (cleaned.isEmpty) s"unnamed_$i" else h.getOrElse(s"unnamed_$i")
      }
      val header = CleanColumns.cleanColumnNames(rawHeader.toSeq)
      val width = header.size
      val data = rows.tail.map(r =>
        Row.fromSeq((0 until width).map(i => r.lift(i).flatten.orNull)))
      val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
      val raw = spark.createDataFrame(
        spark.sparkContext.parallelize(data.toSeq), schema)
      Some(inferTypes(raw))
    }
  }

  /** Distributed type inference over an all-string frame: a column becomes
    * BIGINT / DOUBLE / BOOLEAN when every non-null value casts cleanly.
    * ONE aggregation pass — all 3×N bad-cast counters run in a single job
    * (the Spark analog of pandas inference the reference relies on via
    * `pd.read_excel`). */
  def inferTypes(raw: DataFrame): DataFrame = {
    val cols = raw.columns.toSeq
    val targets = Seq("long", "double", "boolean")
    val counters = cols.flatMap(c => targets.map(to =>
      sum(when(col(c).isNotNull && try_cast_fail(col(c), to), 1L).otherwise(0L))
        .as(s"${c}__$to")))
    val row = raw.agg(counters.head, counters.tail: _*).head()
    val casted = cols.zipWithIndex.map { case (c, i) =>
      if (row.getLong(3 * i) == 0L) col(c).cast("long").as(c)
      else if (row.getLong(3 * i + 1) == 0L) col(c).cast("double").as(c)
      else if (row.getLong(3 * i + 2) == 0L) col(c).cast("boolean").as(c)
      else col(c)
    }
    raw.select(casted: _*)
  }

  /** ANSI-safe "does this string fail to cast" predicate (name is
    * backtick-quoted — cleaned headers are safe but quoting costs nothing). */
  private def try_cast_fail(c: org.apache.spark.sql.Column, to: String) =
    expr(s"try_cast(`${c.toString}` AS $to)").isNull

  // ---- xlsx part parsing (driver-side, streaming) ----

  private def readSharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val entry = zip.getEntry("xl/sharedStrings.xml")
    if (entry == null) return IndexedSeq.empty
    val rdr = XMLInputFactory.newInstance()
      .createXMLStreamReader(zip.getInputStream(entry))
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inSi = false
    while (rdr.hasNext) {
      rdr.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          if (rdr.getLocalName == "si") { inSi = true; cur.clear() }
          else if (inSi && rdr.getLocalName == "t") cur.append(rdr.getElementText)
        case XMLStreamConstants.END_ELEMENT =>
          if (rdr.getLocalName == "si") { out += cur.toString; inSi = false }
        case _ =>
      }
    }
    rdr.close()
    out.toIndexedSeq
  }

  /** workbook.xml sheet names joined to their part targets via the rels. */
  private def sheetTargets(zip: ZipFile): Seq[(String, String)] = {
    val rels = mutable.Map.empty[String, String]
    val relEntry = zip.getEntry("xl/_rels/workbook.xml.rels")
    if (relEntry != null) {
      val r = XMLInputFactory.newInstance()
        .createXMLStreamReader(zip.getInputStream(relEntry))
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship")
          rels(r.getAttributeValue(null, "Id")) =
            r.getAttributeValue(null, "Target")
      }
      r.close()
    }
    val out = mutable.ArrayBuffer.empty[(String, String)]
    val wb = XMLInputFactory.newInstance()
      .createXMLStreamReader(zip.getInputStream(zip.getEntry("xl/workbook.xml")))
    while (wb.hasNext) {
      if (wb.next() == XMLStreamConstants.START_ELEMENT && wb.getLocalName == "sheet") {
        val name = wb.getAttributeValue(null, "name")
        val rid = (0 until wb.getAttributeCount)
          .find(i => wb.getAttributeLocalName(i) == "id")
          .map(wb.getAttributeValue)
        val target = rid.flatMap(rels.get)
          .getOrElse(s"worksheets/sheet${out.size + 1}.xml")
        val full = if (target.startsWith("/")) target.drop(1)
          else if (target.startsWith("xl/")) target else s"xl/$target"
        out += ((name, full))
      }
    }
    wb.close()
    out.toSeq
  }

  /** Style indices (cellXfs positions) whose number format is a date/time
    * format: builtin numFmtIds 14-22/27-36/45-47, or a custom format code
    * containing date tokens (y/m/d/h) outside brackets and quoted text. */
  private def dateStyleIndices(zip: ZipFile): Set[Int] = {
    val entry = zip.getEntry("xl/styles.xml")
    if (entry == null) return Set.empty
    val builtinDates = ExcelSource.builtinDateFormats
    def isDateCode(code: String) = ExcelSource.isDateFormatCode(code)
    val customDates = mutable.Set.empty[Int]
    val xfFmtIds = mutable.ArrayBuffer.empty[Int]
    var inCellXfs = false
    val r = XMLInputFactory.newInstance()
      .createXMLStreamReader(zip.getInputStream(entry))
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "numFmt" =>
            val id = Option(r.getAttributeValue(null, "numFmtId")).map(_.toInt)
            val code = Option(r.getAttributeValue(null, "formatCode"))
            if (id.isDefined && code.exists(isDateCode)) customDates += id.get
          case "cellXfs" => inCellXfs = true
          case "xf" if inCellXfs =>
            xfFmtIds += Option(r.getAttributeValue(null, "numFmtId"))
              .map(_.toInt).getOrElse(0)
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
          inCellXfs = false
        case _ =>
      }
    }
    r.close()
    xfFmtIds.zipWithIndex.collect {
      case (fmt, i) if builtinDates(fmt) || customDates(fmt) => i
    }.toSet
  }

  /** Excel serial → ISO string. In the default 1900 system, serial 1 =
    * 1900-01-01 and serials ≥ 61 use the 1899-12-30 epoch (absorbing
    * Excel's phantom 1900-02-29); the 1904 system (legacy Mac workbooks,
    * BIFF DATEMODE) counts from 1904-01-01 with no leap bug. A time
    * fraction yields a full timestamp, a whole serial a plain date. */
  private[sources] def serialToIso(text: String,
      date1904: Boolean = false): Option[String] =
    text.trim.toDoubleOption.filter(d => d >= 0 && d < 2958466).map { d =>
      val days = math.floor(d).toLong
      val frac = d - days
      val base = if (date1904) java.time.LocalDate.of(1904, 1, 1)
        else if (days >= 61) java.time.LocalDate.of(1899, 12, 30)
        else java.time.LocalDate.of(1899, 12, 31)
      val date = base.plusDays(days)
      val secs = math.round(frac * 86400)
      if (secs == 0L) date.toString
      else date.atStartOfDay.plusSeconds(secs)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    }

  /** Stream one sheet's rows; each row is a dense vector of Option[String]
    * indexed by column (missing cells → None). */
  private def readSheetRows(zip: ZipFile, target: String,
      shared: IndexedSeq[String],
      dateStyles: Set[Int],
      date1904: Boolean): mutable.ArrayBuffer[Vector[Option[String]]] = {
    val rows = mutable.ArrayBuffer.empty[Vector[Option[String]]]
    val entry = zip.getEntry(target)
    if (entry == null) return rows
    val r = XMLInputFactory.newInstance()
      .createXMLStreamReader(zip.getInputStream(entry))
    var row = mutable.ArrayBuffer.empty[Option[String]]
    var cellCol = 0
    var cellType = ""
    var cellStyle = -1
    var cellValue: Option[String] = None
    var inValue = false
    var inInline = false
    val text = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => row = mutable.ArrayBuffer.empty
          case "c" =>
            cellCol = colIndex(Option(r.getAttributeValue(null, "r")), row.size)
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
            cellStyle = Option(r.getAttributeValue(null, "s"))
              .flatMap(_.toIntOption).getOrElse(-1)
            cellValue = None
          case "v" => inValue = true; text.clear()
          case "is" => inInline = true; text.clear()
          case "t" if inInline =>
            // rich-text inline cells carry multiple <r><t>…</t></r> runs —
            // concatenate them all (same as the sharedStrings parser)
            text.append(r.getElementText)
            cellValue = Some(text.toString)
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS if inValue =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" =>
            inValue = false
            cellValue = Some(cellType match {
              case "s" => shared.lift(text.toString.trim.toInt).getOrElse("")
              case "b" => if (text.toString.trim == "1") "true" else "false"
              // date-styled numeric serial -> ISO string (pandas parity)
              case "" | "n" if dateStyles(cellStyle) =>
                serialToIso(text.toString, date1904).getOrElse(text.toString)
              case _   => text.toString
            })
          case "is" => inInline = false
          case "c" =>
            while (row.size < cellCol) row += None
            row += cellValue.filter(_.nonEmpty)
          case "row" => rows += row.toVector
          case _ =>
        }
        case _ =>
      }
    }
    r.close()
    rows
  }

  /** Builtin number-format ids that render as dates/times (both workbook
    * generations use the same id space). */
  private[sources] val builtinDateFormats: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47)).toSet

  /** A custom format code is a date format when it contains date tokens
    * (y/m/d/h) outside of [brackets] and "quoted text". */
  private[sources] def isDateFormatCode(code: String): Boolean = {
    val c = code.replaceAll("\\[[^\\]]*\\]", "").replaceAll("\"[^\"]*\"", "")
    c.toLowerCase.exists("ymdh".contains(_))
  }

  /** "C7" → 0-based column index 2; absent ref → next position. */
  private def colIndex(ref: Option[String], default: Int): Int = ref match {
    case Some(s) =>
      val letters = s.takeWhile(_.isLetter)
      if (letters.isEmpty) default
      else letters.foldLeft(0)((a, ch) => a * 26 + (ch.toUpper - 'A' + 1)) - 1
    case None => default
  }
}
