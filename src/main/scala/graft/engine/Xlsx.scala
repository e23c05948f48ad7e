package graft.engine

import java.io.{ByteArrayOutputStream, FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element
import scala.collection.mutable

/** Minimal XLSX (SpreadsheetML) codec — the Sheet backend analogue
  * (/root/reference/src/databases/sheet: one table per worksheet,
  * whole book rewritten on mutation). Implemented directly over
  * `java.util.zip` + JAXP DOM so it needs no third-party library:
  * an .xlsx file is a zip of XML parts.
  *
  * Read path handles shared strings (`t="s"`), inline strings
  * (`t="inlineStr"`), booleans (`t="b"`), formula-cached strings
  * (`t="str"`) and plain numbers. Write path emits numbers, booleans
  * and inline strings (no shared-string table — valid and simpler).
  * Driver-side by design: a single workbook file is not distributed
  * storage; the parquet mirror the Engine keeps is what queries scan.
  */
object Xlsx {

  final case class Sheet(name: String, rows: Seq[Seq[String]])

  // ---------------------------------------------------------------- read

  def read(path: String): Seq[Sheet] = {
    val parts = readZip(path)
    val shared = parts.get("xl/sharedStrings.xml").map(parseSharedStrings).getOrElse(Vector.empty)
    val rels = parts.get("xl/_rels/workbook.xml.rels").map(parseRels).getOrElse(Map.empty)
    val wb = parts.getOrElse("xl/workbook.xml",
      throw new EngineException(s"not an xlsx (no workbook.xml): $path"))
    parseWorkbookSheets(wb).map { case (name, rid) =>
      val target = rels.getOrElse(rid, s"worksheets/sheet1.xml")
      val part = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
      val xml = parts.getOrElse(part, throw new EngineException(s"missing sheet part $part"))
      Sheet(name, parseSheetRows(xml, shared))
    }
  }

  private def readZip(path: String): Map[String, Array[Byte]] = {
    val out = mutable.Map.empty[String, Array[Byte]]
    val zin = new ZipInputStream(new FileInputStream(path))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val buf = new ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          var n = zin.read(tmp)
          while (n > 0) { buf.write(tmp, 0, n); n = zin.read(tmp) }
          out(e.getName) = buf.toByteArray
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toMap
  }

  private def dom(bytes: Array[Byte]): Element = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(bytes))
      .getDocumentElement
  }

  private def children(e: Element, tag: String): Seq[Element] = {
    val nl = e.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] =
    children(dom(bytes), "si").map(si =>
      children(si, "t").map(_.getTextContent).mkString).toVector

  private def parseRels(bytes: Array[Byte]): Map[String, String] =
    children(dom(bytes), "Relationship")
      .map(r => r.getAttribute("Id") -> r.getAttribute("Target")).toMap

  private def parseWorkbookSheets(bytes: Array[Byte]): Seq[(String, String)] =
    children(dom(bytes), "sheet").map { s =>
      val rid = Option(s.getAttribute("r:id")).filter(_.nonEmpty)
        .getOrElse(s.getAttribute("id"))
      (s.getAttribute("name"), rid)
    }

  /** Column index from a cell ref like "BC12" → 54. */
  private[engine] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1

  private def parseSheetRows(bytes: Array[Byte], shared: Vector[String]): Seq[Seq[String]] = {
    val rows = children(dom(bytes), "row").map { row =>
      val cells = children(row, "c").map { c =>
        val idx = colIndex(c.getAttribute("r"))
        val t = c.getAttribute("t")
        val value = t match {
          case "s" =>
            children(c, "v").headOption.map(v => shared(v.getTextContent.trim.toInt)).getOrElse("")
          case "inlineStr" =>
            children(c, "is").headOption.map(is => children(is, "t").map(_.getTextContent).mkString).getOrElse("")
          case "b" =>
            if (children(c, "v").headOption.exists(_.getTextContent.trim == "1")) "true" else "false"
          case _ => // number or formula-cached value
            children(c, "v").headOption.map(_.getTextContent).getOrElse("")
        }
        idx -> value
      }
      val width = cells.map(_._1).maxOption.getOrElse(-1) + 1
      val arr = Array.fill(width)("")
      cells.foreach { case (i, v) => if (i >= 0) arr(i) = v }
      arr.toSeq
    }
    // normalize ragged rows to the max width
    val width = rows.map(_.length).maxOption.getOrElse(0)
    rows.map(r => r ++ Seq.fill(width - r.length)(""))
  }

  // --------------------------------------------------------------- write

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def isNum(s: String): Boolean =
    s.nonEmpty && scala.util.Try(s.toDouble).isSuccess

  private def sheetXml(rows: Seq[Seq[String]]): String = {
    val body = rows.zipWithIndex.map { case (r, ri) =>
      val cells = r.zipWithIndex.map { case (v, ci) =>
        val ref = s"${colRef(ci)}${ri + 1}"
        if (v == null || v.isEmpty) s"""<c r="$ref"/>"""
        else if (v == "true" || v == "false")
          s"""<c r="$ref" t="b"><v>${if (v == "true") 1 else 0}</v></c>"""
        else if (isNum(v)) s"""<c r="$ref"><v>$v</v></c>"""
        else s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(v)}</t></is></c>"""
      }.mkString
      s"""<row r="${ri + 1}">$cells</row>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>""".stripMargin
  }

  def write(path: String, sheets: Seq[Sheet]): Unit = {
    val zout = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    }
    try {
      val sheetEntries = sheets.zipWithIndex
      put("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""".stripMargin +
          sheetEntries.map { case (_, i) =>
            s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>"""
          }.mkString + "</Types>")
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      put("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""".stripMargin +
          sheetEntries.map { case (s, i) =>
            s"""<sheet name="${xmlEscape(s.name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
          }.mkString + "</sheets></workbook>")
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""".stripMargin +
          sheetEntries.map { case (_, i) =>
            s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
          }.mkString + "</Relationships>")
      sheetEntries.foreach { case (s, i) =>
        put(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(s.rows))
      }
    } finally zout.close()
  }
}
