package graft.sources

import java.util.zip.ZipFile
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element
import scala.collection.mutable

/** Minimal XLSX reader over the JDK only (zip + DOM): an .xlsx is a zip of XML
  * parts — shared strings, a workbook sheet index, and one XML part per sheet.
  * Covers what `pd.read_excel` covers for the reference's inputs
  * (reference: src/linktransformer/preprocess.py:306-307, 626-631): header
  * row, shared/inline/formula strings, numbers, booleans, blanks.
  *
  * Driver-side by design: XLSX is an eager small-file format (there is no
  * splittable scan of a zip-deflated XML part); anything at data scale should
  * land as Parquet/CSV. The parse result feeds `spark.createDataFrame`, after
  * which Catalyst treats it like any local relation.
  */
object Xlsx {

  /** Parsed grid: sheet name → rows of optional cell strings. */
  final case class Sheet(name: String, rows: Vector[Vector[Option[String]]])

  /** Driver-heap guard for a single inflated XML part. Deflate ratios on
    * crafted XML run >1000:1, so a small .xlsx can decompress to gigabytes
    * ("zip bomb") — the whole part is DOM-parsed on the driver, so cap the
    * UNCOMPRESSED size, not the file size. Overridable per call for genuinely
    * huge-but-legitimate workbooks.
    */
  val DefaultMaxPartBytes: Long = 256L << 20

  /** Cap on parsed cells across the selected sheet (DOM nodes ≫ cell bytes). */
  val DefaultMaxCells: Long = 10L * 1000 * 1000

  private def oversize(path: String, entry: String, bytes: Long, cap: Long) =
    throw new IllegalArgumentException(
      s"$path: part $entry inflates to ${if (bytes < 0) ">cap" else bytes.toString} " +
      s"bytes, over the $cap-byte driver-parse bound. XLSX is an eager " +
      s"driver-side format; convert data this large to Parquet/CSV and use " +
      s"spark.read, or raise maxPartBytes if the workbook is trusted.")

  /** InputStream that fails once more than `cap` bytes have been read —
    * catches parts whose zip header under-declares (or omits) the
    * uncompressed size.
    */
  private final class BoundedStream(in: java.io.InputStream, cap: Long,
      path: String, entry: String) extends java.io.FilterInputStream(in) {
    private var seen = 0L
    private def bump(n: Long): Unit = {
      if (n > 0) { seen += n; if (seen > cap) oversize(path, entry, -1L, cap) }
    }
    override def read(): Int = { val b = super.read(); if (b >= 0) bump(1); b }
    override def read(buf: Array[Byte], off: Int, len: Int): Int = {
      val n = super.read(buf, off, len); bump(n.toLong); n
    }
    override def skip(n: Long): Long = { val s = super.skip(n); bump(s); s }
  }

  private def dom(zf: ZipFile, entry: String, path: String = "",
      maxPartBytes: Long = DefaultMaxPartBytes): Option[Element] =
    Option(zf.getEntry(entry)).map { e =>
      // declared uncompressed size first (cheap); the bounded stream then
      // enforces the same cap against lying/absent size fields during inflate
      if (e.getSize > maxPartBytes) oversize(path, entry, e.getSize, maxPartBytes)
      val dbf = DocumentBuilderFactory.newInstance()
      dbf.setNamespaceAware(true)
      // hard-disable external entity resolution: a spreadsheet must not be
      // able to make the parser fetch anything
      dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      dbf.newDocumentBuilder()
        .parse(new BoundedStream(zf.getInputStream(e), maxPartBytes, path, entry))
        .getDocumentElement
    }

  private def elems(parent: Element, local: String): Vector[Element] = {
    val nl = parent.getElementsByTagNameNS("*", local)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element]).toVector
  }

  /** "BC7" → 0-based column index 54. */
  private[sources] def colIndex(cellRef: String): Int = {
    var i = 0
    var acc = 0
    while (i < cellRef.length && cellRef.charAt(i).isLetter) {
      acc = acc * 26 + (cellRef.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** All text runs under an element, concatenated (rich-text <si> parts). */
  private def textOf(e: Element): String = elems(e, "t").map(_.getTextContent).mkString

  def readSheet(path: String, sheetName: Option[String] = None,
      maxPartBytes: Long = DefaultMaxPartBytes,
      maxCells: Long = DefaultMaxCells): Sheet = {
    val zf = new ZipFile(path)
    try {
      val shared: Vector[String] =
        dom(zf, "xl/sharedStrings.xml", path, maxPartBytes)
          .map(ss => elems(ss, "si").map(textOf)).getOrElse(Vector.empty)

      // workbook sheet list → r:id → worksheet part path
      val wb = dom(zf, "xl/workbook.xml", path, maxPartBytes).getOrElse(
        throw new IllegalArgumentException(s"$path: not an xlsx (no xl/workbook.xml)"))
      val rels = dom(zf, "xl/_rels/workbook.xml.rels", path, maxPartBytes).map { r =>
        elems(r, "Relationship").map(e => e.getAttribute("Id") -> e.getAttribute("Target")).toMap
      }.getOrElse(Map.empty)
      val sheets = elems(wb, "sheet").map { s =>
        val rid = Option(s.getAttributeNS(
          "http://schemas.openxmlformats.org/officeDocument/2006/relationships", "id"))
          .filter(_.nonEmpty).getOrElse(s.getAttribute("r:id"))
        s.getAttribute("name") -> rid
      }
      val (name, rid) = sheetName match {
        case Some(n) => sheets.find(_._1 == n).getOrElse(
          throw new IllegalArgumentException(
            s"$path: no sheet named '$n' (have: ${sheets.map(_._1).mkString(", ")})"))
        case None => sheets.headOption.getOrElse(
          throw new IllegalArgumentException(s"$path: workbook has no sheets"))
      }
      val target = rels.getOrElse(rid, "worksheets/sheet1.xml")
      val part = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
      val ws = dom(zf, part, path, maxPartBytes).getOrElse(
        throw new IllegalArgumentException(s"$path: missing worksheet part $part"))

      val nCells = ws.getElementsByTagNameNS("*", "c").getLength.toLong
      require(nCells <= maxCells,
        s"$path: sheet '$name' has $nCells cells, over the $maxCells-cell " +
        s"driver-parse bound — convert to Parquet/CSV for data this large, " +
        s"or raise maxCells if the workbook is trusted")

      val rows = elems(ws, "row").map { row =>
        val cells = mutable.Map.empty[Int, Option[String]]
        // the r= cell reference is OPTIONAL (ECMA-376): cells without it
        // occupy the position after the previous cell
        var nextIdx = 0
        elems(row, "c").foreach { c =>
          val ref = c.getAttribute("r")
          val idx = if (ref == null || ref.isEmpty) nextIdx else colIndex(ref)
          nextIdx = idx + 1
          val t = c.getAttribute("t")
          val v = t match {
            case "s" => elems(c, "v").headOption
              .map(v => shared(v.getTextContent.trim.toInt))
            case "inlineStr" => elems(c, "is").headOption.map(textOf)
            case "b" => elems(c, "v").headOption
              .map(v => if (v.getTextContent.trim == "1") "true" else "false")
            case _ => elems(c, "v").headOption.map(_.getTextContent) // number / "str"
          }
          cells(idx) = v
        }
        val width = if (cells.isEmpty) 0 else cells.keys.max + 1
        Vector.tabulate(width)(i => cells.getOrElse(i, None))
      }
      Sheet(name, rows)
    } finally zf.close()
  }

  /** pandas-ish per-column inference over string cells: all-long → long,
    * else all-double → double, else string. Excel numerics arrive as "3.0"
    * style doubles; integral doubles report as long (pandas Int64 behavior
    * when no fraction is present).
    */
  private[sources] def inferType(values: Seq[String]): String = {
    if (values.isEmpty) "string"
    else if (values.forall(v => v.toLongOption.isDefined ||
      v.toDoubleOption.exists(d => d.isWhole && math.abs(d) < 9.007199254740992e15))) "long"
    else if (values.forall(_.toDoubleOption.isDefined)) "double"
    else "string"
  }
}
