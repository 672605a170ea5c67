package graft.engine

import org.apache.spark.sql.DataFrame

/** Renders a DataFrame in the reference's output format: an ASCII grid
  * with uppercase `TABLE.COL` headers (the reference uses the
  * `terminaltables.AsciiTable` package, /root/reference/sqlengine.py:
  * 446-452). Collects — CLI sink only, never part of a data pipeline. */
object AsciiTable {

  def render(df: DataFrame, maxRows: Int = 10000): String = {
    val header = df.columns.toSeq
    val rows = df.take(maxRows).map(_.toSeq.map {
      case null => "NULL"
      case v => v.toString
    }.toSeq).toSeq
    val widths = header.indices.map { i =>
      (header(i).length +: rows.map(_(i).length)).max
    }
    def line(sep: String = "-"): String =
      widths.map(w => sep * (w + 2)).mkString("+", "+", "+")
    def row(cells: Seq[String]): String =
      cells.zip(widths).map { case (c, w) => " " + c.padTo(w, ' ') + " " }
        .mkString("|", "|", "|")
    (Seq(line(), row(header), line()) ++ rows.map(row) :+ line()).mkString("\n")
  }

  def show(df: DataFrame): Unit = println(render(df))
}
