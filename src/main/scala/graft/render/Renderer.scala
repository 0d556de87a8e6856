package graft.render

import graft.model._
import graft.functions.Pure

/** Console report sink (reference `table_metrics_displayer.py:26-47`,
  * `cli.py:57-65`): per-table Metric/Before/After/Improvement panel and a
  * one-column list. Pure string building — rendering always happens on tiny
  * collected results (9 rows per table), never distributed. */
object Renderer {

  sealed trait RunMode
  case object LocalMode extends RunMode
  case object RemoteMode extends RunMode

  private def fmtValue(kind: MetricKind, v: Double): String = kind match {
    case MetricKind.DurationK => Pure.formatDuration(v)
    case MetricKind.SizeK => Pure.formatSize(v)
    case MetricKind.IntK => v.toLong.toString
  }

  /** Rows (metric, before, after, improvement) for one table, in metric
    * order, honoring the local-mode visibility flag (`displayer.py:29`). */
  def metricCells(rows: Seq[MetricRow], mode: RunMode): Seq[(String, String, String, String)] =
    rows.sortBy(_.ordinal)
      .filter(r => mode == RemoteMode || r.name.displayInLocal)
      .map { r =>
        val n = r.name
        val isDur = n.kind == MetricKind.DurationK
        (n.display,
          fmtValue(n.kind, r.before),
          r.after.map(fmtValue(n.kind, _)).getOrElse(""),
          Pure.formatImprovement(r.before, r.after, n.displayImprovement, isDur))
      }

  def renderTable(table: String, rows: Seq[MetricRow], mode: RunMode): String = {
    val cells = ("Metric", "Before", "After", "Improvement") +: metricCells(rows, mode)
    val widths = (0 to 3).map(i => cells.map(c => productStr(c, i).length).max)
    val sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    val body = cells.map { c =>
      (0 to 3).map(i => productStr(c, i).padTo(widths(i), ' ')).mkString("| ", " | ", " |")
    }
    (Seq(s"Table: $table", sep, body.head, sep) ++ body.tail :+ sep).mkString("\n")
  }

  private def productStr(t: (String, String, String, String), i: Int): String = i match {
    case 0 => t._1; case 1 => t._2; case 2 => t._3; case _ => t._4
  }

  def renderList(items: Seq[String], heading: String): String =
    (heading +: ("-" * heading.length) +: items).mkString("\n")

  /** Count message with pluralization (reference F8, `cli.py:92-99`):
    * "1 table" / "3 tables" / "No tables". */
  def countMessage(n: Long, noun: String): String = n match {
    case 0 => s"No ${noun}s"
    case 1 => s"1 $noun"
    case _ => s"$n ${noun}s"
  }
}
