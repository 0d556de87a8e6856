package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Minimal WKB helpers for GEOMETRY/GEOGRAPHY lake columns (see
  * [[graft.sources.v2.GeoLake]]): construct points and read coordinates
  * back — enough to build and verify spatial fixtures without a spatial
  * library on the classpath. All are native Catalyst expressions with
  * codegen (one static call), so they ride whole-stage codegen. */
object GeoExprs {
  /** WKB little-endian 2D point. */
  def point(x: Double, y: Double): Array[Byte] =
    graft.sources.v2.GeoLake.wkbPoint(x, y)

  /** The k-th bbox edge of a WKB geometry (0=xmin 1=ymin 2=xmax 3=ymax);
    * null boxed upstream for empty geometries. */
  def bboxEdge(wkb: Array[Byte], k: Int): Any =
    graft.sources.v2.GeoLake.bbox(wkb) match {
      case None => null
      case Some((xmin, ymin, xmax, ymax)) => k match {
        case 0 => xmin
        case 1 => ymin
        case 2 => xmax
        case _ => ymax
      }
    }
}

/** `st_point(x, y)` → WKB binary. */
case class StPointExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_point"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"st_point requires (DOUBLE, DOUBLE), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(x: Any, y: Any): Any =
    GeoExprs.point(x.asInstanceOf[Double], y.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.GeoExprs$$.MODULE$$.point($x, $y)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): StPointExpr = copy(left = newLeft, right = newRight)
}

/** `st_xmin/st_ymin/st_xmax/st_ymax(geom)` → DOUBLE bbox edge (null for
  * an empty geometry). `st_x`/`st_y` of a point are its xmin/ymin. */
case class StBboxEdgeExpr(child: Expression, edge: Int, name: String)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = name

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires BINARY (WKB), got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    GeoExprs.bboxEdge(input.asInstanceOf[Array[Byte]], edge)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val out = ctx.freshName("bboxEdge")
    nullSafeCodeGen(ctx, ev, c => {
      s"""Object $out = graft.functions.GeoExprs$$.MODULE$$.bboxEdge($c, $edge);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $out).doubleValue(); }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : StBboxEdgeExpr = copy(child = newChild)
}
