package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, QuaternaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Great-circle (haversine) distance in kilometres — a scalar Spark
  * lacks, implemented as a native Catalyst expression with whole-stage
  * codegen (preference order (b) from the build brief: Expression beats
  * UDF). Used for nearest-gauge / point-to-cell distance joins in the
  * serving layer.
  */
case class Haversine(lat1: Expression, lon1: Expression,
                     lat2: Expression, lon2: Expression)
    extends QuaternaryExpression {

  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2
  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    lat1.nullable || lon1.nullable || lat2.nullable || lon2.nullable

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    Haversine.km(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.Haversine.km($a, $b, $c, $d);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(lat1 = newFirst, lon1 = newSecond, lat2 = newThird, lon2 = newFourth)

  override def prettyName: String = "haversine_km"
}

object Haversine {
  private val R = 6371.0088 // mean Earth radius, km

  /** Static kernel shared by interpreted + generated code paths. */
  def km(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val p1 = math.toRadians(lat1); val p2 = math.toRadians(lat2)
    val dp = p2 - p1; val dl = math.toRadians(lon2 - lon1)
    val a = math.sin(dp / 2) * math.sin(dp / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    2 * R * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** Column API; inputs are cast to double like builtin math functions. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    def d(c: Column) = Cast(GraftShim.expression(c), DoubleType)
    GraftShim.column(Haversine(d(lat1), d(lon1), d(lat2), d(lon2)))
  }
}
