package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** 2× average-downsample of one tile in place: each output cell is the
  * mean of the valid cells of its 2×2 source block (NaN-aware 'average'
  * resampling, asset_writer.py overview semantics), all-invalid ⇒ NULL.
  *
  * This is the no-shuffle overview path: a tile maps to a quarter-size
  * tile on the same executor; building a pyramid level never moves
  * pixel data across the cluster (vs explode + groupBy(y/2, x/2), which
  * shuffles every pixel). Native expression for the same reason as
  * TileStatsPartial: a compiled loop beats interpreted HOF lambdas.
  */
case class TileDownsample2x(child: Expression, th: Int, tw: Int)
    extends UnaryExpression with CodegenFallback {

  require(th % 2 == 0 && tw % 2 == 0, "tile dims must be even")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "tile_downsample2x"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val oh = th / 2; val ow = tw / 2
    val out = new Array[Any](oh * ow)
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        var s = 0.0; var n = 0
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            val i = (oy * 2 + dy) * tw + (ox * 2 + dx)
            if (i < arr.numElements() && !arr.isNullAt(i)) {
              s += arr.getDouble(i); n += 1
            }
            dx += 1
          }
          dy += 1
        }
        out(oy * ow + ox) = if (n > 0) s / n else null
        ox += 1
      }
      oy += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TileDownsample2x {
  def downsample2x(tile: Column, th: Int, tw: Int): Column =
    GraftShim.column(TileDownsample2x(GraftShim.expression(tile), th, tw))
}
