package graft.catalog

import graft.ops.Algebra
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Variable-level processing config (reference core/models/variable.py):
  * the enum-dispatched transform factory (extractor.py:73-84) and the
  * affine unit-conversion factory (utils.py:11-15) — per-variable config
  * rows become column expressions at ingest. */
object Variables {

  /** transform_type ∈ {PASSTHROUGH, VECTOR_MAGNITUDE, VECTOR_DIRECTION}. */
  def transform(transformType: Column, u: Column, v: Column): Column =
    when(transformType === "VECTOR_MAGNITUDE", Algebra.vectorMagnitude(u, v))
      .when(transformType === "VECTOR_DIRECTION", Algebra.vectorDirection(u, v))
      .otherwise(u)

  /** Affine unit conversion from dimension-row factor/offset columns. */
  def convert(value: Column, factor: Column, offset: Column): Column =
    value * factor + offset
}
