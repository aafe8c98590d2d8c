package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.col

/** Map-side bloom pruning for exact semi-joins — the manual form of
  * Spark's own runtime-filter injection (`InjectRuntimeFilter` wires
  * exactly this pair: a `BloomFilterAggregate` scalar subquery on the
  * build side and a `BloomFilterMightContain(xxhash64(k))` predicate
  * on the probe side). The optimizer's automatic injection keys on
  * scan-size estimates that an exploded/computed probe side does not
  * carry, so operators whose probe side is generated (span windows,
  * shingles) wire the filter explicitly.
  *
  * Semantics: `probe(build, k, c)` is true for every c IN build.k and
  * false for MOST other values (bloom false-positive rate applies) —
  * callers MUST keep an exact join behind it; the bloom only strips
  * the bulk of non-matching rows before their exchange. An EMPTY
  * build side yields a NULL bloom, so the predicate is null → rows
  * drop → consistent with an exact semi-join against an empty build.
  *
  * Sizing: `bits` bounds both the broadcast payload and the one-task
  * partial-merge traffic (maps × bits/8 bytes through a single
  * reducer — the same single-group merge Spark's injected filters
  * pay). Past `items` the filter degrades gracefully: the
  * false-positive rate rises toward 1 and the plan converges to the
  * plain exact-join shape, never to wrong answers.
  */
object BloomSemi {
  /** Predicate column: bloom-of(build.buildKey) might-contain probeKey.
    * Both sides hash through xxhash64, mirroring InjectRuntimeFilter,
    * so any key type the hash accepts works and LongType keys avoid
    * boxing. */
  def probe(build: DataFrame, buildKey: String, probeKey: Column,
            items: Long = 4L * 1000 * 1000, bits: Long = 1L << 25): Column = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftShim.expression(col(buildKey)))),
      Literal(items), Literal(bits)).toAggregateExpression()
    val bloomPlan = GraftShim.analyzed(
      build.select(GraftShim.column(agg).as("bloom")))
    GraftShim.column(BloomFilterMightContain(
      ScalarSubquery(bloomPlan),
      new XxHash64(Seq(GraftShim.expression(probeKey)))))
  }
}
