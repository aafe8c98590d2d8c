package graft

/** The driver contract surface: entry() must produce rows (the
  * driver's smoke check), every query name must carry an oracle, and
  * the registries must stay collision-free across modules. */
class SparkEntrySpec extends SparkSpec {

  test("entry() produces rows with the documented columns") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSet == Set("r_name", "n_lines", "sum_qty"))
    assert(df.count() > 0)
  }

  test("every registered query has an oracle and no module collides on a name") {
    val names = SparkEntry.modules.flatMap(_.queries.keys)
    val dupes = names.groupBy(identity).collect { case (n, xs) if xs.size > 1 => n }
    assert(dupes.isEmpty, s"query names registered twice: $dupes")
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle SQL: ${q -- o}")
    assert((o -- q).isEmpty, s"oracles without a query: ${o -- q}")
  }
}
