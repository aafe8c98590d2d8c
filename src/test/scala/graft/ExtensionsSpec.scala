package graft

/** Both SQL-function wiring paths: the imperative registry used by
  * embedded sessions, and the spark.sql.extensions injection a
  * spark-submit deployment configures. */
class ExtensionsSpec extends SparkSpec {

  test("Registry path: native expressions callable from SQL on the shared session") {
    val h = spark.sql("SELECT span_hash_windows(array('a','b','c'), 2) AS h")
      .collect()(0).getSeq[String](0)
    assert(h.length == 2)
    // same md5 as the documented semantics: md5('a b')
    assert(h.head == "0cc9cd4dd26c5137b675a0d819cb9ab0")
    // the long form is the 60-bit value of the first 15 hex chars
    val hl = spark.sql("SELECT span_hash_windows_long(array('a','b','c'), 2) AS h")
      .collect()(0).getSeq[Long](0)
    assert(hl.head == java.lang.Long.parseLong("0cc9cd4dd26c513", 16))
    val km = spark.sql("SELECT haversine_km(0D, 0D, 0D, 1D) AS km")
      .collect()(0).getDouble(0)
    assert(math.abs(km - 111.19) < 0.5, s"got $km")
  }

  test("GraftExtensions path: injected builders register and build real expressions") {
    // spark.sql.extensions is a STATIC conf read from the SparkContext,
    // so a shared test context can't enable it via Builder options; we
    // drive the injection machinery directly instead.
    import org.apache.spark.sql.{GraftShim, SparkSessionExtensions}
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
    import org.apache.spark.sql.catalyst.expressions.Literal
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = FunctionRegistry.builtin.clone()
    GraftShim.registerFunctions(ext, reg)
    for ((name, usage, _) <- GraftExtensions.builders) {
      assert(reg.functionExists(FunctionIdentifier(name)), s"$name not injected")
      // DESCRIBE FUNCTION metadata must carry (name, usage) correctly —
      // ExpressionInfo's 3-arg ctor binds (className, db, name) and
      // silently files usage as the NAME
      val info = reg.lookupFunction(FunctionIdentifier(name)).get
      assert(info.getName == name, s"bad name: ${info.getName}")
      assert(info.getUsage == usage, s"bad usage: ${info.getUsage}")
    }
    // the injected builder must produce a working expression
    val e = reg.lookupFunction(FunctionIdentifier("haversine_km"),
      Seq(Literal(0.0), Literal(0.0), Literal(0.0), Literal(1.0)))
    val km = e.eval(null).asInstanceOf[Double]
    assert(math.abs(km - 111.19) < 0.5, s"got $km")
  }
}
