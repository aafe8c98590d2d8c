package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HaversineSpec extends SparkSpec {
  import spark.implicits._

  test("haversine_km matches known city distances and runs in codegen") {
    // Paris (48.8566, 2.3522) ↔ London (51.5074, -0.1278) ≈ 343.5 km
    val df = Seq((48.8566, 2.3522, 51.5074, -0.1278)).toDF("a", "b", "c", "d")
      .select(Haversine.haversineKm(col("a"), col("b"), col("c"), col("d")).as("km"))
    val km = df.collect()(0).getDouble(0)
    assert(math.abs(km - 343.5) < 1.0, s"got $km")
    // zero distance + null propagation
    val edge = Seq((0.0, 0.0)).toDF("z", "o").select(
      Haversine.haversineKm(col("z"), col("o"), col("z"), col("o")).as("zero"),
      Haversine.haversineKm(lit(null).cast("double"), col("o"), col("z"), col("o")).as("n"))
    val r = edge.collect()(0)
    assert(r.getDouble(0) == 0.0 && r.isNullAt(1))
    // antipodal ≈ half circumference ≈ 20015 km
    val anti = Seq((0.0, 0.0, 0.0, 180.0)).toDF("a", "b", "c", "d")
      .select(Haversine.haversineKm(col("a"), col("b"), col("c"), col("d")).as("km"))
      .collect()(0).getDouble(0)
    assert(math.abs(anti - 20015.1) < 1.0, s"got $anti")
  }

  test("native functions are SQL-registered") {
    val km = spark.sql(
      "SELECT haversine_km(48.8566D, 2.3522D, 51.5074D, -0.1278D) AS km")
      .collect()(0).getDouble(0)
    assert(math.abs(km - 343.5) < 1.0)
    val st = spark.sql(
      "SELECT tile_stats_partial(array(1.0D, CAST(NULL AS DOUBLE), 3.0D)) AS p")
      .select("p.n", "p.sum").collect()(0)
    assert(st.getLong(0) == 2L && st.getDouble(1) == 4.0)
  }

  test("expression participates in a distance join over many rows") {
    // nearest of 3 "stations" for each of 1000 points — codegen path
    val pts = spark.range(1000).select(
      (col("id") % 180 - 90).cast("double").as("plat"),
      (col("id") % 360 - 180).cast("double").as("plon"))
    val stations = Seq((0.0, 0.0, "eq"), (45.0, 90.0, "ne"), (-60.0, -120.0, "sw"))
      .toDF("slat", "slon", "name")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("plat", "plon").orderBy(col("km").asc, col("name").asc)
    val nearest = pts.crossJoin(broadcast(stations))
      .withColumn("km", Haversine.haversineKm(col("plat"), col("plon"), col("slat"), col("slon")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(nearest.count() == pts.distinct().count())
    // id=90 → point (0, -90): 10007 km to "eq", ~7150 km to "sw"
    val p = nearest.filter(col("plat") === 0.0 && col("plon") === -90.0)
      .select("name").distinct().as[String].collect()
    assert(p.sameElements(Array("sw")), p.mkString(","))
  }
}
