package graft.serve

import graft.Tables
import graft.model.QueryModule
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Serving-layer document shaping (SURVEY §2.8 F15 family): full STAC
  * item documents (stac/serializers.py:137-420) and EDR collection /
  * parameter_names documents (edr/serializers.py:51-350) as verified
  * queries. Documents are concatenation-built JSON — byte-identical
  * across engines (no engine JSON serializer quirks) — over the same
  * synthetic item model the catalog queries use (orders = items,
  * deterministic modular bounds).
  *
  * Dates render ISO-8601 (the reference's '%d %b %Y' display labels are
  * locale-dependent; serving documents here stay locale-free).
  */
object DocQueries extends QueryModule {

  private def L(s: String) = lit(s)

  /** Item model shared by the STAC queries: bounds are exact integer
    * modular arithmetic (catalog/Search.scala convention); every 4th
    * item is a forecast with reference_time = time − 1 day. */
  private val fc = col("o_orderkey") % 4 === 0

  override def queries = Map(
    // F15b — STAC item document: type/version/extensions, bbox +
    // polygon geometry from bounds, timestamped id with the forecast
    // reference prefix, properties incl. the forecast + projection
    // extensions, links, assets, collection (stac/serializers.py:137-420).
    "f15b_stac_item_doc" -> ((s, dir) => {
      val w = (col("o_orderkey") % 340 - 170).cast("string")
      val so = (col("o_orderkey") % 160 - 80).cast("string")
      val e = (col("o_orderkey") % 340 - 170 + 12).cast("string")
      val n = (col("o_orderkey") % 160 - 80 + 9).cast("string")
      val ts = date_format(col("o_orderdate"), "yyyyMMdd'T'HHmmss'Z'")
      val iso = date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
      val refIso = date_format(date_sub(col("o_orderdate"), 1), "yyyy-MM-dd'T'HH:mm:ss'Z'")
      val refTs = date_format(date_sub(col("o_orderdate"), 1), "yyyyMMdd'T'HHmmss'Z'")
      val id = when(fc, concat(refTs, L("_"), ts)).otherwise(ts)
      val colSlug = concat(L("col_"), (col("o_custkey") % 20).cast("string"))
      val ext = concat(
        L("[\"https://stac-extensions.github.io/timestamps/v1.1.0/schema.json\"," +
          "\"https://stac-extensions.github.io/raster/v1.1.0/schema.json\"," +
          "\"https://stac-extensions.github.io/file/v2.1.0/schema.json\"," +
          "\"https://stac-extensions.github.io/projection/v1.1.0/schema.json\""),
        when(fc, L(",\"https://stac-extensions.github.io/forecast/v0.1.0/schema.json\""))
          .otherwise(L("")),
        L("]"))
      val ring = concat(
        L("[[["), w, L(","), so, L("],["), e, L(","), so, L("],["),
        e, L(","), n, L("],["), w, L(","), n, L("],["), w, L(","), so, L("]]]"))
      val title = when(fc,
          concat(L("precip (Ref "), refIso, L(") (Valid "), iso, L(")")))
        .otherwise(concat(L("precip ("), iso, L(")")))
      val fcProps = when(fc, concat(
          L(",\"forecast:reference_datetime\":\""), refIso,
          L("\",\"forecast:horizon\":\"PT24H\"")))
        .otherwise(L(""))
      val doc = concat(
        L("{\"type\":\"Feature\",\"stac_version\":\"1.0.0\",\"stac_extensions\":"), ext,
        L(",\"id\":\""), id,
        L("\",\"geometry\":{\"type\":\"Polygon\",\"coordinates\":"), ring,
        L("},\"bbox\":["), w, L(","), so, L(","), e, L(","), n,
        L("],\"properties\":{\"datetime\":\""), iso,
        L("\",\"title\":\""), title, L("\""), fcProps,
        L(",\"proj:shape\":[48,64],\"proj:epsg\":4326}"),
        L(",\"links\":[{\"rel\":\"self\",\"href\":\"https://example.org/stac/collections/"),
        colSlug, L("/items/"), id,
        L("\"},{\"rel\":\"collection\",\"href\":\"https://example.org/stac/collections/"),
        colSlug, L("\"}]"),
        L(",\"assets\":{\"data\":{\"href\":\"https://example.org/data/"), id,
        L(".tif\",\"type\":\"image/tiff; application=geotiff\"}}"),
        L(",\"collection\":\""), colSlug, L("\"}"))
      Tables.orders(s, dir).select(col("o_orderkey"), doc.as("doc"))
    }),

    // F15c — EDR collection document: spatial extent from the items'
    // bounds envelope, temporal interval + the flat sorted valid-time
    // list, trs, static parameter_names, links (edr/serializers.py:
    // 126-240, 309-350).
    "f15c_edr_collection_doc" -> ((s, dir) => {
      val iso = date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
      val agg = Tables.orders(s, dir)
        .withColumn("slug", concat(L("col_"), (col("o_custkey") % 20).cast("string")))
        .withColumn("iso", iso)
        .groupBy("slug")
        .agg(
          min(col("o_orderkey") % 340 - 170).cast("string").as("bw"),
          min(col("o_orderkey") % 160 - 80).cast("string").as("bs"),
          max(col("o_orderkey") % 340 - 170 + 12).cast("string").as("be"),
          max(col("o_orderkey") % 160 - 80 + 9).cast("string").as("bn"),
          min(col("iso")).as("t0"), max(col("iso")).as("t1"),
          array_join(array_sort(collect_set(col("iso"))), "\",\"").as("vals"))
      val doc = concat(
        L("{\"id\":\""), col("slug"),
        L("\",\"extent\":{\"spatial\":{\"bbox\":[["),
        col("bw"), L(","), col("bs"), L(","), col("be"), L(","), col("bn"),
        L("]],\"crs\":\"EPSG:4326\"},\"temporal\":{\"interval\":[[\""),
        col("t0"), L("\",\""), col("t1"),
        L("\"]],\"values\":[\""), col("vals"),
        L("\"],\"trs\":\"http://www.opengis.net/def/uom/ISO-8601/0/Gregorian\"}}"),
        L(",\"parameter_names\":{\"precip\":{\"type\":\"Parameter\",\"label\":\"precip\"," +
          "\"unit\":{\"symbol\":\"mm\"},\"observedProperty\":{\"id\":\"precip\",\"label\":\"precip\"}}," +
          "\"temp\":{\"type\":\"Parameter\",\"label\":\"temp\"," +
          "\"unit\":{\"symbol\":\"K\"},\"observedProperty\":{\"id\":\"temp\",\"label\":\"temp\"}}}"),
        L(",\"links\":[{\"rel\":\"self\",\"href\":\"https://example.org/edr/collections/"),
        col("slug"),
        L("\"},{\"rel\":\"root\",\"href\":\"https://example.org/edr/\"}," +
          "{\"rel\":\"collection\",\"href\":\"https://example.org/edr/collections/\"}," +
          "{\"rel\":\"canonical\",\"href\":\"https://example.org/stac/collections/"),
        col("slug"), L("\"}]}"))
      agg.select(col("slug"), doc.as("doc"))
    }),

    // F15d — EDR parameter_names entries: one Variable → one Parameter
    // document, with x-georiva palette fields bound to the configured
    // ramp catalog, including the legacy qualitative→categorical
    // vocabulary mapping (edr/serializers.py:51-113).
    "f15d_edr_parameter_names" -> ((s, dir) => {
      val ramps = graft.ops.ScalarQueries.configuredRamps
      val rampName: Column = (col("r_regionkey") % ramps.size).cast("int")
      def rampCase(f: graft.ops.Ramps.Ramp => String): Column =
        ramps.zipWithIndex.foldLeft(lit(null).cast("string")) { case (acc, (r, i)) =>
          when(rampName === i, L(f(r))).otherwise(acc)
        }
      val palName = rampCase(_.id)
      // legacy clients knew "qualitative" as "categorical"
      val palType = rampCase(r =>
        if (r.rampType == "qualitative") "categorical" else r.rampType)
      val slug = concat(L("var_"), col("r_regionkey").cast("string"))
      val unit = when(col("r_regionkey") % 2 === 0, L("mm")).otherwise(L("K"))
      val doc = concat(
        L("{\"type\":\"Parameter\",\"label\":\""), col("r_name"),
        L("\",\"observedProperty\":{\"id\":\""), slug,
        L("\",\"label\":\""), col("r_name"),
        L("\"},\"unit\":{\"symbol\":\""), unit,
        L("\"},\"x-georiva\":{\"palette_name\":\""), palName,
        L("\",\"palette_type\":\""), palType, L("\"}}"))
      Tables.region(s, dir).select(slug.as("slug"), doc.as("doc"))
    })
  )

  override def oracleSql = {
    val ramps = graft.ops.ScalarQueries.configuredRamps
    val rampCaseName = ramps.zipWithIndex.map { case (r, i) =>
      s"WHEN r_regionkey % ${ramps.size} = $i THEN '${r.id}'" }.mkString(" ")
    val rampCaseType = ramps.zipWithIndex.map { case (r, i) =>
      val t = if (r.rampType == "qualitative") "categorical" else r.rampType
      s"WHEN r_regionkey % ${ramps.size} = $i THEN '$t'" }.mkString(" ")
    Map(
      "f15b_stac_item_doc" ->
        """SELECT o_orderkey,
          |  '{"type":"Feature","stac_version":"1.0.0","stac_extensions":' ||
          |  '["https://stac-extensions.github.io/timestamps/v1.1.0/schema.json","https://stac-extensions.github.io/raster/v1.1.0/schema.json","https://stac-extensions.github.io/file/v2.1.0/schema.json","https://stac-extensions.github.io/projection/v1.1.0/schema.json"' ||
          |  CASE WHEN o_orderkey % 4 = 0 THEN ',"https://stac-extensions.github.io/forecast/v0.1.0/schema.json"' ELSE '' END || ']' ||
          |  ',"id":"' || id ||
          |  '","geometry":{"type":"Polygon","coordinates":[[[' ||
          |  w || ',' || s || '],[' || e || ',' || s || '],[' || e || ',' || n || '],[' ||
          |  w || ',' || n || '],[' || w || ',' || s || ']]]},"bbox":[' ||
          |  w || ',' || s || ',' || e || ',' || n ||
          |  '],"properties":{"datetime":"' || iso || '","title":"' ||
          |  CASE WHEN o_orderkey % 4 = 0
          |       THEN 'precip (Ref ' || refiso || ') (Valid ' || iso || ')'
          |       ELSE 'precip (' || iso || ')' END || '"' ||
          |  CASE WHEN o_orderkey % 4 = 0
          |       THEN ',"forecast:reference_datetime":"' || refiso || '","forecast:horizon":"PT24H"'
          |       ELSE '' END ||
          |  ',"proj:shape":[48,64],"proj:epsg":4326}' ||
          |  ',"links":[{"rel":"self","href":"https://example.org/stac/collections/' ||
          |  slug || '/items/' || id ||
          |  '"},{"rel":"collection","href":"https://example.org/stac/collections/' ||
          |  slug || '"}]' ||
          |  ',"assets":{"data":{"href":"https://example.org/data/' || id ||
          |  '.tif","type":"image/tiff; application=geotiff"}}' ||
          |  ',"collection":"' || slug || '"}' AS doc
          |FROM (
          |  SELECT o_orderkey,
          |    CAST(o_orderkey % 340 - 170 AS VARCHAR) AS w,
          |    CAST(o_orderkey % 160 - 80 AS VARCHAR) AS s,
          |    CAST(o_orderkey % 340 - 170 + 12 AS VARCHAR) AS e,
          |    CAST(o_orderkey % 160 - 80 + 9 AS VARCHAR) AS n,
          |    strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS iso,
          |    strftime(o_orderdate - INTERVAL 1 DAY, '%Y-%m-%dT%H:%M:%SZ') AS refiso,
          |    CASE WHEN o_orderkey % 4 = 0
          |         THEN strftime(o_orderdate - INTERVAL 1 DAY, '%Y%m%dT%H%M%SZ') || '_' || strftime(o_orderdate, '%Y%m%dT%H%M%SZ')
          |         ELSE strftime(o_orderdate, '%Y%m%dT%H%M%SZ') END AS id,
          |    'col_' || CAST(o_custkey % 20 AS VARCHAR) AS slug
          |  FROM orders) t""".stripMargin,
      "f15c_edr_collection_doc" ->
        """WITH base AS (
          |  SELECT 'col_' || CAST(o_custkey % 20 AS VARCHAR) AS slug,
          |    o_orderkey % 340 - 170 AS w, o_orderkey % 160 - 80 AS s,
          |    o_orderkey % 340 - 170 + 12 AS e, o_orderkey % 160 - 80 + 9 AS n,
          |    strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS iso
          |  FROM orders),
          |agg AS (
          |  SELECT slug,
          |    CAST(min(w) AS VARCHAR) AS bw, CAST(min(s) AS VARCHAR) AS bs,
          |    CAST(max(e) AS VARCHAR) AS be, CAST(max(n) AS VARCHAR) AS bn,
          |    min(iso) AS t0, max(iso) AS t1,
          |    array_to_string(list_sort(list(DISTINCT iso)), '","') AS vals
          |  FROM base GROUP BY 1)
          |SELECT slug,
          |  '{"id":"' || slug ||
          |  '","extent":{"spatial":{"bbox":[[' ||
          |  bw || ',' || bs || ',' || be || ',' || bn ||
          |  ']],"crs":"EPSG:4326"},"temporal":{"interval":[["' ||
          |  t0 || '","' || t1 || '"]],"values":["' || vals ||
          |  '"],"trs":"http://www.opengis.net/def/uom/ISO-8601/0/Gregorian"}}' ||
          |  ',"parameter_names":{"precip":{"type":"Parameter","label":"precip","unit":{"symbol":"mm"},"observedProperty":{"id":"precip","label":"precip"}},"temp":{"type":"Parameter","label":"temp","unit":{"symbol":"K"},"observedProperty":{"id":"temp","label":"temp"}}}' ||
          |  ',"links":[{"rel":"self","href":"https://example.org/edr/collections/' || slug ||
          |  '"},{"rel":"root","href":"https://example.org/edr/"},{"rel":"collection","href":"https://example.org/edr/collections/"},{"rel":"canonical","href":"https://example.org/stac/collections/' ||
          |  slug || '"}]}' AS doc
          |FROM agg""".stripMargin,
      "f15d_edr_parameter_names" ->
        s"""SELECT 'var_' || CAST(r_regionkey AS VARCHAR) AS slug,
           |  '{"type":"Parameter","label":"' || r_name ||
           |  '","observedProperty":{"id":"var_' || CAST(r_regionkey AS VARCHAR) ||
           |  '","label":"' || r_name ||
           |  '"},"unit":{"symbol":"' ||
           |  CASE WHEN r_regionkey % 2 = 0 THEN 'mm' ELSE 'K' END ||
           |  '"},"x-georiva":{"palette_name":"' ||
           |  CASE $rampCaseName END ||
           |  '","palette_type":"' ||
           |  CASE $rampCaseType END || '"}}' AS doc
           |FROM region""".stripMargin)
  }
}
