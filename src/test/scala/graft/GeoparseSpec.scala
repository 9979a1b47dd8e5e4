package graft

import graft.pages.WebPages
import org.apache.spark.sql.functions._

/**
 * Geoparse: html geo.position meta tag → typed lon/lat/geometry
 * (north star: "geoparsing page text/metadata into geometries";
 * reference analog: convert DSL attaching geometries at ingest,
 * geomesa-convert/.../Transformers.scala).
 */
class GeoparseSpec extends SparkSpec {

  private lazy val tagged = WebPages.pagesWithGeoTags(spark, sfDir)
  private lazy val parsed = WebPages.geoparse(tagged)

  test("tagged rows parse to the exact milli-degree coordinates; untagged rows are null") {
    val rows = parsed.selectExpr("doc_id", "geo_lon", "geo_lat",
        s"${WebPages.GP_TAGGED} AS tagged",
        s"${WebPages.GP_LON_MILLI} AS lonm", s"${WebPages.GP_LAT_MILLI} AS latm")
      .collect()
    assert(rows.nonEmpty)
    val (tag, untag) = rows.partition(_.getBoolean(3))
    assert(tag.nonEmpty && untag.nonEmpty) // 70/30 split present at sf0.001
    untag.foreach { r => assert(r.isNullAt(1) && r.isNullAt(2)) }
    tag.foreach { r =>
      // bit-exact round trip: the parsed double equals an independent Java
      // parse of the same exact-decimal string
      def dec(m: Long): Double = {
        val sign = if (m < 0) "-" else ""
        java.lang.Double.parseDouble(f"$sign${math.abs(m) / 1000}.${math.abs(m) % 1000}%03d")
      }
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(dec(r.getLong(4))))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(dec(r.getLong(5))))
    }
  }

  test("geoparse is a pure projection: text is byte-identical to the source table") {
    val src = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val mismatch = parsed.select(col("doc_id"), col("text").as("ptext"))
      .join(src, "doc_id")
      .filter(col("ptext") =!= col("text"))
      .count()
    assert(mismatch === 0L)
    assert(parsed.count() === src.count()) // no rows dropped by the projection
  }

  test("geo_geom is the WKB point of the parsed coordinates; joins spatially downstream") {
    val withPt = parsed.filter(col("geo_lon").isNotNull)
      .withColumn("expect", graft.functions.st.point(col("geo_lon"), col("geo_lat")))
    assert(withPt.filter(col("geo_geom") =!= col("expect")).count() === 0L)
    // downstream: geoparsed points participate in the cell-cover join
    val polys = WebPages.nationBoxes(spark, sfDir).select("n_nationkey", "nation_geom")
    val joined = graft.ops.SpatialJoin.containsJoin(
      polys, "nation_geom", withPt.select("doc_id", "geo_geom"), "geo_geom")
    val brute = withPt.select("doc_id", "geo_lon", "geo_lat").as("p")
      .crossJoin(WebPages.nationBoxes(spark, sfDir).as("b"))
      .filter(col("geo_lon") > col("xmin") && col("geo_lon") < col("xmax") &&
        col("geo_lat") > col("ymin") && col("geo_lat") < col("ymax"))
      .select("n_nationkey", "doc_id")
    assert(joined.select("n_nationkey", "doc_id").except(brute).count() === 0L)
    assert(brute.except(joined.select("n_nationkey", "doc_id")).count() === 0L)
  }
}
