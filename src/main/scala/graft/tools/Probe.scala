package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke probe: drives the flagship entry, the SQL registration
 *  surface, and edge cases (bad WKT, nulls, anti-meridian, oversized k).
 *  Run: `sbt "runMain graft.tools.Probe"`. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("ENTRY_ROWS=" + graft.SparkEntry.entry(spark).count())

    graft.functions.st.register(spark)
    graft.functions.tx.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("documents")
    println("SQL_ST=" + spark.sql(
      "SELECT count(*) FROM documents WHERE st_contains(st_makebox(-180e0,-90e0,180e0,90e0), st_point(1e0, 2e0))").head())
    try spark.sql("SELECT st_astext(st_geomfromwkt('POLYGON((garbage'))").show()
    catch { case ex: Throwable =>
      println("BAD_WKT_ERR=" + ex.getClass.getSimpleName + ": " + String.valueOf(ex.getMessage).take(150))
    }
    println("NULL_GEOM=" + spark.sql("SELECT st_contains(CAST(NULL AS BINARY), st_point(0e0,0e0))").head())
    println("IDL_COVER=" + spark.sql("SELECT size(cell_cover(st_makebox(179e0, 89e0, 180e0, 90e0), 8))").head())

    graft.functions.vx.register(spark)
    println("S2_ROUNDTRIP=" + spark.sql(
      "SELECT s2_parent(s2_encode(10.5e0, 45.5e0, 12), 6) = s2_encode(10.5e0, 45.5e0, 6)").head())
    println("GRID_CELLS_POLY=" + spark.sql(
      "SELECT size(grid_cells(st_geomfromwkt('POLYGON((0 0, 20 0, 20 20, 0 20, 0 0))'), -180e0, -85e0, 180e0, 85e0, 64, 32))").head())
    println("DMS=" + spark.sql("SELECT dms_to_deg('38:04:31.17N'), dms_to_deg('junk')").head())
    println("GEOJSON_LINE=" + spark.sql(
      "SELECT st_asgeojson(st_geomfromwkt('LINESTRING(0 0, 1 1)'))").head())
    println("LSH_PROBES=" + spark.sql(
      "SELECT size(lsh_probes(array(1.0f, -2.0f, 0.5f, 3.0f), 8, 3))").head())

    val ctrs = graft.pages.WebPages.nationCenters(spark, "/root/testdata/sf0.001")
      .select("n_nationkey", "clon", "clat").limit(2)
    val pts = graft.pages.WebPages.pages(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lon", "lat")
    println("KNN_BIG_K=" + graft.ops.SpatialJoin.knnPlanar(
      ctrs, "clon", "clat", pts, "lon", "lat", "doc_id", 1000).count())
    spark.stop()
  }
}
