package graft

import graft.functions.GeomRT
import graft.geom.GeomCodec
import graft.ops.Density
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.Coordinate

/** Non-point density rasterization (grid_cells) vs JTS brute-force oracles:
  * every covered cell is found, no cell is invented. */
class GridCellsSpec extends SparkSpec {
  import spark.implicits._

  private val W = 64; private val H = 32
  private val Xmin = -180.0; private val Ymin = -85.0
  private val Xmax = 180.0; private val Ymax = 85.0

  /** Brute-force oracle: all W×H cells whose RECTANGLE the line intersects
    * (superset of the midpoint-walk; used for the subset direction), and
    * cells whose center the polygon contains (exact for the polygon path). */
  private def cellRect(cx: Long, cy: Long) = GeomCodec.box(
    Xmin + cx * (Xmax - Xmin) / W, Ymin + cy * (Ymax - Ymin) / H,
    Xmin + (cx + 1) * (Xmax - Xmin) / W, Ymin + (cy + 1) * (Ymax - Ymin) / H)

  private def run(wkt: String): Set[(Long, Long)] =
    GeomRT.gridCells(GeomCodec.toWkb(GeomCodec.fromWkt(wkt)), Xmin, Ymin, Xmax, Ymax, W, H)
      .map(id => (id % W, id / W)).toSet

  test("line rasterization marks exactly the crossed cells (diagonal + axis-aligned)") {
    val wkt = "LINESTRING (-10 -10, 30 17, 30 40)"
    val got = run(wkt)
    val line = GeomCodec.fromWkt(wkt)
    val touching = (for { cx <- 0L until W; cy <- 0L until H
      if line.intersects(cellRect(cx, cy)) } yield (cx, cy)).toSet
    // every walked cell genuinely touches the line
    assert(got.subsetOf(touching))
    // the walk misses no interior crossing: cells whose OPEN interior the
    // line passes through (shrink the rect by epsilon to exclude corner
    // touches the midpoint walk legitimately skips)
    val eps = 1e-9
    val interior = (for { cx <- 0L until W; cy <- 0L until H
      if line.intersects(GeomCodec.box(
        Xmin + cx * 5.625 + eps, Ymin + cy * 5.3125 + eps,
        Xmin + (cx + 1) * 5.625 - eps, Ymin + (cy + 1) * 5.3125 - eps))
    } yield (cx, cy)).toSet
    assert(interior.subsetOf(got))
  }

  test("polygon rasterization == center-containment oracle (triangle)") {
    val wkt = "POLYGON ((-30 -20, 40 -25, 5 35, -30 -20))"
    val got = run(wkt)
    val poly = GeomCodec.fromWkt(wkt)
    val expect = (for { cx <- 0L until W; cy <- 0L until H
      val xc = Xmin + (cx + 0.5) * ((Xmax - Xmin) / W)
      val yc = Ymin + (cy + 0.5) * ((Ymax - Ymin) / H)
      if poly.contains(GeomCodec.point(xc, yc))
    } yield (cx, cy)).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("polygon with hole: interior-ring cells are NOT covered") {
    val wkt = "POLYGON ((-40 -40, 40 -40, 40 40, -40 40, -40 -40), (-20 -20, 20 -20, 20 20, -20 20, -20 -20))"
    val got = run(wkt)
    val poly = GeomCodec.fromWkt(wkt)
    val expect = (for { cx <- 0L until W; cy <- 0L until H
      val xc = Xmin + (cx + 0.5) * ((Xmax - Xmin) / W)
      val yc = Ymin + (cy + 0.5) * ((Ymax - Ymin) / H)
      if poly.contains(GeomCodec.point(xc, yc))
    } yield (cx, cy)).toSet
    assert(got === expect)
    // sanity: a center well inside the hole is excluded
    val holeCell = (math.floor((0 - Xmin) / (Xmax - Xmin) * W).toLong,
      math.floor((0 - Ymin) / (Ymax - Ymin) * H).toLong)
    assert(!got.contains(holeCell))
    assert(got.nonEmpty)
  }

  test("multi-geometries and points dispatch per component") {
    val got = run("GEOMETRYCOLLECTION (POINT (-75.5 40.5), MULTIPOINT ((10 50), (10 50)), LINESTRING (100 0, 100 0.1))")
    def cell(lon: Double, lat: Double) =
      (math.floor((lon - Xmin) / (Xmax - Xmin) * W).toLong, math.floor((lat - Ymin) / (Ymax - Ymin) * H).toLong)
    assert(got === Set(cell(-75.5, 40.5), cell(10, 50), cell(100, 0.05)))
  }

  test("out-of-grid geometry contributes nothing; spanning geometry clips") {
    assert(run("POINT (-200 0)").isEmpty)
    val got = run("LINESTRING (-190 0, -170 0)") // clips at xmin
    assert(got.nonEmpty)
    assert(got.forall { case (cx, _) => cx >= 0 && cx < W })
  }

  test("gridGeom counts covering geometries per cell (mixed point/line/poly)") {
    val df = Seq(
      "POINT (2 2)",
      "LINESTRING (-9 2, 12 2)",           // crosses the POINT's cell row
      "POLYGON ((-10 -10, 15 -10, 15 12, -10 12, -10 -10))" // contains both centers
    ).toDF("wkt").select(graft.functions.st.geomFromWKT($"wkt").as("g"))
    val got = Density.gridGeom(df, $"g", Xmin, Ymin, Xmax, Ymax, W, H)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // cell containing (2,2): all three cover it
    val c = (math.floor((2 - Xmin) / 360.0 * W).toLong, math.floor((2 - Ymin) / 170.0 * H).toLong)
    assert(got(c) === 3L)
    assert(got.values.forall(n => n >= 1 && n <= 3))
  }

  test("grid_cells SQL registration") {
    val n = spark.sql(
      "SELECT size(grid_cells(st_point(0D, 0D), -180D, -85D, 180D, 85D, 64, 32)) AS s")
      .head().getInt(0)
    assert(n === 1)
  }
}
