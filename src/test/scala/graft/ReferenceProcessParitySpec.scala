package graft

import graft.cql.Ecql
import graft.functions.st
import graft.geom.Geodesy
import graft.ops.{Density, SpatialJoin, SpatioTemporal}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Row-for-row parity with the reference's OWN process tests — the same
 * fixtures (including the seeded random corpus), the same expected counts
 * and orderings, asserted against this engine's operators:
 *
 *  - kNN:       geomesa-core/src/test/.../process/knn/KNearestNeighborSearchProcessTest.scala
 *  - proximity: .../process/proximity/ProximitySearchProcessTest.scala
 *  - unique:    .../process/unique/UniqueProcessTest.scala
 *  - tube:      .../process/tube/TubeSelectProcessTest.scala
 *  - query:     .../process/query/QueryProcessTest.scala
 *  - temporal:  .../process/temporaldensity/TemporalDensityProcessTest.scala
 *
 * Where the reference's assertion is self-consistent rather than absolute
 * (its 99 m proximity boundary places the query point and derives the
 * buffer from the SAME GeodeticCalculator), this spec reproduces that
 * construction with this engine's own metric (haversine — what the
 * proximity refine uses), so the boundary semantics are tested with the
 * same rigor, not a translated constant.
 */
class ReferenceProcessParitySpec extends SparkSpec {

  // ------------------------------------------------------------------ kNN

  /** The reference's named campus cluster (KNearestNeighborSearchProcessTest
    * lines 56-72), (id, lon, lat). */
  private val cluster: Seq[(String, Double, Double)] = Seq(
    ("rotunda", -78.503547, 38.035475),
    ("pavilion I", -78.503923, 38.035536),
    ("pavilion III", -78.504059, 38.035308),
    ("pavilion V", -78.504276, 38.034971),
    ("pavilion VII", -78.504424, 38.034628),
    ("pavilion IX", -78.504617, 38.034208),
    ("pavilion X", -78.503833, 38.033938),
    ("pavilion VIII", -78.503601, 38.034343),
    ("pavilion VI", -78.503424, 38.034721),
    ("pavilion IV", -78.503180, 38.035039),
    ("pavilion II", -78.503109, 38.035278),
    ("cabell", -78.505152, 38.032704),
    ("beams", -78.510295, 38.034283),
    ("mccormick", -78.522288, 38.032844),
    ("hep", -78.520019, 38.034511))

  /** generateTestData(1000, 38.149894, -79.073639, 0.30) — the reference
    * seeds scala.util.Random(0) and draws lon THEN lat per point
    * (string-building evaluation order, lines 100-110). */
  private val scattered: Seq[(String, Double, Double)] = {
    val rng = new scala.util.Random(0)
    val (centerLat, centerLon, width) = (38.149894, -79.073639, 0.30)
    (1 to 1000).map { i =>
      val lon = centerLon + width * (rng.nextDouble() - 0.5)
      val lat = centerLat + width * (rng.nextDouble() - 0.5)
      ((100000 + i).toString, lon, lat)
    }
  }

  private lazy val knnData: DataFrame = {
    import spark.implicits._
    (cluster ++ scattered).toDF("fid", "lon", "lat")
  }
  private lazy val knnCoords: Map[String, (Double, Double)] =
    (cluster ++ scattered).map { case (id, lon, lat) => id -> (lon, lat) }.toMap

  private def queryDf(id: String, lat: Double, lon: Double): DataFrame = {
    import spark.implicits._
    Seq((id, lon, lat)).toDF("qid", "qlon", "qlat")
  }

  private def knnIds(q: DataFrame, k: Int): Seq[(String, Int)] =
    SpatialJoin.knnJoin(q, "qid", "qlon", "qlat", knnData, "lon", "lat", "fid",
        k, geodetic = true, metric = "vincenty")
      .orderBy("rank").select("fid", "rank")
      .collect().map(r => (r.getString(0), r.getAs[Number](1).intValue)).toSeq

  private def vincentyTo(qLon: Double, qLat: Double)(id: String): Double = {
    val (lon, lat) = knnCoords(id)
    Geodesy.vincentyMeters(qLon, qLat, lon, lat)
  }

  test("kNN parity: nothing within 10km of fan mountain (k=5, 10km cap)") {
    // reference asserts size 0 with a 10 km max radius; the cap is applied
    // as a distance filter over the k nearest
    val got = knnIds(queryDf("fan mountain", 37.878219, -78.692649), 5)
      .map(_._1).filter(id => vincentyTo(-78.692649, 37.878219)(id) <= 10000.0)
    assert(got.isEmpty)
  }

  test("kNN parity: 11 of the 15 nearest to madison lie within 400m") {
    val got = knnIds(queryDf("madison", 38.036871, -78.502720), 15)
      .map(_._1).filter(id => vincentyTo(-78.502720, 38.036871)(id) <= 400.0)
    assert(got.size === 11)
  }

  test("kNN parity: ordered neighbors around Charlottesville match the reference list") {
    // KNearestNeighborSearchProcessTest lines 194-214 — hard-coded Vincenty
    // ordering of the campus cluster from the madison query point
    val expected = List("rotunda", "pavilion II", "pavilion I", "pavilion IV",
      "pavilion III", "pavilion VI", "pavilion V", "pavilion VII",
      "pavilion VIII", "pavilion IX", "pavilion X", "cabell", "beams",
      "hep", "mccormick")
    val got = knnIds(queryDf("madison", 38.036871, -78.502720), 15).map(_._1)
    assert(got === expected)
  }

  test("kNN parity: empty query collection returns nothing") {
    import spark.implicits._
    val empty = Seq.empty[(String, Double, Double)].toDF("qid", "qlon", "qlat")
    assert(knnIds(empty, 100).isEmpty)
  }

  test("kNN parity: neighbors around Staunton equal the brute-force Vincenty order") {
    // reference lines 216-226: top-10 must equal a client-side sort of ALL
    // 1015 features by Vincenty distance
    val (qLat, qLon) = (38.149185, -79.070569)
    val brute = (cluster ++ scattered)
      .map { case (id, lon, lat) => (Geodesy.vincentyMeters(qLon, qLat, lon, lat), id) }
      .sorted.take(10).map(_._2)
    val got = knnIds(queryDf("blackfriars", qLat, qLon), 10).map(_._1)
    assert(got === brute)
  }

  // ------------------------------------------------------------ proximity

  /** Longitude offset east of (base, base) whose haversine distance is
    * exactly `meters` — the engine-metric equivalent of the reference's
    * GeodeticCalculator farthestPoint construction. */
  private def eastOffsetDeg(base: Double, meters: Double): Double = {
    var lo = 0.0; var hi = 0.01
    while (hi - lo > 1e-13) {
      val mid = (lo + hi) / 2
      if (Geodesy.haversineMeters(base, base, base + mid, base) < meters) lo = mid
      else hi = mid
    }
    (lo + hi) / 2
  }

  test("proximity parity: 99m query points match 6 of 8 at the exact radius boundary") {
    import spark.implicits._
    // data: a1..a4 / b1..b4 at POINT(45 45)..(48 48)
    val data = (for (name <- Seq("a", "b"); v <- 45 to 48)
      yield (s"$name${v - 44}", v.toDouble, v.toDouble)).toDF("fid", "lon", "lat")
    // query points exactly 99 m east of (45,45), (46,46), (47,47)
    val centers = Seq(45.0, 46.0, 47.0).zipWithIndex.map { case (b, i) =>
      (s"${i + 1}", b + eastOffsetDeg(b, 99.0), b)
    }.toDF("qid", "clon", "clat")
    def hits(radius: Double): Long =
      SpatioTemporal.proximityJoin(centers, "clon", "clat", data, "lon", "lat", radius)
        .select("fid").distinct().count()
    // ProximitySearchProcessTest lines 110-116 and 154-160
    assert(hits(30) === 0L)
    assert(hits(50) === 0L)
    assert(hits(90) === 0L)
    assert(hits(98) === 0L)
    assert(hits(99.0001) === 6L)
    assert(hits(99.1) === 6L)
    assert(hits(100) === 6L)
    assert(hits(101) === 6L)
  }

  // --------------------------------------------------------------- unique

  private lazy val uniqueDf: DataFrame = {
    import spark.implicits._
    // UniqueProcessTest lines 50-58 (weights as Double, charles has a null)
    Seq(
      ("alice", Some(20.0), "2012-01-01T12:00:00Z"),
      ("alice", Some(25.0), "2012-01-01T12:00:00Z"),
      ("bill", Some(21.0), "2013-01-01T12:00:00Z"),
      ("bill", Some(22.0), "2013-01-01T12:00:00Z"),
      ("bill", Some(23.0), "2013-01-01T12:00:00Z"),
      ("bob", Some(30.0), "2014-01-01T12:00:00Z"),
      ("charles", Some(40.0), "2014-01-01T12:30:00Z"),
      ("charles", None, "2014-01-01T12:30:00Z")
    ).toDF("name", "weight", "dtg_s")
      .withColumn("dtg", to_timestamp(col("dtg_s"))).drop("dtg_s")
      .withColumn("geom", st.point(lit(45.0), lit(49.0)))
  }

  private def uniqueNames(df: DataFrame): Set[String] =
    df.select("name").distinct().collect().map(_.getString(0)).toSet

  test("unique parity: distinct values, parent/own/combined ECQL filters") {
    assert(uniqueNames(uniqueDf) === Set("alice", "bill", "bob", "charles"))
    assert(uniqueNames(Ecql.where(uniqueDf, "name LIKE 'b%'")) === Set("bill", "bob"))
    // parent + own filter compose by conjunction (AttributeVisitor.combineFilters)
    assert(uniqueNames(Ecql.where(Ecql.where(uniqueDf, "name LIKE 'b%'"), "weight > 25"))
      === Set("bob"))
  }

  test("unique parity: histogram counts and both sort orders") {
    val hist = uniqueDf.groupBy("name").agg(count(lit(1)).as("count"))
    val counts = hist.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // UniqueProcessTest lines 140-150: null weight still counts the row
    assert(counts === Map("alice" -> 2L, "bill" -> 3L, "bob" -> 1L, "charles" -> 2L))
    // sort by value DESC (lines 159-164)
    assert(hist.orderBy(desc("name")).collect().map(_.getString(0)).toSeq
      === Seq("charles", "bob", "bill", "alice"))
    // sort by histogram DESC, ties by value (lines 185-190)
    assert(hist.orderBy(desc("count"), asc("name")).collect().map(_.getString(0)).toSeq
      === Seq("bill", "alice", "charles", "bob"))
  }

  // ----------------------------------------------------------------- tube

  /** The reference's TubeBuilder converts speed×time meters to a degree
    * buffer via the latitude-degree equivalent (metersToDegrees,
    * TubeBuilder.scala:61-68). */
  private def tubeBufferDeg(meters: Double): Double = meters / 111319.49079327358

  test("tube parity: point tube returns the 4 b features; later-dated c features fall outside") {
    import spark.implicits._
    // TubeSelectProcessTest tests 1-2: a/b at 2011-01-01, c at 2011-01-02,
    // all at POINT(45 45)..(48 48); tube = type a, maxSpeed=1 maxTime=1
    val track = (45 to 48).map(v => (s"a${v - 44}", v.toDouble, v.toDouble, 0L))
      .toDF("tid", "tlon", "tlat", "tsec")
    val data = ((45 to 48).map(v => (s"b${v - 44}", "b", v.toDouble, v.toDouble, 0L)) ++
      (45 to 48).map(v => (s"c${v - 44}", "c", v.toDouble, v.toDouble, 86400L)))
      .toDF("fid", "type", "lon", "lat", "sec")
    val got = SpatioTemporal.tubeSelect(track, "tid", "tlon", "tlat", "tsec",
        data, "fid", "lon", "lat", "sec", tubeBufferDeg(1.0), tolSec = 1L)
      .select("fid").distinct().collect().map(_.getString(0)).toSet
    assert(got === Set("b1", "b2", "b3", "b4"))
  }

  /** 10×10 grid fixture of TubeSelectProcessTest test 3: types a and b at
    * every integer (lon, lat) in [40,50)². */
  private lazy val tubeGrid: DataFrame = {
    import spark.implicits._
    var i = 0
    val rows = for (name <- Seq("a", "b"); lon <- 40 until 50; lat <- 40 until 50) yield {
      i += 1; (s"$name$i", name, lon.toDouble, lat.toDouble, 0L)
    }
    rows.toDF("fid", "type", "lon", "lat", "sec")
      .withColumn("geom", st.point(col("lon"), col("lat")))
  }

  private def tubeGridHits(bufferMeters: Double): Seq[(String, Double)] = {
    // track selected with the reference's own ECQL (test 3 line 179)
    val track = Ecql.where(tubeGrid,
        "BBOX(geom, 39.999999999,39.999999999, 40.00000000001, 50.000000001) AND type = 'a'")
      .select(col("fid").as("tid"), col("lon").as("tlon"),
        col("lat").as("tlat"), col("sec").as("tsec"))
    val data = Ecql.where(tubeGrid, "type <> 'a'")
    SpatioTemporal.tubeSelect(track, "tid", "tlon", "tlat", "tsec",
        data, "fid", "lon", "lat", "sec", tubeBufferDeg(bufferMeters), tolSec = 1000L)
      .select("fid").distinct().collect().map(_.getString(0)).toSeq
      .map(id => id -> tubeGrid.filter(col("fid") === id).head().getDouble(2))
  }

  test("tube parity: 110 m/s x 1000 s stays under one degree - 10 results on the lon-40 column") {
    val got = tubeGridHits(110 * 1000.0)
    assert(got.size === 10)
    assert(got.forall { case (id, lon) => id.startsWith("b") && lon === 40.0 })
  }

  test("tube parity: 112 km crosses one degree - 20 results on lon 40 and 41") {
    val got = tubeGridHits(112 * 1000.0)
    assert(got.size === 20)
    assert(got.forall { case (id, lon) => id.startsWith("b") && (lon === 40.0 || lon === 41.0) })
  }

  test("tube parity: a line tube intersects points, a line and a polygon (6 results)") {
    import spark.implicits._
    // TubeSelectProcessTest 'should handle all geometries' (lines 236-303)
    val bGeoms = ((45 to 48).map(v => (s"b$v", s"POINT(40 $v)")) ++
      Seq(("b-line", "LINESTRING(40 40, 40 50)"),
          ("b-poly", "POLYGON((40 40, 41 40, 41 41, 40 41, 40 40))")))
      .toDF("fid", "wkt")
      .select(col("fid"), st.geomFromWKT(col("wkt")).as("bgeom"))
    val tube = Seq("LINESTRING(40 40, 40 50)").toDF("wkt")
      .select(st.buffer(st.geomFromWKT(col("wkt")), lit(tubeBufferDeg(112 * 1000.0))).as("tubegeom"))
    val got = SpatioTemporal.xzIntersectsJoin(bGeoms, "bgeom", tube, "tubegeom")
      .select("fid").distinct().collect().map(_.getString(0)).toSet
    assert(got === Set("b45", "b46", "b47", "b48", "b-line", "b-poly"))
  }

  // ---------------------------------------------------------------- query

  test("query parity: ECQL filter composition over the a/b fixture") {
    import spark.implicits._
    // QueryProcessTest fixture: a/b at POINT(45 45)..(48 48)
    val df = (for (name <- Seq("a", "b"); v <- 45 to 48)
      yield (s"$name${v - 44}", name, v.toDouble, v.toDouble))
      .toDF("fid", "type", "lon", "lat")
      .withColumn("geom", st.point(col("lon"), col("lat")))
    assert(df.count() === 8L)
    assert(Ecql.where(df, "type = 'b'").count() === 4L)
    // parent filter + process filter compose by conjunction
    assert(Ecql.where(Ecql.where(df, "type = 'b' OR type = 'a'"), "type = 'a'").count() === 4L)
    // bbox(45,45,46,46) catches both types at (45,45) and (46,46)
    val inBox = Ecql.where(df, "bbox(geom, 45.0, 45.0, 46.0, 46.0)")
    assert(inBox.count() === 4L)
    assert(inBox.select("fid").collect().map(_.getString(0)).toSet
      === Set("a1", "b1", "a2", "b2"))
  }

  // ----------------------------------------------------- temporal density

  test("temporal density parity: 150 same-instant features collapse into one bucket of 24") {
    import spark.implicits._
    // TemporalDensityProcessTest: 150 features at 2012-01-01T19:00:00Z,
    // 24 buckets over [2012-01-01, 2012-01-02) — one bucket, total weight 150
    val df = (0 until 150).map(i => (i.toString, "2012-01-01T19:00:00Z"))
      .toDF("fid", "dtg_s").withColumn("dtg", to_timestamp(col("dtg_s")))
    val buckets = Density.temporal(df, col("dtg"), "hour")
      .filter(col("bucket") >= to_timestamp(lit("2012-01-01T00:00:00Z")) &&
        col("bucket") < to_timestamp(lit("2012-01-02T00:00:00Z")))
      .collect()
    assert(buckets.length === 1)
    assert(buckets.head.getAs[Long]("n") === 150L)
    assert(buckets.head.getAs[java.sql.Timestamp]("bucket").toInstant
      === java.time.Instant.parse("2012-01-01T19:00:00Z"))
  }
}
