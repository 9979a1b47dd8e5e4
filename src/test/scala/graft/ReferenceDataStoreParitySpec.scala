package graft

import graft.cql.Ecql
import graft.functions.st
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Parity with the portable query cases of the reference's datastore suite
 * (geomesa-core/src/test/.../data/AccumuloDataStoreTest.scala): the same
 * fixtures and the same expected ids/counts, with the reference's
 * CQL/FilterFactory filters expressed as the equivalent ECQL strings
 * through this engine's `Ecql.where`. The Accumulo-specific cases
 * (authorizations, namespaces, table sharing, version migration) have no
 * analog here; every geometry/time/filter-semantics case is mirrored.
 *
 * Fixture provenance:
 *  - default point POINT(45 49), fid-1: AccumuloDataStoreDefaults.scala:36
 *  - between-query features:            AccumuloDataStoreTest.scala:386-433
 *  - allThePoints (-180..180, lon/2):   iterators/TestData.scala:185-189
 */
class ReferenceDataStoreParitySpec extends SparkSpec {

  private def pts(rows: Seq[(String, Double, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("fid", "lon", "lat")
      .withColumn("geom", st.point(col("lon"), col("lat")))
  }

  private def fids(df: DataFrame, ecql: String): Seq[String] =
    Ecql.where(df, ecql).select("fid").collect().map(_.getString(0)).toSeq.sorted

  // ----------------------------------------------------- DWithin (:197-219)

  test("process a DWithin query correctly (AccumuloDataStoreTest:197-219)") {
    // one feature at the default point; the query point is ~1.1 m away and
    // the reference expects exactly fid-1 back at a 100 m radius
    val df = pts(Seq(("fid-1", 45.0, 49.0)))
    assert(fids(df, "DWITHIN(geom, POINT(45.000001 48.99999), 100.0, meters)") ===
      Seq("fid-1"))
  }

  // ------------------------------------- OR inclusion-exclusion (:221-268)

  test("process an OR query correctly: inclusion-exclusion (AccumuloDataStoreTest:221-268)") {
    // the reference draws 1000 uniform points in ±0.001 deg of the origin
    // (time-seeded there; seeded here for determinism — the asserted
    // property |UR| + |LL| = |UR ∪ LL| + |UR ∩ LL| holds for any draw)
    val rng = new scala.util.Random(0)
    val rows = (0 until 1000).map { i =>
      (s"fid-$i", rng.nextDouble() * 0.002 - 0.001, rng.nextDouble() * 0.002 - 0.001)
    }
    val df = pts(rows)
    val ur = "DWITHIN(geom, POINT(0.0005 0.0005), 150.0, meters)"
    val ll = "DWITHIN(geom, POINT(-0.0005 -0.0005), 150.0, meters)"
    val urN = Ecql.where(df, ur).count()
    val llN = Ecql.where(df, ll).count()
    val orN = Ecql.where(df, s"$ur OR $ll").count()
    val andN = Ecql.where(df, s"$ur AND $ll").count()
    assert(urN + llN === orN + andN)
    // non-vacuous: both radii catch points, and they genuinely differ
    assert(urN > 0 && llN > 0 && andN < urN.min(llN))
  }

  // -------------------------------------------- BETWEEN queries (:386-433)

  test("handle between queries (AccumuloDataStoreTest:386-413)") {
    val df = pts(Seq(("fid-1xxx", 50.0, 49.0)))
      .withColumn("dtg", to_timestamp(lit("2014-01-01T12:30:00Z")))
    val hit = Ecql.where(df,
      "BBOX(geom, 45, 45, 55, 55) AND dtg BETWEEN '2013-01-01T00:00:00.000Z' AND '2015-01-02T00:00:00.000Z'")
    // the reference reads it back through an Array("geom") transform
    val got = hit.select("fid", "lon", "lat").collect()
    assert(got.map(_.getString(0)).toSeq === Seq("fid-1xxx"))
    assert(got.head.getDouble(1) === 50.0 && got.head.getDouble(2) === 49.0)
  }

  test("handle between intra-day queries (AccumuloDataStoreTest:415-433)") {
    val df = pts(Seq(("fid-2", 50.0, 49.0)))
      .withColumn("dtg", to_timestamp(lit("2014-01-01T12:30:00Z")))
    assert(fids(df,
      "BBOX(geom, 40, 40, 60, 60) AND dtg BETWEEN '2014-01-01T12:00:00.000Z' AND '2014-01-01T13:00:00.000Z'") ===
      Seq("fid-2"))
    // and the hour before the feature is empty
    assert(fids(df,
      "BBOX(geom, 40, 40, 60, 60) AND dtg BETWEEN '2014-01-01T11:00:00.000Z' AND '2014-01-01T12:00:00.000Z'") ===
      Seq.empty)
  }

  // ------------------------------------------------ IDL handling (:453-495)

  /** TestData.allThePoints: POINT(lon, lon/2) for lon in -180..180 —
    * integer division, as in the reference (`(lon / 2).toString`). */
  private lazy val allThePoints: DataFrame =
    pts((-180 to 180).map(lon => (lon.toString, lon.toDouble, (lon / 2).toDouble)))

  test("IDL: default layer preview, bigger than earth (AccumuloDataStoreTest:463-468)") {
    assert(Ecql.where(allThePoints, "BBOX(geom, -230, -110, 230, 110)").count() === 361L)
  }

  test("IDL: >180-lon-diff non-wrapping bbox (AccumuloDataStoreTest:470-475)") {
    assert(Ecql.where(allThePoints, "BBOX(geom, -100, 1.1, 100, 4.1)").count() === 6L)
  }

  test("IDL: small wrapping bboxes (AccumuloDataStoreTest:477-484)") {
    assert(Ecql.where(allThePoints,
      "BBOX(geom, -181.1, -90, -175.1, 90) OR BBOX(geom, 175.1, -90, 181.1, 90)").count() === 10L)
  }

  test("IDL: large wrapping bboxes (AccumuloDataStoreTest:486-493)") {
    assert(Ecql.where(allThePoints,
      "BBOX(geom, -181.1, -90, 40.1, 90) OR BBOX(geom, 175.1, -90, 181.1, 90)").count() === 226L)
  }
}
