package graft

import graft.geom.Geodesy
import graft.ops.{Similarity, SpatioTemporal}
import graft.pages.WebPages
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Tube-select / proximity / XZ join / embedding near-dup vs brute-force
  * oracles on the sf0.001 fixtures. */
class SpatioTemporalSpec extends SparkSpec {
  private def asL(r: Row, i: Int): Long = r.get(i) match {
    case l: java.lang.Long => l
    case n: java.lang.Number => n.longValue()
  }

  test("tubeSelect == brute-force (dist AND time) oracle; broadcast == shuffle") {
    val trackRows = WebPages.track(spark, sfDir)
      .collect().map(r => (asL(r, 0), r.getDouble(1), r.getDouble(2), asL(r, 3)))
    val pageRows = WebPages.pages(spark, sfDir).select("doc_id", "lon", "lat", "sec")
      .collect().map(r => (asL(r, 0), r.getDouble(1), r.getDouble(2), asL(r, 3)))
    val buffer = 2.0; val tol = 172800L
    val expect = (for {
      (tid, tx, ty, ts) <- trackRows
      (did, lon, lat, sec) <- pageRows
      if (lon - tx) * (lon - tx) + (lat - ty) * (lat - ty) < buffer * buffer &&
        math.abs(sec - ts) <= tol
    } yield (tid, did)).toSet
    assert(expect.nonEmpty, "fixture produced no tube matches — widen buffer")

    def run(bcast: Boolean) = SpatioTemporal.tubeSelect(
        WebPages.track(spark, sfDir), "tid", "t_lon", "t_lat", "t_sec",
        WebPages.pages(spark, sfDir).select("doc_id", "lon", "lat", "sec"),
        "doc_id", "lon", "lat", "sec", buffer, tol, broadcastTrack = Some(bcast))
      .collect().map(r => (asL(r, 0), asL(r, 1))).toSet
    assert(run(true) === expect)
    assert(run(false) === expect)
  }

  test("proximityJoin (meters) == brute-force haversine oracle") {
    val ctrs = WebPages.nationCenters(spark, sfDir).select("n_nationkey", "clon", "clat")
      .collect().map(r => (asL(r, 0), r.getDouble(1), r.getDouble(2)))
    val pageRows = WebPages.pages(spark, sfDir).select("doc_id", "lon", "lat")
      .collect().map(r => (asL(r, 0), r.getDouble(1), r.getDouble(2)))
    val meters = 250000.0
    val expect = (for {
      (nk, cx, cy) <- ctrs
      (did, lon, lat) <- pageRows
      if Geodesy.haversineMeters(cx, cy, lon, lat) < meters
    } yield (nk, did)).toSet
    val got = SpatioTemporal.proximityJoin(
        WebPages.nationCenters(spark, sfDir).select("n_nationkey", "clon", "clat"),
        "clon", "clat",
        WebPages.pages(spark, sfDir).select("doc_id", "lon", "lat"), "lon", "lat", meters)
      .select("n_nationkey", "doc_id").collect().map(r => (asL(r, 0), asL(r, 1)))
    assert(got.length === got.toSet.size, "duplicate pairs")
    assert(got.toSet === expect)
    assert(expect.nonEmpty)
  }

  test("xzIntersectsJoin == box-overlap oracle, emits no duplicate pairs (single-cell index)") {
    val nb = WebPages.nationBoxes(spark, sfDir)
    val rg = WebPages.regions(spark, sfDir)
    val nBoxes = nb.select("n_nationkey", "xmin", "ymin", "xmax", "ymax").collect()
      .map(r => (asL(r, 0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val rBoxes = rg.select("region_id", "xmin", "ymin", "xmax", "ymax").collect()
      .map(r => (asL(r, 0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val expect = (for {
      (nk, ax0, ay0, ax1, ay1) <- nBoxes
      (rid, bx0, by0, bx1, by1) <- rBoxes
      if !(ax1 < bx0 || bx1 < ax0 || ay1 < by0 || by1 < ay0)
    } yield (nk, rid)).toSet
    val got = SpatioTemporal.xzIntersectsJoin(
        nb.select("n_nationkey", "nation_geom"), "nation_geom",
        rg.select("region_id", "region_geom"), "region_geom")
      .select("n_nationkey", "region_id").collect().map(r => (asL(r, 0), asL(r, 1)))
    assert(got.length === got.toSet.size, "xz join must not need dedupe")
    assert(got.toSet === expect)
  }

  test("xzIntersectsJoin: oversized windows degrade to a coarser res instead of throwing") {
    import spark.implicits._
    val nb = WebPages.nationBoxes(spark, sfDir)
    // half-world window: at maxRes=10 the cumulative cover would blow the
    // 65536 budget and previously threw at runtime
    val win = Seq((1L, -170.0, -80.0, 10.0, 60.0)).toDF("wid", "x0", "y0", "x1", "y1")
      .withColumn("win_geom", graft.functions.st.makeBox(col("x0"), col("y0"), col("x1"), col("y1")))
    val nBoxes = nb.select("n_nationkey", "xmin", "ymin", "xmax", "ymax").collect()
      .map(r => (asL(r, 0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val expect = nBoxes.collect {
      case (nk, ax0, ay0, ax1, ay1) if !(ax1 < -170.0 || 10.0 < ax0 || ay1 < -80.0 || 60.0 < ay0) => nk
    }.toSet
    val got = SpatioTemporal.xzIntersectsJoin(
        nb.select("n_nationkey", "nation_geom"), "nation_geom",
        win.select("wid", "win_geom"), "win_geom", maxRes = 10)
      .select("n_nationkey").collect().map(r => asL(r, 0)).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("embedding nearDupPairs: candidates restricted to same-sign buckets; cosine verified") {
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val all = df.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = Similarity.nearDupPairs(df, "embedding", "vec_id", 0.5, bits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val lookup = all.toMap
    got.foreach { case (a, b, c) =>
      assert(a < b)
      assert(math.abs(c - cos(lookup(a), lookup(b))) < 1e-5)
      assert(c >= 0.5)
    }
  }

  test("ivfTopK: every result is a true cosine; top result matches brute force when probing most lists") {
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = SparkEntry.annQueryVec
    val brute = Similarity.bruteTopK(df, "embedding", "vec_id", q, 10)
      .select("vec_id").collect().map(_.getLong(0))
    val ivfAll = Similarity.ivfTopK(df, "embedding", "vec_id", q, 10, nlist = 8, nprobe = 8)
      .select("vec_id").collect().map(_.getLong(0))
    // probing all lists == brute force
    assert(ivfAll.toSeq === brute.toSeq)
    val ivf = Similarity.ivfTopK(df, "embedding", "vec_id", q, 10, nlist = 8, nprobe = 3)
      .select("vec_id").collect().map(_.getLong(0))
    assert(ivf.nonEmpty)
    // partial probe: results are a subset of the corpus, ranked by true cosine
    assert(ivf.toSet.subsetOf(df.select("vec_id").collect().map(_.getLong(0)).toSet))
  }
}
