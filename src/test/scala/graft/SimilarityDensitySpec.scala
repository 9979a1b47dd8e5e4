package graft

import graft.ops.{Density, Similarity}
import org.apache.spark.sql.functions._

/** Similarity search + density/tile aggregation vs scala oracles. */
class SimilarityDensitySpec extends SparkSpec {
  import spark.implicits._

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("bruteTopK == exact sorted-cosine oracle on embeddings table") {
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val all = df.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val q = SparkEntry.annQueryVec
    val expect = all.map { case (id, v) => (id, cosine(v, q)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSeq
    val got = Similarity.bruteTopK(df, "embedding", "vec_id", q, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got === expect)
  }

  test("annTopK returns a subset of the bucket, ranked identically to brute force within it") {
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = SparkEntry.annQueryVec
    val ann = Similarity.annTopK(df, "embedding", "vec_id", q, 10, bits = 4)
      .select("vec_id", "cos").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ann.nonEmpty, "query bucket unexpectedly empty at 4 bits")
    // cosines must be non-increasing
    ann.sliding(2).foreach { case Array((_, c1), (_, c2)) => assert(c1 >= c2); case _ => }
    // every reported cosine matches the exact oracle value
    val all = df.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    // float-product accumulation order differs from the double oracle
    ann.foreach { case (id, c) => assert(math.abs(c - cosine(all(id), q)) < 1e-5) }
  }

  test("density grid == manual binning oracle") {
    val pts = Seq((-75.0, 40.0), (-75.0, 40.0), (10.0, 50.0), (139.0, 35.0), (-200.0, 0.0))
    val df = pts.toDF("lon", "lat")
    val got = Density.grid(df, $"lon", $"lat", -180, -85, 180, 85, 64, 32)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    def cx(lon: Double) = math.floor((lon + 180) / 360.0 * 64).toLong
    def cy(lat: Double) = math.floor((lat + 85) / 170.0 * 32).toLong
    val expect = pts.filter { case (lon, lat) => lon >= -180 && lon < 180 && lat >= -85 && lat < 85 }
      .groupBy { case (lon, lat) => (cx(lon), cy(lat)) }.view.mapValues(_.size.toLong).toMap
    assert(got === expect)
  }

  test("surface tile: max-per-cell") {
    val df = Seq((1.0, 1.0, 5.0), (1.1, 1.1, 9.0), (50.0, 20.0, 2.0)).toDF("lon", "lat", "v")
    val got = Density.surface(df, $"lon", $"lat", $"v", 0, 0, 90, 45, 8, 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got((0L, 0L)) === 9.0)
    assert(got((4L, 3L)) === 2.0)
  }

  test("temporal density == date_trunc bucketing") {
    val df = Seq("2024-01-01 10:15:00", "2024-01-01 10:45:00", "2024-01-01 11:05:00")
      .toDF("s").select(to_timestamp($"s").as("ts"))
    val got = Density.temporal(df, $"ts", "hour")
      .select(date_format($"bucket", "HH").as("h"), $"n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === Map("10" -> 2L, "11" -> 1L))
  }
}
