package graft.pages

import graft.functions.st
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The engine's primary input: a Common-Crawl-style web-page table
 * (url, warc_ts, html, text, lang) per BASELINE.json input_hint, derived
 * deterministically from the driver's `documents` table, plus a synthetic
 * `regions` polygon table (join right-hand side, FIXTURES.md F2).
 *
 * Geoparsing (text → lon/lat) is a *pure projection* keyed on doc_id: the
 * `text` column is passed through untouched (byte-identical-text-per-url
 * invariant). The lon/lat formulas are SQL fragments shared verbatim
 * between Spark (`selectExpr`) and the DuckDB oracle; they use only
 * IEEE-754-exact operations (int64 *, +, %, double / by a constant, CASE),
 * so both engines produce bit-identical coordinates.
 *
 * Spatial skew is deliberate (SURVEY.md §7.4): ~30% of pages land in three
 * 2°x2° "city" hot spots; the rest are uniform over the world. Coordinates
 * have 1/1000-degree granularity while region edges sit on a +0.0005 degree
 * half-step, so no point ever lies exactly on a region boundary (removes
 * open/closed-boundary ambiguity between JTS predicates and SQL ranges).
 */
object WebPages {

  // hash mixers (LCG constants; values fit int64 for doc_id < 8e9)
  val H1 = "((doc_id * 1103515245 + 12345) % 2147483648)"
  val H2 = "((doc_id * 69069 + 1234567) % 2147483648)"
  val H3 = "((doc_id * 40692 + 777) % 2147483648)"

  // All double literals below use exponent notation (e.g. 1e3, 5e-4):
  // plain `1000.0` parses as DECIMAL in both Spark SQL and DuckDB, whose
  // precision rules differ; `1e3` is DOUBLE in both → bit-identical math.

  /** lon ∈ [-180, 180): 3 hot clusters (30%) + uniform world (70%). */
  val LON_EXPR: String =
    s"""CASE ($H1 % 10)
       | WHEN 0 THEN -75e0 + (($H2 % 2000) / 1e3)
       | WHEN 1 THEN 135e-2 + (($H2 % 2000) / 1e3)
       | WHEN 2 THEN 1387e-1 + (($H2 % 2000) / 1e3)
       | ELSE (($H2 % 360000) / 1e3) - 180e0
       |END""".stripMargin.replace("\n", " ")

  /** lat ∈ [-85, 85): clusters at NYC/Paris/Tokyo latitudes. */
  val LAT_EXPR: String =
    s"""CASE ($H1 % 10)
       | WHEN 0 THEN 397e-1 + (($H3 % 2000) / 1e3)
       | WHEN 1 THEN 4785e-2 + (($H3 % 2000) / 1e3)
       | WHEN 2 THEN 347e-1 + (($H3 % 2000) / 1e3)
       | ELSE (($H3 % 170000) / 1e3) - 85e0
       |END""".stripMargin.replace("\n", " ")

  /** Crawl-timestamp seconds within a 30-day window (pure int64 math so the
   *  oracle reproduces it exactly; also the epoch base of warc_ts). */
  val SEC_EXPR = "((doc_id * 77773) % 2592000)"

  /** Pages with geoparsed lon/lat + WKB point geometry. */
  def pages(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = docs.selectExpr(
      "doc_id", "text", "lang",
      s"$LON_EXPR AS lon",
      s"$LAT_EXPR AS lat",
      s"$SEC_EXPR AS sec")
    base
      .withColumn("url", concat(lit("https://host"), (col("doc_id") % 97).cast("string"),
        lit(".example/"), col("doc_id").cast("string")))
      .withColumn("warc_ts", expr("timestamp'2011-06-01 00:00:00' + make_dt_interval(0, 0, 0, doc_id % 2592000)"))
      .withColumn("html", concat(lit("<html><body>"), col("text"), lit("</body></html>")).cast("binary"))
      .withColumn("geom", st.point(col("lon"), col("lat")))
  }
  // $"..." sugar needs an implicits import at call sites; use col() here:
  private def $(name: String) = col(name)

  // ---- regions (join RHS): boxes derived from the supplier table ----
  val RH1 = "((s_suppkey * 48271 + 11) % 2147483648)"
  val RH2 = "((s_suppkey * 16807 + 7) % 2147483648)"
  val RH3 = "((s_suppkey * 65539 + 3) % 2147483648)"
  val R_XMIN = s"((($RH1 % 340000) / 1e3) - 180e0 + 5e-4)"
  val R_YMIN = s"((($RH3 % 150000) / 1e3) - 85e0 + 5e-4)"
  val R_W = s"((($RH2 % 20000) / 1e3) + 5e-1)"
  val R_H = s"((($RH2 % 10000) / 1e3) + 5e-1)"
  val R_XMAX = s"($R_XMIN + $R_W)"
  val R_YMAX = s"($R_YMIN + $R_H)"

  /** Region boxes (FIXTURES.md F2) with WKB geometry. */
  def regions(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/supplier.parquet").selectExpr(
      "s_suppkey AS region_id",
      s"$R_XMIN AS xmin", s"$R_YMIN AS ymin", s"$R_XMAX AS xmax", s"$R_YMAX AS ymax")
      .withColumn("region_geom", st.makeBox($("xmin"), $("ymin"), $("xmax"), $("ymax")))

  // ---- nation-derived fixtures: 25 boxes / centers (small build side) ----
  val NH1 = "((n_nationkey * 48271 + 101) % 2147483648)"
  val NH2 = "((n_nationkey * 16807 + 53) % 2147483648)"
  val N_XMIN = s"((($NH1 % 300000) / 1e3) - 160e0 + 5e-4)"
  val N_YMIN = s"((($NH2 % 130000) / 1e3) - 75e0 + 5e-4)"
  val N_XMAX = s"($N_XMIN + ((($NH2 % 30000) / 1e3) + 1e0))"
  val N_YMAX = s"($N_YMIN + ((($NH1 % 16000) / 1e3) + 1e0))"
  val N_CLON = s"((($NH1 % 360000) / 1e3) - 180e0)"
  val N_CLAT = s"((($NH2 % 160000) / 1e3) - 80e0)"

  def nationBoxes(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/nation.parquet").selectExpr(
      "n_nationkey",
      s"$N_XMIN AS xmin", s"$N_YMIN AS ymin", s"$N_XMAX AS xmax", s"$N_YMAX AS ymax")
      .withColumn("nation_geom", st.makeBox($("xmin"), $("ymin"), $("xmax"), $("ymax")))

  def nationCenters(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/nation.parquet").selectExpr(
      "n_nationkey", s"$N_CLON AS clon", s"$N_CLAT AS clat")
      .withColumn("center_geom", st.point($("clon"), $("clat")))

  // ---- synthetic tracks (tube-select LHS): derived from events ----
  val TH1 = "((event_id * 22695477 + 1) % 2147483648)"
  val TH2 = "((event_id * 134775813 + 5) % 2147483648)"
  val T_LON = s"((($TH1 % 360000) / 1e3) - 180e0)"
  val T_LAT = s"((($TH2 % 170000) / 1e3) - 85e0)"
  val T_SEC = "((event_id * 7919) % 2592000)"

  /** Track points (tid, t_lon, t_lat, t_sec): 5 interleaved tracks. */
  def track(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet").selectExpr(
      "event_id % 5 AS tid", s"$T_LON AS t_lon", s"$T_LAT AS t_lat", s"$T_SEC AS t_sec")

  // ---- geoparse: explicit geo metadata in page html ----
  // ~70% of docs carry a `<meta name="geo.position" content="lat;lon">`
  // head tag (the public geo-tagging convention); coordinates are
  // milli-degree integers rendered as exact 3-decimal strings, so the
  // string→double cast is IEEE-correctly-rounded identically in Spark and
  // DuckDB (the oracle computes the same values arithmetically).
  val GP1 = "((doc_id * 48611 + 99) % 2147483648)"
  val GP2 = "((doc_id * 39607 + 17) % 2147483648)"
  val GP_LON_MILLI = s"(($GP1 % 360000) - 180000)"
  val GP_LAT_MILLI = s"(($GP2 % 170000) - 85000)"
  val GP_TAGGED = s"(($GP1 % 10) < 7)"

  /** Milli-degree int column → exact 3-decimal degree string ("-12.045"). */
  private def milliToDecStr(m: Column): Column =
    concat(when(m < 0, lit("-")).otherwise(lit("")),
      (abs(m) / 1000).cast("long").cast("string"), lit("."),
      lpad((abs(m) % 1000).cast("string"), 3, "0"))

  /** Web pages whose html head carries a geo.position meta tag for ~70% of
    * docs (the geoparse fixture; text rides through byte-identical). */
  def pagesWithGeoTags(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text", "lang",
        s"$GP_TAGGED AS __tagged", s"$GP_LON_MILLI AS __lonm", s"$GP_LAT_MILLI AS __latm")
    docs.withColumn("html",
        concat(lit("<html><head>"),
          when(col("__tagged"),
            concat(lit("<meta name=\"geo.position\" content=\""),
              milliToDecStr(col("__latm")), lit(";"), milliToDecStr(col("__lonm")),
              lit("\">"))).otherwise(lit("")),
          lit("</head><body>"), col("text"), lit("</body></html>")).cast("binary"))
      .drop("__tagged", "__lonm", "__latm")
  }

  /** geo.position content pattern: "lat;lon" decimal degrees. */
  private val GeoTagRe = "<meta name=\"geo\\.position\" content=\"([^\";]+);([^\"]+)\">"

  /**
   * Geoparse: extract the geo.position meta tag from the html column into
   * typed lon/lat + WKB point geometry. A pure PROJECTION — the text
   * column passes through untouched (the byte-identical-text-per-url
   * invariant), rows without a tag yield nulls, and the extraction is a
   * codegen'd regexp over the binary→string cast (no UDF). The reference's
   * analog is the ingest converter DSL attaching geometries to records
   * (geomesa-convert/.../Transformers.scala); here it runs as a Catalyst
   * projection over 10^12 rows without a shuffle.
   */
  def geoparse(pages: DataFrame, htmlName: String = "html"): DataFrame = {
    val htmlStr = col(htmlName).cast("string")
    val latS = regexp_extract(htmlStr, GeoTagRe, 1)
    val lonS = regexp_extract(htmlStr, GeoTagRe, 2)
    pages
      .withColumn("geo_lat", when(latS =!= "", latS.cast("double")))
      .withColumn("geo_lon", when(lonS =!= "", lonS.cast("double")))
      .withColumn("geo_geom",
        when(col("geo_lon").isNotNull && col("geo_lat").isNotNull,
          st.point(col("geo_lon"), col("geo_lat"))))
  }

  /** Deterministic synthetic page-point table of arbitrary size (no I/O —
   *  generated from spark.range by the same LCG geoparse formulas, so the
   *  skew profile matches the real fixture: 30% in 3 city hot spots).
   *  Bench-only: lets the scaling harness size CPU-bound work freely. */
  def syntheticPages(spark: SparkSession, rows: Long, partitions: Int = 0): DataFrame = {
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism * 4
    spark.range(0, rows, 1, p).selectExpr(
        "id AS doc_id", s"$LON_EXPR AS lon", s"$LAT_EXPR AS lat", s"$SEC_EXPR AS sec")
      .withColumn("geom", st.point($("lon"), $("lat")))
  }

  /** Deterministic synthetic documents table (doc_id, text) of arbitrary
    * size for dedup benchmarks: ~20 dictionary words per doc; every
    * 17th doc near-duplicates its predecessor (same base words, distinct
    * tail token → shingle-Jaccard ≈ 0.73, above the 0.6 near-dup bar but
    * below exact equality). */
  def syntheticDocs(spark: SparkSession, rows: Long, partitions: Int = 0): DataFrame = {
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism * 4
    val dict = typedlit((0 until 500).map(i => f"word$i%03d"))
    spark.range(0, rows, 1, p)
      .selectExpr("id AS doc_id",
        "CASE WHEN id % 17 = 0 AND id > 0 THEN id - 1 ELSE id END AS seed")
      .withColumn("text", concat_ws(" ",
        (0 until 20).map(j =>
          element_at(dict, (pmod(hash(col("seed") * 31 + j), lit(500)) + 1).cast("int"))) :+
          concat(lit("tail"), (col("doc_id") % 7).cast("string")): _*))
      .select("doc_id", "text")
  }

  /** Synthetic track of arbitrary size (same shape as [[track]]). */
  def syntheticTrack(spark: SparkSession, rows: Long, partitions: Int = 0): DataFrame = {
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism * 4
    spark.range(0, rows, 1, p).selectExpr(
      "id % 50 AS tid",
      s"${T_LON.replace("event_id", "id")} AS t_lon",
      s"${T_LAT.replace("event_id", "id")} AS t_lat",
      s"${T_SEC.replace("event_id", "id")} AS t_sec")
  }
}
