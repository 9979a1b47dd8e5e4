package graft

import graft.functions.BinEncodeRT
import graft.layout.CellLayout
import graft.ops.SpatioTemporal
import graft.pages.WebPages
import graft.sources.IngestExport
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest/export surface (S6/S10/F6), line-gap-fill tube (W3), manifest
  * count/bounds estimates (A6/A7). */
class IngestExportSpec extends SparkSpec {
  import spark.implicits._

  test("csv ingest round-trips lon/lat into a queryable geometry") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Seq((1L, -75.0, 40.0), (2L, 10.0, 50.0)).toDF("id", "lon", "lat")
      .write.option("header", "true").mode("overwrite").csv(dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("lon", DoubleType), StructField("lat", DoubleType)))
    val got = IngestExport.csv(spark, dir, schema, "lon", "lat")
    val inBox = got.filter(graft.functions.st.contains(
      graft.functions.st.makeBox(lit(-80.0), lit(35.0), lit(-70.0), lit(45.0)), col("geom")))
    assert(inBox.select("id").collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("wkt ingest + geojson/delimited export round-trip") {
    val df = Seq((7L, "POINT (3 4)")).toDF("id", "wkt")
    val geo = IngestExport.withWktGeometry(df, "wkt")
    val json = IngestExport.toGeoJson(geo, "geom", "id").head().getString(0)
    assert(json.contains("\"type\":\"Feature\"") && json.contains("[3,4]"), json)
    val delim = IngestExport.toDelimited(geo.select("id", "geom"), "geom").head()
    assert(delim.getString(1) === "POINT (3 4)")
  }

  test("geojson export renders non-point geometries (S10)") {
    val wkts = Seq(
      (1L, "LINESTRING (0 0, 1 1, 2 0.5)"),
      (2L, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"),
      (3L, "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))"),
      (4L, "GEOMETRYCOLLECTION (POINT (9 9), LINESTRING (0 0, 1 1))"))
    val df = IngestExport.withWktGeometry(wkts.toDF("id", "wkt"), "wkt")
    val out = IngestExport.toGeoJson(df, "geom", "id")
      .collect().map(_.getString(0))
    assert(out(0).contains("\"type\":\"LineString\"") && out(0).contains("[[0,0],[1,1],[2,0.5]]"), out(0))
    // polygon: exterior ring + hole, both closed
    assert(out(1).contains("\"type\":\"Polygon\"") && out(1).contains("[1,1],[2,1],[2,2],[1,2],[1,1]"), out(1))
    assert(out(2).contains("\"type\":\"MultiPolygon\""), out(2))
    assert(out(3).contains("\"type\":\"GeometryCollection\"") &&
      out(3).contains("\"geometries\":["), out(3))
    // every feature parses as JSON (round-trip through Spark's parser)
    val parsed = out.toSeq.toDF("j")
      .select(get_json_object(col("j"), "$.geometry.type").as("t")).collect().map(_.getString(0))
    assert(parsed.toSeq === Seq("LineString", "Polygon", "MultiPolygon", "GeometryCollection"))
  }

  test("avro ingest: container file round-trips typed fields (S7)") {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema: Schema = SchemaBuilder.record("page").fields()
      .requiredLong("id").requiredString("name")
      .requiredDouble("lon").requiredDouble("lat")
      .endRecord()
    val dir = java.nio.file.Files.createTempDirectory("graft_avro")
    val f = dir.resolve("part-0.avro").toFile
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    (0 until 25).foreach { i =>
      val rec = new GenericData.Record(schema)
      rec.put("id", i.toLong); rec.put("name", s"page$i")
      rec.put("lon", i * 1.5 - 10); rec.put("lat", i * 0.5)
      w.append(rec)
    }
    w.close()
    val df = IngestExport.avro(spark, dir.toString)
    assert(df.schema.fieldNames.toSeq === Seq("id", "name", "lon", "lat"))
    assert(df.count() === 25L)
    val row = df.orderBy("id").head()
    assert(row.getLong(0) === 0L && row.getString(1) === "page0" && row.getDouble(2) === -10.0)
    // the ingested frame joins the spatial path like any other source
    val withGeom = df.withColumn("geom", graft.functions.st.point(col("lon"), col("lat")))
    assert(withGeom.filter(graft.functions.st.contains(
      graft.functions.st.makeBox(lit(-11.0), lit(-1.0), lit(0.0), lit(3.0)), col("geom"))).count() > 0)
  }

  test("DMS parsing: reference format parity, bad input -> null (F9)") {
    import graft.functions.TextRT
    // reference DMSTest vectors (csv/DMSTest.scala): 38:04:31.17N with and
    // without colons; leading sign flips hemisphere
    val expected = 38.0 + (4 + 31.17 / 60.0) / 60.0
    assert(math.abs(TextRT.dmsToDeg("38:04:31.17N") - expected) < 1e-12)
    assert(math.abs(TextRT.dmsToDeg("380431.17N") - expected) < 1e-12)
    assert(math.abs(TextRT.dmsToDeg("-38:04:31.17S") - expected) < 1e-12) // sign flips S->N
    assert(math.abs(TextRT.dmsToDeg("122:20:15.5W") - -(122 + (20 + 15.5 / 60) / 60)) < 1e-12)
    assert(TextRT.dmsToDeg("38:04:61.17N").isNaN) // seconds out of range
    assert(TextRT.dmsToDeg("98:04:31.17N").isNaN) // > 90 lat
    assert(TextRT.dmsToDeg("garbage").isNaN)
    // SQL surface: null for bad input, value for good
    val rows = spark.sql(
      "SELECT dms_to_deg('38:04:31.17N') AS a, dms_to_deg('nope') AS b, deg_to_dms(38.0753250D, true) AS c").head()
    assert(math.abs(rows.getDouble(0) - expected) < 1e-12)
    assert(rows.isNullAt(1))
    assert(rows.getString(2).endsWith("N") && rows.getString(2).startsWith("38:"))
    // round-trip, including the edges that used to break it: single-digit
    // degrees (regex needs 2), seconds that round-format to 60.00
    for (v <- Seq(expected, 8.5, 0.9999986, 0.0, 59.9999999, 179.9999999 - 180.0)) {
      val rt = TextRT.dmsToDeg(TextRT.degToDms(v, isLat = v.abs <= 90))
      assert(!rt.isNaN, s"$v -> ${TextRT.degToDms(v, v.abs <= 90)} unparseable")
      assert(math.abs(rt - v) < 1e-4, s"$v") // 2-decimal seconds precision
    }
  }

  test("geojson id escaping: quotes and backslashes stay valid JSON") {
    val df = Seq(("a\"b\\c", "POINT (1 2)")).toDF("id", "wkt")
    val json = IngestExport.toGeoJson(
      IngestExport.withWktGeometry(df, "wkt"), "geom", "id").head().getString(0)
    val parsed = Seq(json).toDF("j")
      .select(get_json_object(col("j"), "$.id")).head().getString(0)
    assert(parsed === "a\"b\\c", json)
  }

  test("geojson id escaping: control characters stay valid JSON (r2 ADVICE)") {
    val df = Seq(("a\nb\tcd", "POINT (1 2)")).toDF("id", "wkt")
    val json = IngestExport.toGeoJson(
      IngestExport.withWktGeometry(df, "wkt"), "geom", "id").head().getString(0)
    // must parse as JSON at all (a raw newline inside the string would fail)
    val parsed = Seq(json).toDF("j")
      .select(get_json_object(col("j"), "$.id")).head().getString(0)
    assert(parsed === "a\nb\tcd", json)
    assert(!json.exists(c => c < ' '), s"raw control char leaked: $json")
  }

  test("GML export renders points, polygons and multi-geometries (S10)") {
    val df = Seq(
      ("p1", "POINT (1 2)"),
      ("l1", "LINESTRING (0 0, 1 1, 2 0)"),
      ("pg<1>", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"),
      ("mp", "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))"))
      .toDF("id", "wkt")
    val rows = IngestExport.toGml(IngestExport.withWktGeometry(df, "wkt"), "geom", "id")
      .collect().map(_.getString(0))
    val p = rows.find(_.contains("fid=\"p1\"")).get
    assert(p.contains("<gml:Point><gml:coordinates>1,2</gml:coordinates></gml:Point>"), p)
    val l = rows.find(_.contains("fid=\"l1\"")).get
    assert(l.contains("<gml:LineString><gml:coordinates>0,0 1,1 2,0</gml:coordinates></gml:LineString>"), l)
    val pg = rows.find(_.contains("fid=\"pg&lt;1>\"")).get
    assert(pg.contains("<gml:outerBoundaryIs>") && pg.contains("<gml:innerBoundaryIs>"), pg)
    val mp = rows.find(_.contains("fid=\"mp\"")).get
    assert(mp.contains("<gml:MultiPolygon>") &&
      mp.sliding("<gml:polygonMember>".length).count(_ == "<gml:polygonMember>") === 2, mp)
    // well-formed XML: every fragment parses with the namespaces bound
    // (JDK DocumentBuilder — namespace-aware, no extra deps)
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    rows.foreach { r =>
      val wrapped = s"""<root xmlns:gml="http://www.opengis.net/gml" xmlns:graft="urn:graft">$r</root>"""
      dbf.newDocumentBuilder().parse(
        new java.io.ByteArrayInputStream(wrapped.getBytes("UTF-8")))
    }
  }

  test("lon/lat domain enforcement: reject drops, clamp folds into range") {
    val df = Seq((1L, 10.0, 20.0), (2L, -200.0, 10.0), (3L, 20.0, 95.0)).toDF("id", "lon", "lat")
    val rejected = IngestExport.enforceLonLatDomain(df, "lon", "lat")
    assert(rejected.select("id").collect().map(_.getLong(0)).toSeq === Seq(1L))
    val clamped = IngestExport.enforceLonLatDomain(df, "lon", "lat", clamp = true)
      .orderBy("id").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    assert(clamped.toSeq === Seq((10.0, 20.0), (-180.0, 10.0), (20.0, 90.0)))
  }

  test("BIN export: 16-byte LE records decode back (F6)") {
    val rows = IngestExport.toBin(
        WebPages.pages(spark, sfDir).limit(50),
        col("doc_id"), col("lat"), col("lon"), col("sec"))
      .collect().map(_.getAs[Array[Byte]](0))
    assert(rows.length === 50)
    val src = WebPages.pages(spark, sfDir).limit(50)
      .select(col("doc_id"), col("lat"), col("lon"), col("sec")).collect()
    rows.zip(src).foreach { case (b, r) =>
      assert(b.length === 16)
      assert(BinEncodeRT.decodeLat(b) === r.getDouble(1).toFloat)
      assert(BinEncodeRT.decodeLon(b) === r.getDouble(2).toFloat)
      assert(BinEncodeRT.decodeSec(b) === r.getLong(3).toInt)
    }
  }

  test("tubeSelectLine ⊇ point tube and respects interpolated waypoints") {
    // straight-line track with a gap: interpolation must catch a midpoint hit
    val track = Seq((1L, 0.0, 0.0, 0L), (1L, 10.0, 0.0, 10000L)).toDF("tid", "t_lon", "t_lat", "t_sec")
    val data = Seq(
      (100L, 0.1, 0.1, 100L),     // near first point
      (200L, 5.0, 0.1, 5000L),    // near the MIDDLE of the segment only
      (300L, 60.0, 40.0, 5000L))  // far away
      .toDF("id", "lon", "lat", "sec")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").collect().map(_.getLong(0)).toSet
    val point = ids(SpatioTemporal.tubeSelect(track, "tid", "t_lon", "t_lat", "t_sec",
      data, "id", "lon", "lat", "sec", 1.0, 20000L, broadcastTrack = Some(true)))
    val line = ids(SpatioTemporal.tubeSelectLine(track, "tid", "t_lon", "t_lat", "t_sec",
      data, "id", "lon", "lat", "sec", 1.0, 20000L, waypoints = 10,
      broadcastTrack = Some(true)))
    assert(point === Set(100L))
    assert(line === Set(100L, 200L), "interpolated tube must cover the gap")
  }

  test("manifest count/bounds estimates answer without a scan (A6/A7)") {
    val out = java.nio.file.Files.createTempDirectory("graft_est").toString
    val keyed = CellLayout.withCellKeys(
      WebPages.pages(spark, sfDir).select("doc_id", "lon", "lat"),
      col("lon"), col("lat"), col("doc_id"))
    CellLayout.write(keyed, out, sfDir)
    assert(CellLayout.countEstimate(out) === keyed.count())
    val Some((x0, y0, x1, y1)) = CellLayout.boundsEstimate(out)
    val ext = keyed.agg(min("lon"), min("lat"), max("lon"), max("lat")).head()
    assert(x0 <= ext.getDouble(0) && y0 <= ext.getDouble(1))
    assert(x1 >= ext.getDouble(2) && y1 >= ext.getDouble(3))
  }

  test("fixed-width ingest slices and casts columns (S8)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fw").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "rows.txt"),
      "001  -75.5 40.2\n002   10.0 50.0\n")
    val got = IngestExport.fixedWidth(spark, dir, Seq(
        ("id", 1, 3, "long"), ("lon", 4, 7, "double"), ("lat", 11, 5, "double")))
      .orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(got(0).getDouble(1) === -75.5 && got(0).getDouble(2) === 40.2)
  }

  test("binTrack: ntile bins per tube with extents and counts (W4)") {
    val track = WebPages.track(spark, sfDir)
    val bins = IngestExport.binTrack(track, "tid", "t_lon", "t_lat", "t_sec", maxBins = 4)
      .collect()
    val perTube = bins.groupBy(_.get(0))
    perTube.foreach { case (_, rs) =>
      assert(rs.length <= 4)
      rs.foreach { r =>
        assert(r.getLong(2) <= r.getLong(3)) // t_min <= t_max
        assert(r.getLong(4) > 0)
      }
      // bins are time-ordered and non-overlapping per tube
      val sorted = rs.sortBy(_.getInt(1))
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(x.getLong(3) <= y.getLong(2))
        case _ =>
      }
    }
  }
}
