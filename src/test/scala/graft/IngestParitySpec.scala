package graft

import graft.functions.st
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Parity with the reference's converter tests
 * (geomesa-convert-text/.../DelimitedTextConverterTest.scala and
 * geomesa-convert-fixedwidth/.../FixedWidthConverterTest.scala): the same
 * input data — including the malformed row the converter must DROP — and
 * the same derived values, through this engine's ingest surface (Spark
 * readers + selectExpr transforms instead of the config-DSL).
 */
class IngestParitySpec extends SparkSpec {

  private def writeLines(lines: Seq[String], suffix: String): String = {
    val f = java.nio.file.Files.createTempFile("graft_ingest", suffix)
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  private val delimitedSchema = StructType(Seq(
    StructField("oneup", StringType), StructField("word", StringType),
    StructField("lat", DoubleType), StructField("lon", DoubleType)))

  test("delimited: malformed rows drop, transforms derive (DelimitedTextConverterTest:36-82)") {
    // the reference corpus: two good rows and one that must NOT survive
    val path = writeLines(Seq(
      "oneup,word,lat,lon",
      "1,hello,45.0,45.0",
      "2,world,90.0,90.0",
      "willfail,hello"), ".csv")
    val df = graft.sources.IngestExport.csv(spark, path, delimitedSchema, "lon", "lat")
    // the dropped set is STABLE: the same 2 rows whether counted bare or
    // read through any projection (a DROPMALFORMED read's row set varies
    // with the selection — malformedness is judged under column pruning)
    assert(df.count() === 2)
    val res = df
      .selectExpr("oneup", "concat(oneup, word) AS phrase", "lat", "lon", "geom")
      .orderBy("oneup").collect()
    assert(res.length === 2)
    assert(res.map(_.getString(1)).toSeq === Seq("1hello", "2world"))
    // "handle more derived fields than input fields": oneup passes through
    assert(res.head.getString(0) === "1")
    assert(res.map(_.getDouble(2)).toSeq === Seq(45.0, 90.0))
  }

  test("delimited: tab-delimited variant (DelimitedTextConverterTest:84-110)") {
    val path = writeLines(Seq(
      "oneup\tword\tlat\tlon",
      "1\thello\t45.0\t45.0",
      "2\tworld\t90.0\t90.0",
      "willfail\thello"), ".tsv")
    // even a projection that touches NONE of the typed columns sees the
    // stable 2-row set (the lon/lat null-filter is always in the plan)
    val res = graft.sources.IngestExport.csv(spark, path, delimitedSchema,
        "lon", "lat", delimiter = "\t")
      .selectExpr("concat(oneup, word) AS phrase")
      .orderBy("phrase").collect()
    assert(res.map(_.getString(0)).toSeq === Seq("1hello", "2world"))
  }

  test("DMS coordinate columns ingest to points (CSVParserTest:66-75)") {
    // the reference's PointParser parses "38:04:31.17N -78:29:42.32E" to
    // (-78.495089, 38.075325) ± 1e-6; here the same composes from the
    // delimited reader + the dms_to_deg expression
    val path = writeLines(Seq(
      "fid,lat_dms,lon_dms",
      "fid-1,38:04:31.17N,-78:29:42.32E"), ".csv")
    val schema = StructType(Seq(
      StructField("fid", StringType), StructField("lat_dms", StringType),
      StructField("lon_dms", StringType)))
    val r = spark.read.option("header", "true").schema(schema).csv(path)
      .selectExpr("fid", "dms_to_deg(lon_dms) AS lon", "dms_to_deg(lat_dms) AS lat")
      .head()
    assert(math.abs(r.getDouble(1) - -78.495089) < 1e-6)
    assert(math.abs(r.getDouble(2) - 38.075325) < 1e-6)
  }

  test("fixed width: offset/width slicing to points (FixedWidthConverterTest:30-58)") {
    // "14555" -> lat = chars 2-3 = 45, lon = chars 4-5 = 55 -> POINT(55 45)
    val path = writeLines(Seq("14555", "16565"), ".txt")
    val res = graft.sources.IngestExport.fixedWidth(spark, path, Seq(
        ("lat", 2, 2, "double"), ("lon", 4, 2, "double")))
      .withColumn("wkt", st.asText(st.point(col("lon"), col("lat"))))
      .orderBy("lat").collect()
    assert(res.length === 2)
    assert(res.map(_.getString(2)).toSeq === Seq("POINT (55 45)", "POINT (65 65)"))
  }
}
