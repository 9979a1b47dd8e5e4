package graft

import graft.functions.st
import org.apache.spark.sql.functions._

/**
 * Parity with the reference's export-tool tests
 * (geomesa-tools/src/test/.../GmlExportTest.scala and
 * FeatureExporterTest.scala): the same single-feature fixture
 * (fid-1, POINT(45.0 49.0), epoch dtg) driven through this engine's
 * export surfaces — GML featureMember shape with the fid attribute,
 * the JTS WKT normalization the delimited export emits
 * ("POINT(45.0 49.0)" → "POINT (45 49)"), and CSV quoting of
 * delimiter-carrying values.
 */
class ExportParitySpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(("fid-1", "myname"))
      .toDF("fid", "name")
      .withColumn("geom", st.geomFromWKT(lit("POINT(45.0 49.0)")))
      .withColumn("dtg", to_timestamp(lit("1970-01-01 00:00:00")))
  }

  test("GML export carries the feature id as the fid attribute (GmlExportTest:56-66)") {
    val gml = graft.sources.IngestExport.toGml(fixture, "geom", "fid", "GmlExportTest")
      .head().getString(0)
    // the fragment parses as XML (namespaces declared by the enclosing doc,
    // as in the reference's full-document writer)
    val doc = scala.xml.XML.loadString(
      s"""<root xmlns:gml="http://www.opengis.net/gml" xmlns:graft="urn:graft">$gml</root>""")
    val feat = doc \ "featureMember" \ "GmlExportTest"
    assert(feat.nonEmpty)
    assert((feat \ "@fid").text === "fid-1")
    // and the geometry fragment carries the point coordinates
    assert((feat \ "geom").text.contains("45") && (feat \ "geom").text.contains("49"))
  }

  test("delimited export normalizes WKT like the reference (FeatureExporterTest:61-72)") {
    // the reference's expected data row renders POINT(45.0 49.0) as
    // "POINT (45 49)" — space after the type, integral ordinates
    val out = graft.sources.IngestExport.toDelimited(
      fixture.select("name", "geom", "dtg"), "geom").head()
    assert(out.getString(1) === "POINT (45 49)")
  }

  test("CSV export quotes delimiter-carrying values (FeatureExporterTest:91-105)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_export").toString + "/out"
    graft.sources.IngestExport.toDelimited(
        fixture.withColumn("derived", concat(col("name"), lit(",test")))
          .select("derived", "geom", "dtg"), "geom")
      .coalesce(1).write
      .option("header", "true").option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(dir)
    val part = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-")).head
    val lines = scala.util.Using.resource(scala.io.Source.fromFile(part))(_.getLines().toList)
    assert(lines.head === "derived,geom,dtg")
    assert(lines(1) === "\"myname,test\",POINT (45 49),1970-01-01 00:00:00")
  }
}
