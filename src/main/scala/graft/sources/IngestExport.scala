package graft.sources

import graft.functions.st
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Ingest / export surface — the reference's converter + exporter modules
 * (geomesa-convert-text DelimitedTextConverter, geomesa-convert-avro,
 * geomesa-tools FeatureExporter.scala:46-129) re-expressed as thin
 * DataFrame wrappers: Spark's readers already subsume the format handling;
 * what remains is the geometry column derivation and WKT/GeoJSON shaping.
 */
object IngestExport {

  /** Delimited ingest (reference S6): read csv/tsv with a schema, derive a
    * WKB geometry from lon/lat (or WKT) columns. Expression-DSL transforms
    * (reference Transformers.scala) are plain selectExpr strings.
    * Malformed rows are DROPPED, as the reference converter does
    * (DelimitedTextConverter skips records whose transforms fail —
    * DelimitedTextConverterTest:68 expects 2 of 3 rows) — at web-corpus
    * scale a bad line must not poison the frame with nulls. The drop is
    * an explicit null-filter on the GEOMETRY inputs (PERMISSIVE parse,
    * then `lon IS NOT NULL AND lat IS NOT NULL`) — the one formulation
    * whose row set is STABLE under Spark's CSV column pruning. Both
    * mode=DROPMALFORMED and a corrupt-record-column filter judge
    * malformedness against the columns a downstream query happens to
    * select, so count() and a projected read can disagree on the row set
    * (and a bare count over only the corrupt column is outright
    * disallowed). The lon/lat filter always sits in the plan, so those
    * columns always parse and every consumer sees one row set; it is
    * also the converter's semantic — a record whose point() transform
    * cannot evaluate is skipped. */
  def csv(spark: SparkSession, path: String, schema: StructType,
          lonCol: String, latCol: String, delimiter: String = ","): DataFrame =
    spark.read.option("delimiter", delimiter).option("header", "true")
      .schema(schema).csv(path)
      .filter(col(lonCol).isNotNull && col(latCol).isNotNull)
      .withColumn("geom", st.point(col(lonCol), col(latCol)))

  /**
   * Avro container-file ingest (reference S7,
   * geomesa-convert-avro/.../AvroSimpleFeatureConverter.scala): delegates
   * to the SPLITTABLE [[AvroSplitSource]] DataSource V2 — each file is cut
   * into `spark.sql.files.maxPartitionBytes` byte ranges and every task
   * syncs to an Avro block boundary, so one 10 GB container fans out over
   * the cluster instead of loading whole into one task (the 100-TB ingest
   * path). Schema comes from the first file's embedded Avro schema;
   * primitive fields map to Spark types and nested records/arrays/maps to
   * struct/array/map columns — `col("a.b")` replaces the reference's
   * AvroPath extraction DSL ([[AvroSchemaMap]]); column selection prunes
   * at the Avro decoder (top-level fields).
   */
  def avro(spark: SparkSession, path: String): DataFrame =
    spark.read.format("graft-avro").load(path)

  /** WKT-column ingest: any reader output + st_geomfromwkt projection. */
  def withWktGeometry(df: DataFrame, wktCol: String): DataFrame =
    df.withColumn("geom", st.geomFromWKT(col(wktCol)))

  /** Avro container export — the write half of [[avro]] (reference's
    * interchange format: geomesa-core AvroFeatureEncoder / geomesa-tools
    * export). One container file per partition, written in parallel on the
    * executors; schema derived from the DataFrame schema (long / int /
    * double / float / string / boolean / binary; nullable → ["null", T]
    * union). Writes to a local/shared filesystem path — the distributed
    * production sink remains parquet ([[graft.layout.CellLayout]]); this
    * exists for interchange with Avro consumers and round-trip testing.
    * Retry/speculation-safe: each attempt writes an attempt-unique temp
    * file and atomically renames it into place. */
  def writeAvro(df: DataFrame, path: String, recordName: String = "feature"): Unit = {
    import org.apache.avro.Schema
    import org.apache.spark.sql.types._

    def avroType(dt: DataType): String = dt match {
      case LongType => "long"
      case IntegerType => "int"
      case DoubleType => "double"
      case FloatType => "float"
      case BooleanType => "boolean"
      case BinaryType => "bytes"
      case StringType => "string"
      case other => throw new IllegalArgumentException(
        s"writeAvro: unsupported column type $other (project to scalar columns first)")
    }
    val fieldJson = df.schema.fields.map { f =>
      val t = "\"" + avroType(f.dataType) + "\""
      val typ = if (f.nullable) s"""["null", $t]""" else t
      s"""{"name": "${f.name}", "type": $typ}"""
    }.mkString(", ")
    val schemaJson =
      s"""{"type": "record", "name": "$recordName", "fields": [$fieldJson]}"""
    val names = df.schema.fieldNames
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))

    df.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        import org.apache.avro.file.DataFileWriter
        import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
        val schema = new Schema.Parser().parse(schemaJson)
        val tc = org.apache.spark.TaskContext.get()
        // the directory is (re)created inside the task — the driver-side
        // mkdir above only covers the local[?] case where driver and
        // executors share a filesystem root
        val dir = new java.io.File(path)
        dir.mkdirs()
        // write to an ATTEMPT-UNIQUE temp file and atomically rename into
        // place: a task retry or speculative duplicate would otherwise have
        // two attempts truncating/appending the same container concurrently
        // (DataFileWriter.create truncates in place); with the rename, the
        // last attempt to finish publishes a complete container
        val tmp = new java.io.File(dir,
          s".part-${tc.partitionId()}-attempt-${tc.taskAttemptId()}.avro.tmp")
        val dst = new java.io.File(dir, s"part-${tc.partitionId()}.avro")
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, tmp)
        try it.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < names.length) {
            val v = row.get(i) match {
              case null => null
              case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
              case x => x.asInstanceOf[AnyRef]
            }
            rec.put(names(i), v)
            i += 1
          }
          w.append(rec)
        } finally w.close()
        java.nio.file.Files.move(tmp.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        ()
      }
    }
  }

  /** GeoJSON-feature export (reference S10, FeatureExporter.scala:46-129):
    * one JSON feature object per row, geometry rendered for ANY geometry
    * type (Point, LineString, Polygon, Multi variants, collections) via
    * st_asgeojson. The id is emitted as a JSON string (RFC 7946 allows
    * string or number ids). */
  def toGeoJson(df: DataFrame, geomCol: String, idCol: String): DataFrame = {
    // JSON-escape the id — string ids are arbitrary user data: to_json of a
    // one-field struct applies the full RFC 8259 escaping (backslash, quote
    // AND control chars U+0000–U+001F, which hand-rolled replaces missed),
    // then the quoted value is sliced out of the {"i":"..."} wrapper
    val wrapped = to_json(struct(col(idCol).cast("string").as("i")))
    // {"i":"<escaped>"} → strip the 6-char prefix and 2-char suffix
    val idQuoted = wrapped.substr(lit(7), length(wrapped) - 8)
    df.select(concat(
      lit("{\"type\":\"Feature\",\"id\":\""), idQuoted,
      lit("\",\"geometry\":"), st.asGeoJson(col(geomCol)),
      lit("}")).as("feature"))
  }

  /** GML 2 export (reference S10 GmlExport, FeatureExporter.scala:60-72):
    * one `<gml:featureMember>` per row with the feature id and the GML
    * geometry fragment for ANY geometry type; XML-escape the id. */
  def toGml(df: DataFrame, geomCol: String, idCol: String,
            typeName: String = "feature"): DataFrame = {
    val idEsc = regexp_replace(regexp_replace(regexp_replace(
      col(idCol).cast("string"),
      lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit("\""), lit("&quot;"))
    df.select(concat(
      lit(s"""<gml:featureMember><graft:$typeName fid=""""), idEsc,
      lit("\"><graft:geom>"), st.asGml(col(geomCol)),
      lit(s"</graft:geom></graft:$typeName></gml:featureMember>")).as("feature"))
  }

  /**
   * Lon/lat domain contract enforcement (the data contract the optimizer's
   * whole-world elision rule relies on — SpatialRules.WholeWorldElision):
   * rows outside ±180/±90 are either REJECTED (dropped) or CLAMPED into
   * range. Run at ingest; downstream cell encoding and filter rewrites may
   * then assume valid coordinates.
   */
  def enforceLonLatDomain(df: DataFrame, lonCol: String, latCol: String,
                          clamp: Boolean = false): DataFrame =
    if (clamp)
      df.withColumn(lonCol, greatest(lit(-180.0), least(lit(180.0), col(lonCol))))
        .withColumn(latCol, greatest(lit(-90.0), least(lit(90.0), col(latCol))))
    else
      df.filter(col(lonCol) >= -180.0 && col(lonCol) <= 180.0 &&
        col(latCol) >= -90.0 && col(latCol) <= 90.0)

  /** CSV/TSV export with geometry as WKT (reference DelimitedExport). */
  def toDelimited(df: DataFrame, geomCol: String): DataFrame =
    df.withColumn(geomCol, st.asText(col(geomCol)))

  /** BIN viewer export (reference F6): 16-byte LE records, byte-compatible
    * with the reference wire format — track key is Java String.hashCode of
    * the id (Convert2ViewerFunction.scala:131), laid out id/sec/lat/lon. */
  def toBin(df: DataFrame, idCol: Column, latCol: Column, lonCol: Column,
            secCol: Column): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnShim
    val e = graft.functions.BinEncode(
      ColumnShim.expression(binTrackKey(idCol)),
      ColumnShim.expression(latCol.cast("float")),
      ColumnShim.expression(lonCol.cast("float")),
      ColumnShim.expression(secCol.cast("long")))
    df.select(ColumnShim.column(e).as("bin"))
  }

  /** Track key for a BIN record: Java String.hashCode of the id, with the
    * reference's missing-id convention — a null id writes key 0
    * (`trackId.map(_.hashCode).getOrElse(0)`), it does not null the record. */
  private def binTrackKey(idCol: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    coalesce(ColumnShim.column(
      graft.functions.JavaStringHash(ColumnShim.expression(idCol.cast("string")))), lit(0))
  }

  /** 24-byte "reachback" BIN export: [[toBin]] plus a 64-bit label column
    * (reference Convert2ViewerFunction.scala:85-93). */
  def toBinExt(df: DataFrame, idCol: Column, latCol: Column, lonCol: Column,
               secCol: Column, labelCol: Column): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnShim
    val e = graft.functions.BinEncodeExt(
      ColumnShim.expression(binTrackKey(idCol)),
      ColumnShim.expression(latCol.cast("float")),
      ColumnShim.expression(lonCol.cast("float")),
      ColumnShim.expression(secCol.cast("long")),
      ColumnShim.expression(coalesce(labelCol.cast("long"), lit(0L))))
    df.select(ColumnShim.column(e).as("bin"))
  }

  /** BIN viewer ingest — the read half of [[toBin]]/[[toBinExt]]: 16- or
    * 24-byte LE records decoded back to (id_hash, lat, lon, sec[, label])
    * columns; label is null for the 16-byte basic form. */
  def fromBin(df: DataFrame, binCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnShim
    val rec = ColumnShim.column(graft.functions.BinDecode(
      ColumnShim.expression(col(binCol))))
    df.select(rec.as("__r")).select(
      col("__r.id_hash").as("id_hash"), col("__r.lat").as("lat"),
      col("__r.lon").as("lon"), col("__r.sec").as("sec"),
      col("__r.label").as("label"))
  }

  /** Fixed-width ingest (reference S8, FixedWidthConverters): offset/length
    * column slicing over a text file. `cols` = (name, startOffset1Based,
    * length, castTo). */
  def fixedWidth(spark: SparkSession, path: String,
                 cols: Seq[(String, Int, Int, String)]): DataFrame = {
    val raw = spark.read.text(path)
    raw.select(cols.map { case (name, start, len, typ) =>
      trim(substring(col("value"), start, len)).cast(typ).as(name)
    }: _*)
  }

  /** Time-binning of a track into a fixed number of bins (reference W4,
    * TubeBuilder.timeBinAndUnion :126-147): ntile over the time order per
    * tube, one aggregate row per bin with the bin's time extent and point
    * count (callers union/buffer per bin). */
  def binTrack(track: DataFrame, tidCol: String, lonCol: String, latCol: String,
               secCol: String, maxBins: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(tidCol).orderBy(secCol)
    track.withColumn("__bin", ntile(maxBins).over(w))
      .groupBy(col(tidCol), col("__bin").as("bin"))
      .agg(min(secCol).as("t_min"), max(secCol).as("t_max"),
        count(lit(1)).as("n_points"),
        avg(col(lonCol)).as("c_lon"), avg(col(latCol)).as("c_lat"))
  }
}
