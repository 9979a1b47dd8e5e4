package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * Avro ⇄ Spark schema/value mapping shared by the splittable source and the
 * [[IngestExport]] wrappers. Primitive fields map to Spark types; a union of
 * exactly {null, T} maps to nullable T; records/arrays/maps map RECURSIVELY
 * to struct/array/map columns (so `col("a.b")` replaces the reference's
 * AvroPath `$.a.b` DSL); enums land as strings; multi-branch non-null
 * unions and self-referential records fall back to their string form.
 * Column pruning applies at the top level (a selected nested field decodes
 * its whole top-level struct).
 */
private[sources] object AvroSchemaMap {

  def nonNullBranch(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      // a union of MULTIPLE non-null branches has no single Spark type:
      // land it as a string rather than guessing the first branch and
      // class-cast-crashing at runtime
      if (branches.size == 1) branches.head
      else Schema.create(Schema.Type.STRING)
    } else s

  def sparkType(s: Schema): DataType = sparkType(s, Set.empty)

  /** Recursive mapping; nested records/arrays/maps become real
    * struct/array/map columns so `col("a.b")` subsumes the reference's
    * AvroPath `$.a.b` extraction DSL (geomesa-convert-avro/.../AvroPath
    * .scala) Spark-first. `seen` breaks self-referential record schemas
    * (legal in Avro, unrepresentable as a finite StructType) to string. */
  private def sparkType(s0: Schema, seen: Set[String]): DataType = {
    val s = nonNullBranch(s0)
    s.getType match {
      case Schema.Type.STRING | Schema.Type.ENUM => StringType
      case Schema.Type.INT => IntegerType
      case Schema.Type.LONG => LongType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
      case Schema.Type.RECORD if !seen(s.getFullName) =>
        val inner = seen + s.getFullName
        StructType(s.getFields.asScala.toSeq.map { f =>
          StructField(f.name, sparkType(f.schema(), inner), nullable = true)
        })
      case Schema.Type.ARRAY => ArrayType(sparkType(s.getElementType, seen))
      case Schema.Type.MAP => MapType(StringType, sparkType(s.getValueType, seen))
      case _ => StringType // recursive records, multi-branch unions
    }
  }

  def toStructType(avro: Schema): StructType =
    StructType(avro.getFields.asScala.toSeq.map { f =>
      StructField(f.name, sparkType(f.schema()), nullable = true)
    })

  /** Avro runtime value → Catalyst internal value for the mapped type.
    * Nested structs resolve fields by name per row — fine off the flat
    * hot path, where the reader stays positional. */
  def toCatalyst(v: AnyRef, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (f: org.apache.avro.generic.GenericFixed, BinaryType) => f.bytes()
    case (x, StringType) => UTF8String.fromString(x.toString)
    case (r: org.apache.avro.generic.GenericRecord, st: StructType) =>
      InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(
        st.fields.map { f =>
          val av = Option(r.getSchema.getField(f.name)).map(g => r.get(g.pos())).orNull
          toCatalyst(av.asInstanceOf[AnyRef], f.dataType)
        }))
    case (a: java.util.Collection[_], ArrayType(et, _)) =>
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        a.asScala.map(v => toCatalyst(v.asInstanceOf[AnyRef], et)).toArray)
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      val entries = m.asScala.toArray
      org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        entries.map { case (k, _) => UTF8String.fromString(k.toString): Any },
        entries.map { case (_, v) => toCatalyst(v.asInstanceOf[AnyRef], vt) })
    // exact-match numerics box straight through (the common case pays no
    // conversion or re-allocation on the ingest kernel)
    case (x: java.lang.Long, LongType) => x
    case (x: java.lang.Integer, IntegerType) => x
    case (x: java.lang.Double, DoubleType) => x
    case (x: java.lang.Float, FloatType) => x
    // WIDENING bridges for schema drift ACROSS files: the Spark type comes
    // from the (lexicographically) first file, but each file decodes in
    // its own writer types — a later file writing int where the first
    // wrote long must widen, not ClassCastException at row access. Only
    // Avro's own promotion directions (int→long→float→double) coerce;
    // a NARROWING mismatch (long value, int column) raises a clear error
    // rather than silently truncating (x.intValue() on 2^32 is 0).
    case (x: java.lang.Integer, LongType) => x.longValue()
    case (x: java.lang.Integer, DoubleType) => x.doubleValue()
    case (x: java.lang.Long, DoubleType) => x.doubleValue()
    case (x: java.lang.Float, DoubleType) => x.doubleValue()
    case (x: java.lang.Integer, FloatType) => x.floatValue()
    case (x: java.lang.Long, FloatType) => x.floatValue()
    case (x: java.lang.Number, dt) => throw new IllegalStateException(
      s"graft-avro: schema drift narrows ${x.getClass.getSimpleName} to $dt; " +
        "re-read with an explicit wider schema (spark.read.schema(...))")
    case (x, _) => x // boolean boxes through unchanged
  }
}

/**
 * Splittable Avro container-file source (reference S7,
 * geomesa-convert-avro/.../AvroSimpleFeatureConverter.scala:30-80 — the
 * ingest format; geomesa-core AvroFeatureEncoder — the interchange format),
 * re-expressed as a Spark DataSource V2 batch source:
 *
 *   spark.read.format("graft-avro").load(path)
 *
 * Scale shape — this is the 100-TB ingest path the `binaryFile` wrapper
 * couldn't be: each file is cut into byte ranges of
 * `spark.sql.files.maxPartitionBytes` (override: option `splitBytes`), and
 * each task seeks to the first Avro SYNC MARKER at-or-after its range start
 * (`DataFileReader.sync`) and drains blocks until the first sync past its
 * range end (`pastSync`) — the standard container-splitting contract, so a
 * 10 GB file becomes ~80 parallel tasks with no coordination and no
 * whole-file buffering (blocks stream through the decoder one at a time).
 *
 * Column pruning is pushed INTO the Avro decoder: the required columns
 * become a projected READER SCHEMA, so Avro's schema resolution skips the
 * bytes of unused fields instead of decoding then dropping them
 * (`SupportsPushDownRequiredColumns`).
 */
class AvroSplitSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-avro"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroSchemaMap.toStructType(AvroSplitSource.fileSchema(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new AvroSplitTable(schema, new CaseInsensitiveStringMap(properties))
}

private[sources] object AvroSplitSource {

  def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val single = Option(options.get("path")).toSeq
    // DataFrameReader.load(p1, p2, ...) ships the multi-path form as a JSON
    // string array under "paths" (see Spark's DataFrameReader); a plain
    // comma-separated value is accepted too for hand-set options
    val multi = Option(options.get("paths")).toSeq.flatMap { raw =>
      val trimmed = raw.trim
      if (trimmed.startsWith("["))
        try new com.fasterxml.jackson.databind.ObjectMapper()
          .readValue(trimmed, classOf[Array[String]]).toSeq
        catch { // a hand-set [-leading character-class glob, not JSON
          case _: com.fasterxml.jackson.core.JacksonException =>
            splitPaths(trimmed)
        }
      else splitPaths(trimmed)
    }
    val all = (single ++ multi).filter(_.nonEmpty)
    require(all.nonEmpty, "graft-avro: no 'path' given (use .load(path))")
    all
  }

  /** Split a hand-set comma-separated `paths` value, but not inside `{}` —
    * Hadoop brace globs (`/data/{2024,2025}/x.avro`) are one path. */
  private def splitPaths(s: String): Seq[String] =
    graft.util.Splits.topLevel(s, '{', '}', trim = true).filter(_.nonEmpty)

  /** The session's Hadoop configuration (spark.hadoop.* and
    * per-session overrides included) — a bare `new Configuration()` would
    * drop the credentials/endpoints a non-local filesystem needs. Driver
    * side only; executors receive the entries through [[confEntries]]. */
  def hadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

  /** Serializable form of a Configuration for shipping to executors
    * (SerializableConfiguration is private[spark]). */
  def confEntries(conf: Configuration): Array[(String, String)] =
    conf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray

  def confFromEntries(entries: Array[(String, String)]): Configuration = {
    val c = new Configuration()
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Non-hidden data files under the given paths: each path may be a file,
    * a glob (expanded with the filesystem's glob semantics, like the
    * built-in file sources), or a directory (one level of data files —
    * the layout [[IngestExport.writeAvro]] and most Avro producers emit). */
  def listFiles(options: CaseInsensitiveStringMap, conf: Configuration): Seq[FileStatus] =
    paths(options).flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val matched = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      if (matched.isEmpty)
        throw new java.io.FileNotFoundException(s"graft-avro: no files match $p")
      matched.flatMap(st => if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st))
        .filter { f =>
          val n = f.getPath.getName
          f.isFile && f.getLen > 0 && !n.startsWith("_") && !n.startsWith(".")
        }
    }.sortBy(_.getPath.toString) // listStatus order is fs-dependent; sorted
                                 // paths make schema inference (first file
                                 // wins) deterministic across runs

  /** Embedded writer schema of the first data file (container files carry
    * their schema in the header). */
  def fileSchema(options: CaseInsensitiveStringMap): Schema = {
    val conf = hadoopConf()
    val first = listFiles(options, conf).headOption.getOrElse(
      throw new IllegalArgumentException(
        s"graft-avro: no data files under ${paths(options).mkString(",")}"))
    val reader = new DataFileReader[GenericRecord](
      new FsInput(first.getPath, conf), new GenericDatumReader[GenericRecord]())
    try reader.getSchema finally reader.close()
  }
}

private[sources] class AvroSplitTable(schema: StructType,
                                      options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  override def name(): String =
    s"graft-avro(${AvroSplitSource.paths(options).mkString(",")})"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(schema, options)
}

private[sources] class AvroScanBuilder(fullSchema: StructType,
                                       options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep only names we actually have (Spark passes a subset of schema())
    required = StructType(requiredSchema.fields.filter(f =>
      fullSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new AvroScan(fullSchema, required, options)
}

/** One byte range of one container file; the reader syncs to the first
  * block boundary at-or-after `start` and stops at the first past `end`. */
private[sources] case class AvroSplit(path: String, start: Long, end: Long)
  extends InputPartition

private[sources] class AvroScan(fullSchema: StructType, required: StructType,
                                options: CaseInsensitiveStringMap)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro cols=[${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = AvroSplitSource.hadoopConf()
    val splitBytes = Option(options.get("splitbytes")).map(_.toLong)
      .getOrElse(SQLConf.get.filesMaxPartitionBytes)
    require(splitBytes > 0, s"graft-avro: splitBytes must be positive")
    val splits = AvroSplitSource.listFiles(options, conf).flatMap { f =>
      val len = f.getLen
      (0L until len by splitBytes).map { off =>
        AvroSplit(f.getPath.toString, off, math.min(off + splitBytes, len))
      }
    }
    // largest ranges first so stragglers schedule early (same heuristic as
    // Spark's own FilePartition packing)
    splits.sortBy(s => -(s.end - s.start)).toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required,
      AvroSplitSource.confEntries(AvroSplitSource.hadoopConf()))
}

private[sources] class AvroReaderFactory(required: StructType,
                                         confEntries: Array[(String, String)])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new AvroSplitReader(partition.asInstanceOf[AvroSplit], required, confEntries)
}

private[sources] class AvroSplitReader(split: AvroSplit, required: StructType,
                                       confEntries: Array[(String, String)])
  extends PartitionReader[InternalRow] {

  private val conf = AvroSplitSource.confFromEntries(confEntries)
  private val in = new FsInput(new Path(split.path), conf)
  // fieldPos(i) = position of required field i in the PROJECTED record
  // schema, resolved once here — get() runs per row and a string-keyed
  // Schema.getField lookup per field per record is measurable waste on the
  // ingest kernel; -1 marks a required field the writer schema lacks
  // (possible when later files carry fewer fields than the inferred first
  // one) and lands as null.
  private val (reader: DataFileReader[GenericRecord], fieldPos: Array[Int]) =
    // if anything in reader construction / projection / sync throws (a
    // corrupt or truncated container), close the input — close() is never
    // reached and the open stream would leak a descriptor per task attempt
    try {
      val datum = new GenericDatumReader[GenericRecord]()
      val r = new DataFileReader[GenericRecord](in, datum)
      // prune at the DECODER: a reader schema holding only the required
      // fields makes Avro's resolver skip (not decode) the other fields'
      // bytes. Built against the file's own writer schema so field schemas
      // match exactly whatever the producer wrote.
      val writer = r.getSchema
      val keep = required.fieldNames.toSet
      val fields = writer.getFields.asScala.filter(f => keep(f.name)).map { f =>
        new Schema.Field(f.name, f.schema, f.doc, f.defaultVal())
      }
      val projected = Schema.createRecord(
        writer.getName, writer.getDoc, writer.getNamespace, writer.isError)
      projected.setFields(fields.asJava)
      datum.setExpected(projected)
      // first sync marker at-or-after the range start; a range beginning
      // mid-block skips to the next block (its owner is the previous range)
      r.sync(split.start)
      val pos = required.fieldNames.map(n =>
        Option(projected.getField(n)).map(_.pos).getOrElse(-1))
      (r, pos)
    } catch {
      case t: Throwable =>
        try in.close() catch { case suppressed: Throwable => t.addSuppressed(suppressed) }
        throw t
    }
  private val fieldTypes = required.fields.map(_.dataType)
  private var current: GenericRecord = _

  override def next(): Boolean =
    if (reader.hasNext && !reader.pastSync(split.end)) {
      current = reader.next(current)
      true
    } else false

  override def get(): InternalRow = {
    val values = new Array[Any](fieldPos.length)
    var i = 0
    while (i < fieldPos.length) {
      val p = fieldPos(i)
      values(i) = if (p < 0) null else AvroSchemaMap.toCatalyst(current.get(p), fieldTypes(i))
      i += 1
    }
    InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(values))
  }

  override def close(): Unit = reader.close() // closes the FsInput too
}
