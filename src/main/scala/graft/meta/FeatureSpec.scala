package graft.meta

import org.apache.spark.sql.types._

/**
 * Spec-string ⇄ StructType — parity helper for the reference's
 * SimpleFeatureType DSL (`"id:Integer,*geom:Point:srid=4326,dtg:Date,
 * tags:List[String],mt:Map[String,Double]"`, parser at
 * geomesa-utils/.../geotools/SimpleFeatureTypes.scala:455-545, createType
 * :76-84, encodeType :114-115). The `*` marks the default geometry; per-
 * attribute options (`srid=`, `index=`, `cardinality=`) are preserved as
 * Spark column metadata. Geometry columns are WKB BinaryType (§1.4).
 */
object FeatureSpec {

  val GeometryTypes: Set[String] = Set("Geometry", "Point", "LineString", "Polygon",
    "MultiPoint", "MultiLineString", "MultiPolygon", "GeometryCollection")

  private def simpleType(name: String): DataType = name match {
    case "String" => StringType
    case "Integer" | "Int" => IntegerType
    case "Long" => LongType
    case "Double" => DoubleType
    case "Float" => FloatType
    case "Boolean" => BooleanType
    case "UUID" => StringType
    case "Date" => TimestampType // reference time = java.util.Date, UTC millis
    case "Bytes" => BinaryType
    case g if GeometryTypes(g) => BinaryType // WKB
    case other => throw new IllegalArgumentException(s"unknown spec type: $other")
  }

  private val ListRe = """List\[(\w+)\]""".r
  private val MapRe = """Map\[(\w+),(\w+)\]""".r

  /** Split on commas that are not inside `List[..]`/`Map[..,..]` brackets. */
  private def splitAttrs(spec: String): Seq[String] =
    graft.util.Splits.topLevel(spec, '[', ']')

  /** Parse one spec string into a StructType. */
  def structType(spec: String): StructType = {
    val fields = splitAttrs(spec).filter(_.nonEmpty).map { part =>
      val tokens = part.trim.split(":")
      require(tokens.length >= 2, s"bad spec attribute: $part")
      val isDefaultGeom = tokens(0).startsWith("*")
      val name = if (isDefaultGeom) tokens(0).drop(1) else tokens(0)
      // one match yields both the Spark type and the normalized spec form
      // (bare List/Map default as the reference's encodeType does,
      // SimpleFeatureTypesTest:115-157)
      val (dt, normType) = tokens(1) match {
        case "List" => (ArrayType(StringType), "List[String]")
        case "Map" => (MapType(StringType, StringType), "Map[String,String]")
        case t @ ListRe(el) => (ArrayType(simpleType(el)), t)
        case t @ MapRe(k, v) => (MapType(simpleType(k), simpleType(v)), t)
        case other => (simpleType(other), other)
      }
      val mb = new MetadataBuilder()
      mb.putString("specType", normType)
      if (isDefaultGeom) mb.putBoolean("defaultGeom", true)
      tokens.drop(2).foreach { opt =>
        opt.split("=") match {
          case Array(k, v) => mb.putString(k, v)
          case _ =>
        }
      }
      StructField(name, dt, nullable = true, mb.build())
    }
    StructType(fields.toArray)
  }

  /** Inverse: StructType (with our metadata) back to a spec string. */
  def encode(st: StructType): String = st.fields.map { f =>
    val specType =
      if (f.metadata.contains("specType")) f.metadata.getString("specType")
      else f.dataType match {
        case StringType => "String"
        case IntegerType => "Integer"
        case LongType => "Long"
        case DoubleType => "Double"
        case FloatType => "Float"
        case BooleanType => "Boolean"
        case TimestampType => "Date"
        case BinaryType => "Bytes"
        case ArrayType(el, _) => s"List[${encodeSimple(el)}]"
        case MapType(k, v, _) => s"Map[${encodeSimple(k)},${encodeSimple(v)}]"
        case other => throw new IllegalArgumentException(s"unsupported: $other")
      }
    val star = if (f.metadata.contains("defaultGeom")) "*" else ""
    val opts = Seq("srid", "index", "cardinality", "index-value")
      .filter(f.metadata.contains)
      .map(k => s":$k=${f.metadata.getString(k)}")
      .mkString
    s"$star${f.name}:$specType$opts"
  }.mkString(",")

  private def encodeSimple(dt: DataType): String = dt match {
    case StringType => "String"
    case IntegerType => "Integer"
    case LongType => "Long"
    case DoubleType => "Double"
    case FloatType => "Float"
    case BooleanType => "Boolean"
    case TimestampType => "Date"
    case other => throw new IllegalArgumentException(s"unsupported element: $other")
  }

  /** Name of the default geometry column: the `*`-marked one, else — as
    * the reference resolves it (SimpleFeatureTypesTest:88-91 "handle no
    * explicit geometry") — the first geometry-typed column. */
  def defaultGeometry(st: StructType): Option[String] =
    st.fields.find(f => f.metadata.contains("defaultGeom")).map(_.name)
      .orElse(st.fields.find(f => f.metadata.contains("specType") &&
        GeometryTypes(f.metadata.getString("specType"))).map(_.name))
}
