package graft

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Splittable Avro source (reference S7 at container scale): byte-range
  * splits must partition the record set EXACTLY — every record read once,
  * none twice, whatever the split size does to block boundaries — and
  * column pruning must reach the Avro decoder. */
class AvroSplitSourceSpec extends SparkSpec {

  private val NRows = 20000

  /** One container with many small blocks (sync interval near the Avro
    * minimum) so even small byte ranges straddle multiple blocks. */
  private lazy val containerDir: String = {
    val schema: Schema = SchemaBuilder.record("page").fields()
      .requiredLong("id").requiredString("name")
      .optionalString("lang") // ["null","string"] union branch
      .requiredDouble("lon")
      .endRecord()
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_split")
    val f = dir.resolve("part-0.avro").toFile
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setSyncInterval(1 << 6) // tiny blocks -> hundreds of sync markers
    w.create(schema, f)
    (0 until NRows).foreach { i =>
      val rec = new GenericData.Record(schema)
      rec.put("id", i.toLong)
      rec.put("name", s"page-$i-${"x" * (i % 17)}")
      rec.put("lang", if (i % 7 == 0) null else s"l${i % 5}")
      rec.put("lon", i * 0.001 - 10)
      w.append(rec)
    }
    w.close()
    dir.toString
  }

  test("byte-range splits cover every record exactly once (no loss, no dup)") {
    val df = spark.read.format("graft-avro")
      .option("splitBytes", "4096").load(containerDir)
    // the split plan really fans out: a several-hundred-KB container at a
    // 4 KB split size must produce many partitions
    assert(df.rdd.getNumPartitions > 10,
      s"expected >10 splits, got ${df.rdd.getNumPartitions}")
    val ids = df.select("id").collect().map(_.getLong(0))
    assert(ids.length === NRows, "record count across splits")
    assert(ids.toSet.size === NRows, "no duplicate records across split boundaries")
    assert(ids.min === 0L && ids.max === (NRows - 1).toLong)
  }

  test("split reads agree with a single whole-file split, values intact") {
    val whole = spark.read.format("graft-avro")
      .option("splitBytes", s"${1L << 30}").load(containerDir)
    assert(whole.rdd.getNumPartitions === 1)
    val split = spark.read.format("graft-avro")
      .option("splitBytes", "8192").load(containerDir)
    assert(split.exceptAll(whole).isEmpty && whole.exceptAll(split).isEmpty)
    // typed values + the nullable-union branch survive the split reader
    val r = split.filter(col("id") === 7).head()
    assert(r.getString(1) === "page-7-xxxxxxx" && r.isNullAt(2) &&
      r.getDouble(3) === (7 * 0.001 - 10))
    assert(split.filter(col("lang").isNull).count() ===
      (0 until NRows).count(_ % 7 == 0).toLong)
  }

  test("column pruning reaches the scan (and the Avro reader schema)") {
    val df = spark.read.format("graft-avro")
      .option("splitBytes", "16384").load(containerDir).select("id")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in the plan"))
    assert(scan.scan.readSchema().fieldNames.toSeq === Seq("id"),
      "required-column pushdown must prune the scan to the selected column")
    assert(df.agg(sum("id")).head().getLong(0) ===
      (0L until NRows.toLong).sum)
  }

  test("aggregate over split source matches driver-side ground truth") {
    val df = spark.read.format("graft-avro")
      .option("splitBytes", "4096").load(containerDir)
    val got = df.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val want = (0 until NRows)
      .map(i => if (i % 7 == 0) None else Some(s"l${i % 5}"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got === want)
  }

  test("glob paths expand; missing paths fail with FileNotFound") {
    // the built-in file sources accept globs — so must this one
    val glob = s"$containerDir/part-*.avro"
    assert(spark.read.format("graft-avro").load(glob).count() === NRows)
    val err = intercept[Exception](
      spark.read.format("graft-avro").load(s"$containerDir/nope-*.avro").count())
    assert(err.toString.contains("no files match") ||
      Option(err.getCause).exists(_.toString.contains("no files match")))
  }

  test("multi-path load() reads the union of all paths") {
    // DataFrameReader ships load(p1, p2) as a JSON string array under the
    // "paths" option — the source must decode that form, not comma-split it
    val schema: Schema = SchemaBuilder.record("page").fields()
      .requiredLong("id").requiredString("name")
      .optionalString("lang").requiredDouble("lon")
      .endRecord()
    val dir2 = java.nio.file.Files.createTempDirectory("graft_avro_split2")
    val f = dir2.resolve("part-0.avro").toFile
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    (NRows until NRows + 100).foreach { i =>
      val rec = new GenericData.Record(schema)
      rec.put("id", i.toLong); rec.put("name", s"page-$i")
      rec.put("lang", "l9"); rec.put("lon", 0.0)
      w.append(rec)
    }
    w.close()
    val df = spark.read.format("graft-avro").load(containerDir, dir2.toString)
    assert(df.count() === (NRows + 100).toLong)
    assert(df.select("id").distinct().count() === (NRows + 100).toLong)
    // hand-set comma form keeps working for direct option users
    val comma = spark.read.format("graft-avro")
      .option("paths", s"$containerDir,${dir2.toString}").load()
    assert(comma.count() === (NRows + 100).toLong)
    // a hand-set [-leading CHARACTER-CLASS GLOB is not JSON: it must fall
    // through to glob expansion (reaching listFiles), not die in Jackson
    val globErr = intercept[Exception](
      spark.read.format("graft-avro").option("paths", "[0-9]nope/*.avro").load().count())
    assert(globErr.toString.contains("no files match") ||
      Option(globErr.getCause).exists(_.toString.contains("no files match")))
    // a BRACE glob contains a comma but is ONE path — the comma split must
    // not break it apart (Hadoop fs.globStatus supports {a,b} alternation)
    val brace = spark.read.format("graft-avro")
      .option("paths", s"{$containerDir,${dir2.toString}}/part-0.avro").load()
    assert(brace.count() === (NRows + 100).toLong)
  }

  test("nested records/arrays/maps map to struct/array/map columns (AvroPath parity)") {
    // the reference extracts nested Avro fields with AvroPath ($.loc.lon,
    // array/map access); here the schema maps recursively so plain Spark
    // column paths do the same job
    val schema: Schema = new Schema.Parser().parse(
      """{"type":"record","name":"page","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"loc","type":{"type":"record","name":"loc","fields":[
        |    {"name":"lon","type":"double"},{"name":"lat","type":"double"},
        |    {"name":"name","type":["null","string"],"default":null}]}},
        |  {"name":"tags","type":{"type":"array","items":"string"}},
        |  {"name":"attrs","type":{"type":"map","values":"int"}}
        |]}""".stripMargin)
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_nested")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setSyncInterval(1 << 6)
    w.create(schema, dir.resolve("part-0.avro").toFile)
    (0 until 500).foreach { i =>
      val loc = new GenericData.Record(schema.getField("loc").schema())
      loc.put("lon", i * 0.1); loc.put("lat", -i * 0.1)
      loc.put("name", if (i % 3 == 0) null else s"city$i")
      val rec = new GenericData.Record(schema)
      rec.put("id", i.toLong); rec.put("loc", loc)
      rec.put("tags", java.util.List.of(s"t${i % 5}", "common"))
      rec.put("attrs", java.util.Map.of("score", i, "rank", i % 7))
      w.append(rec)
    }
    w.close()
    val df = spark.read.format("graft-avro")
      .option("splitBytes", "4096").load(dir.toString)
    // nested column paths work like any Spark struct
    val r = df.filter(col("id") === 43)
      .select(col("loc.lon"), col("loc.name"), col("tags")(0), col("attrs")("rank"))
      .head()
    assert(r.getDouble(0) === 4.3 && r.getString(1) === "city43" &&
      r.getString(2) === "t3" && r.getInt(3) === 43 % 7)
    // null union branch inside the struct survives
    assert(df.filter(col("loc.name").isNull).count() ===
      (0 until 500).count(_ % 3 == 0).toLong)
    // aggregates over nested + map values across MANY byte-range splits
    assert(df.agg(sum(col("attrs")("score"))).head().getLong(0) ===
      (0L until 500L).sum)
  }

  test("schema drift across files: missing fields null, narrower numerics widen") {
    // web-corpus containers drift: a later producer may drop a field or
    // write int where an earlier file wrote long; the inferred schema
    // comes from the FIRST file and every file must still decode
    val s1: Schema = SchemaBuilder.record("page").fields()
      .requiredLong("id").requiredString("name").optionalString("lang")
      .endRecord()
    val s2: Schema = SchemaBuilder.record("page").fields()
      .requiredInt("id").requiredString("name") // id narrowed, lang gone
      .endRecord()
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_drift")
    def write(name: String, schema: Schema, ids: Range, withLang: Boolean): Unit = {
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, dir.resolve(name).toFile)
      ids.foreach { i =>
        val rec = new GenericData.Record(schema)
        if (withLang) { rec.put("id", i.toLong); rec.put("lang", s"l$i") }
        else rec.put("id", i) // int branch
        rec.put("name", s"n$i")
        w.append(rec)
      }
      w.close()
    }
    write("a-first.avro", s1, 0 until 50, withLang = true)
    write("b-second.avro", s2, 50 until 100, withLang = false)
    val df = spark.read.format("graft-avro").load(dir.toString)
    assert(df.schema("id").dataType === org.apache.spark.sql.types.LongType)
    // both files' rows decode: ints widened to long, missing lang null
    assert(df.agg(sum("id")).head().getLong(0) === (0L until 100L).sum)
    assert(df.filter(col("lang").isNull).count() === 50L)
    assert(df.filter(col("id") === 75L).head().getString(1) === "n75")
    // NARROWING drift (first file int, later file long) must raise the
    // actionable error, not silently truncate (2^32.longValue.intValue==0)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_avro_narrow")
    def writeAt(d: java.nio.file.Path, name: String, schema: Schema, put: GenericData.Record => Unit): Unit = {
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, d.resolve(name).toFile)
      val rec = new GenericData.Record(schema); put(rec); w.append(rec); w.close()
    }
    val intS: Schema = SchemaBuilder.record("page").fields().requiredInt("id").endRecord()
    val longS: Schema = SchemaBuilder.record("page").fields().requiredLong("id").endRecord()
    writeAt(dir2, "a.avro", intS, _.put("id", 1))
    writeAt(dir2, "b.avro", longS, _.put("id", 1L << 33))
    val err = intercept[Exception](
      spark.read.format("graft-avro").load(dir2.toString).agg(sum("id")).head())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("schema drift narrows")))
  }

  test("session hadoop conf reaches the executor-side reader") {
    // spark.hadoop.* settings must survive into the reader's Configuration
    // (a bare `new Configuration()` would drop credentials/endpoints on a
    // real filesystem); assert the plumbing via a marker key
    val sc = spark.sparkContext.hadoopConfiguration
    sc.set("graft.test.marker", "present")
    try {
      val conf = graft.sources.AvroTestHooks.readerConf(spark)
      assert(conf.get("graft.test.marker") === "present")
    } finally sc.unset("graft.test.marker")
  }
}
