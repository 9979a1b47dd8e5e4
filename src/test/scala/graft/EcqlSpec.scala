package graft

import graft.cql.Ecql
import graft.functions.st
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * ECQL front-end: the string filter language the reference accepts
 * (parsed there by GeoTools `ECQL.toFilter`; corpus:
 * geomesa-core/src/test/.../filter/TestFilters.scala) must produce the same
 * rows as the equivalent typed-Column query, and spatial predicates must
 * plan through the same St* expressions (so the join/pushdown rules fire).
 */
class EcqlSpec extends SparkSpec {

  private lazy val df: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, 41.5, 28.5, "2010-07-10T00:00:00Z", "val17", 3.0),
      (2L, 45.5, 24.0, "2010-08-08T12:00:00Z", "val56", 7.5),
      (3L, 47.0, 26.0, "2010-07-01T00:00:00Z", null.asInstanceOf[String], 9.0),
      (4L, 10.0, 10.0, "2011-01-01T00:00:00Z", "value", -2.0),
      (5L, 41.0, 28.0, "2010-07-31T00:00:00Z", "valley", 0.5)
    ).toDF("id", "x", "y", "dtg_s", "attr", "score")
      .withColumn("geom", st.point(col("x"), col("y")))
      .withColumn("dtg", to_timestamp(col("dtg_s")))
  }

  private def ids(filter: String): Seq[Long] =
    Ecql.where(df, filter).select("id").collect().map(_.getLong(0)).toSeq.sorted

  test("attribute comparisons, IN, BETWEEN, LIKE, IS NULL, NOT") {
    assert(ids("attr = 'val17'") === Seq(1L))
    assert(ids("attr <> 'val17'") === Seq(2L, 4L, 5L)) // null drops out, SQL semantics
    assert(ids("score > 3") === Seq(2L, 3L))
    assert(ids("score >= 3") === Seq(1L, 2L, 3L))
    assert(ids("score = -2.0") === Seq(4L))
    assert(ids("id IN (1, 3, 99)") === Seq(1L, 3L))
    assert(ids("attr IN ('val17', 'value')") === Seq(1L, 4L))
    assert(ids("score BETWEEN 0.5 AND 7.5") === Seq(1L, 2L, 5L))
    assert(ids("score NOT BETWEEN 0.5 AND 7.5") === Seq(3L, 4L))
    assert(ids("attr LIKE 'val%'") === Seq(1L, 2L, 4L, 5L))
    assert(ids("attr LIKE 'val__'") === Seq(1L, 2L, 4L)) // exactly two wildcard chars
    assert(ids("attr ILIKE 'VAL17'") === Seq(1L))
    assert(ids("attr IS NULL") === Seq(3L))
    assert(ids("attr IS NOT NULL") === Seq(1L, 2L, 4L, 5L))
    assert(ids("NOT (id = 1)") === Seq(2L, 3L, 4L, 5L))
    assert(ids("INCLUDE") === Seq(1L, 2L, 3L, 4L, 5L))
    assert(ids("EXCLUDE") === Seq())
    // bare identifier RHS references a column (reference corpus shape)
    assert(ids("x = y") === Seq(4L))
  }

  test("temporal: DURING is the strict interior, BEFORE/AFTER/TEQUALS, string BETWEEN is temporal") {
    // DURING excludes both endpoints (OGC During)
    assert(ids("dtg DURING 2010-07-01T00:00:00Z/2010-07-31T00:00:00Z") === Seq(1L))
    assert(ids("dtg BEFORE 2010-07-02T00:00:00Z") === Seq(3L))
    assert(ids("dtg AFTER 2010-12-31T00:00:00Z") === Seq(4L))
    assert(ids("dtg TEQUALS 2010-08-08T12:00:00.000Z") === Seq(2L))
    // quoted ISO strings become timestamp literals: inclusive BETWEEN
    assert(ids("dtg BETWEEN '2010-07-01T00:00:00.000Z' AND '2010-07-31T00:00:00.000Z'")
      === Seq(1L, 3L, 5L))
    // BEFORE/AFTER over a PERIOD (OGC: before its start / after its end) —
    // the period's '/' must parse temporally, never as division
    assert(ids("dtg BEFORE 2010-07-02T00:00:00Z/2010-08-01T00:00:00Z") === Seq(3L))
    assert(ids("dtg AFTER 2010-08-01T00:00:00Z/P60D") === Seq(4L))
    assert(ids("dtg BEFORE P1D/2010-07-03T00:00:00Z") === Seq(3L))
    intercept[Ecql.EcqlParseException](
      Ecql.toColumn("dtg TEQUALS 2010-07-01T00:00:00Z/2010-07-31T00:00:00Z"))
  }

  test("temporal: quoted instants in every period position; property operands") {
    // quoted t1 AND t2 (GeoTools accepts either form in either slot)
    assert(ids("dtg DURING '2010-07-01T00:00:00Z'/'2010-07-31T00:00:00Z'") === Seq(1L))
    assert(ids("dtg BEFORE '2010-07-02T00:00:00Z'/'2010-08-01T00:00:00Z'") === Seq(3L))
    // quoted instant on the far side of a duration, both directions
    assert(ids("dtg AFTER '2010-08-01T00:00:00Z'/P60D") === Seq(4L))
    assert(ids("dtg BEFORE P1D/'2010-07-03T00:00:00Z'") === Seq(3L))
    // BEFORE/AFTER/TEQUALS against ANOTHER TIMESTAMP PROPERTY
    // (GeoTools: `dtg AFTER end_ts` is a column-to-column comparison)
    val withEnd = df.withColumn("end_ts", to_timestamp(lit("2010-08-01T00:00:00Z")))
    def ids2(f: String): Seq[Long] =
      Ecql.where(withEnd, f).select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(ids2("dtg AFTER end_ts") === Seq(2L, 4L))
    assert(ids2("dtg BEFORE end_ts") === Seq(1L, 3L, 5L))
    assert(ids2("dtg TEQUALS end_ts") === Seq())
    assert(ids2("dtg TEQUALS dtg") === Seq(1L, 2L, 3L, 4L, 5L))
    // a property ref is not a period
    intercept[Ecql.EcqlParseException](Ecql.toColumn("dtg DURING end_ts"))
    // a DANGLING duration (user forgot the '/instant' half) fails AT PARSE
    // TIME with a positioned message, not later as an unresolved column
    val dangling = intercept[Ecql.EcqlParseException](Ecql.toColumn("dtg AFTER PT2H"))
    assert(dangling.getMessage.contains("must form a period"))
    // ...but idents that merely START with P stay ordinary column refs
    Ecql.toColumn("dtg AFTER Pfoo") // parses (column named Pfoo), no throw
  }

  test("spatial: INTERSECTS/WITHIN/BBOX/DWITHIN match the typed-Column query") {
    val poly = "POLYGON ((41 28, 42 28, 42 29, 41 29, 41 28))"
    val typed = df.filter(st.intersects(col("geom"), st.geomFromWKT(lit(poly))))
      .select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(ids(s"INTERSECTS(geom, $poly)") === typed)
    // id=1 (41.5,28.5) is strictly inside; id=5 (41,28) sits ON the corner,
    // and JTS `within` excludes the boundary
    assert(ids(s"WITHIN(geom, $poly)") === Seq(1L))
    assert(ids("BBOX(geom, 44, 23, 48, 27)") === Seq(2L, 3L))
    // ~78.6 km between (41.5,28.5) and (41,28): inside 100km, outside 50km
    assert(ids("DWITHIN(geom, POINT (41 28), 100, kilometers)") === Seq(1L, 5L))
    assert(ids("DWITHIN(geom, POINT (41 28), 50000, meters)") === Seq(5L))
    assert(ids("BEYOND(geom, POINT (41 28), 100, kilometers)") === Seq(2L, 3L, 4L))
    assert(ids("DISJOINT(geom, POLYGON ((40 27, 43 27, 43 30, 40 30, 40 27)))") === Seq(2L, 3L, 4L))
  }

  test("logical nesting from the reference corpus parses and evaluates") {
    val f = "((INTERSECTS(geom, POLYGON ((41 28, 42 28, 42 29, 41 29, 41 28))) OR " +
      "INTERSECTS(geom, POLYGON ((44 23, 46 23, 46 25, 44 25, 44 23)))) AND " +
      "(dtg BETWEEN '2010-07-01T00:00:00.000Z' AND '2010-07-31T00:00:00.000Z' OR attr = 'val56'))"
    assert(ids(f) === Seq(1L, 2L, 5L))
    assert(ids("attr = 'val17' AND score >= 3 OR id = 4") === Seq(1L, 4L)) // AND binds tighter
  }

  test("spatial ECQL plans through the same St* expressions as the typed API") {
    import org.apache.spark.sql.graftshim.ColumnShim
    val fromEcql = Ecql.toColumn("INTERSECTS(geom, POLYGON ((41 28, 42 28, 42 29, 41 29, 41 28)))")
    assert(ColumnShim.expression(fromEcql).getClass.getSimpleName === "StIntersects")
    val dw = Ecql.toColumn("DWITHIN(geom, POINT (0 0), 1, kilometers)")
    assert(ColumnShim.expression(dw).getClass.getSimpleName === "StDWithin")
  }

  test("parse errors carry position; unknown unit and trailing input rejected") {
    intercept[Ecql.EcqlParseException](Ecql.toColumn("attr = "))
    intercept[Ecql.EcqlParseException](Ecql.toColumn("INTERSECTS(geom, POLYGON ((1 1, 2 2)) extra"))
    intercept[Ecql.EcqlParseException](Ecql.toColumn("DWITHIN(geom, POINT (0 0), 1, furlongs)"))
    intercept[Ecql.EcqlParseException](Ecql.toColumn("attr = 'unterminated"))
    intercept[Ecql.EcqlParseException](Ecql.toColumn("dtg DURING 2010-07-01T00:00:00Z"))
  }

  test("cql_filter in SQL text expands at analysis time; string gone from the plan") {
    df.createOrReplaceTempView("ecql_docs")
    val poly = "POLYGON ((41 28, 42 28, 42 29, 41 29, 41 28))"
    val got = spark.sql(
      s"SELECT id FROM ecql_docs WHERE cql_filter('INTERSECTS(geom, $poly)') AND id < 5")
      .collect().map(_.getLong(0)).toSeq.sorted
    val want = Ecql.where(df, s"INTERSECTS(geom, $poly)").filter(col("id") < 5)
      .select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(got === want && got.nonEmpty)
    // the filter string is consumed at analysis time — the optimized plan
    // holds the parsed St* tree, so SpatialRules fire exactly as for the
    // typed API (no cql_filter call survives)
    val plan = spark.sql(s"SELECT * FROM ecql_docs WHERE cql_filter('BBOX(geom, 44, 23, 48, 27)')")
      .queryExecution.optimizedPlan.toString()
    assert(!plan.toLowerCase.contains("cql_filter"))
    // attribute + temporal forms work through SQL too
    val t = spark.sql("SELECT id FROM ecql_docs WHERE " +
      "cql_filter('dtg DURING 2010-07-01T00:00:00Z/2010-07-31T00:00:00Z')")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(t === Seq(1L))
  }

  test("cql_filter rejects non-literal args and the documented grammar deviations") {
    df.createOrReplaceTempView("ecql_docs")
    // per-row filter strings have no analysis-time parse
    intercept[Exception](
      spark.sql("SELECT * FROM ecql_docs WHERE cql_filter(attr)").collect())
    intercept[Exception](
      spark.sql("SELECT * FROM ecql_docs WHERE cql_filter('attr = ')").collect())
    // documented deviation: the `ID '…'` form (the corpus' feature-ID
    // syntax is the bare IN(...), supported below)
    intercept[Ecql.EcqlParseException](Ecql.toColumn("ID '42'"))
  }

  test("arithmetic in comparison operands: precedence, unary sign, parens") {
    assert(ids("id = 1 + 2") === Seq(3L))
    assert(ids("id = 1 + 2 * 2") === Seq(5L))          // * binds tighter than +
    assert(ids("id = (1 + 3) / 2") === Seq(2L))        // parens, true division
    assert(ids("id = 2 * 2 - 1") === Seq(3L))
    assert(ids("id = -1 + 3") === Seq(2L))             // unary minus
    assert(ids("id + 1 > 4") === Seq(4L, 5L))          // LHS continuation
    assert(ids("id * 2 = 8") === Seq(4L))
    assert(ids("score = 2 * score - 3") === Seq(1L))   // property on both sides
    assert(ids("id BETWEEN 2 - 1 AND 1 + 1") === Seq(1L, 2L))
    assert(ids("id IN (1 + 1, 2 + 2)") === Seq(2L, 4L))
    // division of integrals is true division: 3 / 2 = 1.5 matches nothing
    assert(ids("id = 3 / 2") === Seq())
    // malformed tails still fail with a position
    intercept[Ecql.EcqlParseException](Ecql.toColumn("id = 1 +"))
    intercept[Ecql.EcqlParseException](Ecql.toColumn("id = (1 + 2"))
  }

  test("literal-leading comparisons: `3 < prop`, expression on both sides") {
    assert(ids("3 < id") === Seq(4L, 5L))
    assert(ids("1 + 2 = id") === Seq(3L))
    assert(ids("-2.0 = score") === Seq(4L))
    assert(ids("(1 + 3) / 2 = id") === Seq(2L))
    assert(ids("2 * id = id + 3") === Seq(3L))        // expressions both sides
    assert(ids("'val17' = attr") === Seq(1L))
    // paren-lead stays boolean when it is one; arithmetic when it is not
    assert(ids("(id > 4) AND attr = 'valley'") === Seq(5L))
    assert(ids("(1 + 2) * 2 - 2 = id AND attr = 'value'") === Seq(4L))
    // a malformed boolean group reports the boolean error, not a
    // misleading arithmetic one
    val e = intercept[Ecql.EcqlParseException](Ecql.toColumn("(attr = )"))
    assert(e.getMessage.contains("expected literal or property name"))
  }

  test("bare IN(...) is the feature-ID filter on the configured id column") {
    // fid defaults to column `fid`; the spec frame uses `id`
    val got = Ecql.where(df, "IN('1','3') OR attr = 'value'", idColumn = "id")
      .select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(got === Seq(1L, 3L, 4L))
    // composes with other predicates, reference-corpus shape
    val got2 = Ecql.where(df,
      "IN('1','2') AND dtg DURING 2010-07-01T00:00:00Z/2010-07-31T00:00:00Z",
      idColumn = "id").select("id").collect().map(_.getLong(0)).toSeq
    assert(got2 === Seq(1L))
    // property-IN still routes through the comparison branch
    assert(ids("attr IN ('val17', 'val56')") === Seq(1L, 2L))
    // SQL surface: optional second literal names the id column
    df.createOrReplaceTempView("ecql_docs")
    val sqlGot = spark.sql("SELECT id FROM ecql_docs WHERE cql_filter('IN(''5'')', 'id')")
      .collect().map(_.getLong(0)).toSeq
    assert(sqlGot === Seq(5L))
  }

  test("RELATE evaluates DE-9IM patterns through st_relate") {
    // contains-style pattern: geom (a point) within the polygon interior
    val poly = "POLYGON ((41 28, 42 28, 42 29, 41 29, 41 28))"
    assert(ids(s"RELATE(geom, $poly, 'T*F**F***')") === Seq(1L)) // within
    // intersects-style pattern matches the same row
    assert(ids(s"RELATE(geom, $poly, 'T********')") === Seq(1L))
    // malformed pattern rejected with position
    intercept[Ecql.EcqlParseException](
      Ecql.toColumn(s"RELATE(geom, $poly, 'TT')"))
  }

  test("DURING accepts ISO-8601 period durations on either side") {
    // t1/duration: 30 days from July 1 — same window as the instant form
    assert(ids("dtg DURING 2010-07-01T00:00:00Z/P30D") === Seq(1L))
    // duration/t2: 30 days back from July 31
    assert(ids("dtg DURING P30D/2010-07-31T00:00:00Z") === Seq(1L))
    // time-part durations and mixed calendar+time parts parse
    assert(ids("dtg DURING 2010-07-09T23:00:00Z/PT25H") === Seq(1L))
    assert(ids("dtg DURING 2010-06-30T00:00:00Z/P1MT1H") === Seq(1L, 3L))
    // garbage duration rejected with its own position
    val e = intercept[Ecql.EcqlParseException](
      Ecql.toColumn("dtg DURING 2010-07-01T00:00:00Z/P1X"))
    assert(e.getMessage.contains("duration"))
  }

  test("every filter in the reference's TestFilters corpus parses") {
    // the reference's own ECQL test corpus (geomesa-core/src/test/.../
    // filter/TestFilters.scala) — every plain string entry must parse.
    // Interpolated entries (the s"DWITHIN...$i..." loops) are covered by
    // the concrete dwithinPointPredicates entries.
    val path = sys.props.getOrElse("graft.reference.root", "/root/reference") +
      "/geomesa-core/src/test/scala/" +
      "org/locationtech/geomesa/core/filter/TestFilters.scala"
    // cancel (not fail) on machines without the reference checkout — the
    // sweep is a corpus-compatibility audit, not a unit invariant
    assume(new java.io.File(path).exists(), s"reference corpus not found at $path")
    val src = scala.io.Source.fromFile(path)
    val text = try src.mkString finally src.close()
    // join `"..." +\n"..."` scala string concatenations before extracting
    val joined = text.replaceAll("\"\\s*\\+\\s*\\n\\s*\"", "")
    val re = """(?m)^\s*"([^"]+)",?\s*(//.*)?$""".r
    val filters = re.findAllMatchIn(joined).map(_.group(1)).toList
    assert(filters.size >= 100, s"corpus extraction too small: ${filters.size}")
    val failures = filters.flatMap { f =>
      try { Ecql.toColumn(f); None }
      catch { case e: Exception => Some(s"$f -> ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"${failures.size} corpus filters failed:\n" +
      failures.take(10).mkString("\n"))
  }

  test("string escaping: doubled quote inside literal") {
    import spark.implicits._
    val d = Seq((1L, "it's"), (2L, "its")).toDF("id", "s")
    val got = Ecql.where(d, "s = 'it''s'").select("id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L))
  }
}
