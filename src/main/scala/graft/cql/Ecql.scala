package graft.cql

import java.sql.Timestamp
import java.time.{Instant, LocalDateTime, ZoneOffset}

import graft.functions.st
import graft.geom.GeomCodec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * (E)CQL filter front-end: parses the textual filter language the reference
 * accepts everywhere a query is issued (reference: the ECQL strings in
 * `geomesa-core/src/test/scala/.../filter/TestFilters.scala` and the
 * predicate whitelist `geomesa-core/src/main/scala/.../filter/package.scala:248-259`)
 * into a Catalyst [[Column]] over this engine's codegen'd spatial/temporal
 * expressions. The reference delegates parsing to GeoTools' `ECQL.toFilter`;
 * this is a from-scratch recursive-descent parser for the same grammar
 * subset — everything the reference's own test corpus uses:
 *
 *   - logical:   `AND`, `OR`, `NOT`, parentheses, `INCLUDE`, `EXCLUDE`
 *   - spatial:   `INTERSECTS/CONTAINS/WITHIN/OVERLAPS/CROSSES/TOUCHES/
 *                 DISJOINT/EQUALS(prop, <WKT>)`, `BBOX(prop, x1,y1,x2,y2 [,crs])`,
 *                 `DWITHIN/BEYOND(prop, <WKT>, dist, units)`
 *   - temporal:  `prop DURING t1/t2` (strict interior, OGC During),
 *                 `BEFORE`, `AFTER`, `TEQUALS` with ISO-8601 instants
 *                 (quoted or bare, in every period slot) or another
 *                 timestamp property (`dtg AFTER end_ts`)
 *   - attribute: `= <> != < <= > >=`, `[NOT] LIKE / ILIKE`, `[NOT] IN (...)`,
 *                 `[NOT] BETWEEN a AND b` (inclusive), `IS [NOT] NULL`
 *
 * Literals: numbers, `'single-quoted'` strings (`''` escape), bare ISO
 * instants (`2010-07-01T00:00:00.000Z`), WKT geometries. A bare identifier
 * on the right-hand side references another column (the reference corpus'
 * `attr56 = val56` shape). Quoted strings that look like ISO instants become
 * timestamp literals so `dtg BETWEEN '...' AND '...'` compares in time, not
 * lexicographically. Geometry literals fold to WKB constants at parse time,
 * so the planner's spatial-join/pushdown rules see the same `St*` expression
 * trees the typed API builds — ECQL queries plan identically to Column ones.
 *
 * Also supported: `RELATE(g, <wkt>, 'DE-9IM')` and OGC periods (`t1/t2`,
 * `t1/P1D`, `PT2H/t2`, calendar parts applied in UTC) in DURING and in
 * BEFORE/AFTER (before a period's start / after its end).
 *
 * Arithmetic (`+ - * /`, usual precedence, unary sign, parentheses) is
 * accepted anywhere a comparison operand is — on either side: `score =
 * 1 + 2`, `3 < score`, `(1 + 2) * 2 = len`, `x BETWEEN lo - 1 AND hi + 1`.
 * Division of integral operands is true division (double), matching both
 * Spark SQL and GeoTools' Expression evaluation. A leading `(` is resolved
 * by one bounded backtrack: boolean grouping first, expression comparison
 * on failure.
 *
 * Grammar-deviation note: none known against the forms GeoTools' ECQL
 * accepts in the reference's usage — the EcqlSpec parse sweep proves every
 * entry of the reference's TestFilters corpus parses, and the keyword
 * forms (IS NULL, DURING, LIKE, IN, BETWEEN) lead with a property as they
 * do in GeoTools. Feature-ID filters (the bare `IN('id1','id2')` form,
 * which the reference's corpus DOES use in its idPredicates section)
 * compile to a membership test on `idColumn` (default `fid`) cast to
 * string — the DataFrame analog of `SimpleFeature.getID` addressing.
 */
object Ecql {

  /** Parse an ECQL filter into a boolean Column. Throws
    * [[EcqlParseException]] with position on malformed input. `idColumn`
    * names the column the bare-`IN` feature-ID filter tests. */
  def toColumn(filter: String, idColumn: String = "fid"): Column = {
    val p = new Parser(filter, idColumn)
    val c = p.parseOr()
    p.expectEof()
    c
  }

  /** `df.filter(Ecql.toColumn(f))` convenience. */
  def where(df: DataFrame, filter: String, idColumn: String = "fid"): DataFrame =
    df.filter(toColumn(filter, idColumn))

  /**
   * SQL-surface builder: `cql_filter('<ecql>')` in `spark.sql` text expands
   * AT ANALYSIS TIME into the parsed predicate tree (the same `St*` /
   * comparison expressions the Column API builds — the filter string never
   * survives into the physical plan, so the optimizer rules in
   * [[graft.plans.SpatialRules]] see ordinary spatial predicates and the
   * query plans identically to its typed-API equivalent). Column names in
   * the filter resolve against the enclosing query's scope like any other
   * attribute reference. The argument must be a string LITERAL — a
   * per-row filter string has no analysis-time parse and is rejected.
   */
  def sqlBuilder(es: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.graftshim.ColumnShim
    if (es.isEmpty || es.length > 2)
      throw new EcqlParseException(s"cql_filter takes 1-2 arguments, got ${es.length}", 0)
    def litText(arg: org.apache.spark.sql.catalyst.expressions.Expression, what: String): String = {
      if (!arg.foldable || arg.dataType != org.apache.spark.sql.types.StringType)
        throw new EcqlParseException(s"cql_filter $what must be a string literal", 0)
      arg.eval() match {
        case null => throw new EcqlParseException(s"cql_filter $what must not be null", 0)
        case s => s.toString
      }
    }
    val text = litText(es.head, "filter argument")
    val idCol = es.lift(1).map(litText(_, "id-column argument")).getOrElse("fid")
    ColumnShim.catalyst(toColumn(text, idCol))
  }

  /** Register `cql_filter` on a live session's function registry. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cql_filter", sqlBuilder, "built-in")

  final class EcqlParseException(msg: String, val pos: Int)
    extends IllegalArgumentException(s"$msg (at position $pos)")

  // ---- lexer ----
  private object Tok extends Enumeration {
    val Ident, Num, Str, DateTime, LParen, RParen, Comma, Slash, Op, Eof = Value
  }
  private final case class Token(kind: Tok.Value, text: String, pos: Int)

  private val DateTimeRe =
    """\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?""".r
  private val NumRe = """\d+(?:\.\d+)?(?:[eE][+-]?\d+)?""".r
  private val IdentRe = """[A-Za-z_][A-Za-z0-9_:.]*""".r

  private val SpatialBinary = Set("INTERSECTS", "CONTAINS", "WITHIN", "OVERLAPS",
    "CROSSES", "TOUCHES", "DISJOINT", "EQUALS")
  private val WktTypes = Set("POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
    "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION")
  /** ECQL distance units → meters (reference accepts the same five). */
  private val Units = Map("METERS" -> 1.0, "KILOMETERS" -> 1000.0,
    "FEET" -> 0.3048, "STATUTE MILES" -> 1609.344, "NAUTICAL MILES" -> 1852.0,
    "MILES" -> 1609.344)

  private final class Parser(input: String, idColumn: String = "fid") {
    private var pos = 0
    private var tok: Token = _
    advance()

    private def fail(msg: String, at: Int = -1): Nothing =
      throw new EcqlParseException(msg, if (at >= 0) at else tok.pos)

    private def skipWs(): Unit =
      while (pos < input.length && input.charAt(pos).isWhitespace) pos += 1

    private def advance(): Unit = {
      skipWs()
      if (pos >= input.length) { tok = Token(Tok.Eof, "", pos); return }
      val start = pos
      val c = input.charAt(pos)
      tok = c match {
        case '(' => pos += 1; Token(Tok.LParen, "(", start)
        case ')' => pos += 1; Token(Tok.RParen, ")", start)
        case ',' => pos += 1; Token(Tok.Comma, ",", start)
        case '/' => pos += 1; Token(Tok.Slash, "/", start)
        case '=' => pos += 1; Token(Tok.Op, "=", start)
        case '<' =>
          pos += 1
          if (pos < input.length && (input.charAt(pos) == '=' || input.charAt(pos) == '>')) {
            pos += 1; Token(Tok.Op, input.substring(start, pos), start)
          } else Token(Tok.Op, "<", start)
        case '>' =>
          pos += 1
          if (pos < input.length && input.charAt(pos) == '=') { pos += 1; Token(Tok.Op, ">=", start) }
          else Token(Tok.Op, ">", start)
        case '!' =>
          if (pos + 1 < input.length && input.charAt(pos + 1) == '=') { pos += 2; Token(Tok.Op, "!=", start) }
          else fail("unexpected '!'", start)
        case '\'' =>
          val sb = new StringBuilder
          pos += 1
          var closed = false
          while (!closed && pos < input.length) {
            val ch = input.charAt(pos)
            if (ch == '\'') {
              if (pos + 1 < input.length && input.charAt(pos + 1) == '\'') { sb += '\''; pos += 2 }
              else { closed = true; pos += 1 }
            } else { sb += ch; pos += 1 }
          }
          if (!closed) fail("unterminated string literal", start)
          Token(Tok.Str, sb.toString, start)
        case d if d.isDigit =>
          DateTimeRe.findPrefixOf(input.substring(pos)) match {
            case Some(dt) => pos += dt.length; Token(Tok.DateTime, dt, start)
            case None =>
              val n = NumRe.findPrefixOf(input.substring(pos))
                .getOrElse(fail("bad number", start))
              pos += n.length; Token(Tok.Num, n, start)
          }
        case '-' | '+' | '*' => pos += 1; Token(Tok.Op, c.toString, start)
        case a if a.isLetter || a == '_' =>
          val id = IdentRe.findPrefixOf(input.substring(pos)).get
          pos += id.length; Token(Tok.Ident, id, start)
        case other => fail(s"unexpected character '$other'", start)
      }
    }

    private def isKw(k: String): Boolean =
      tok.kind == Tok.Ident && tok.text.equalsIgnoreCase(k)
    private def acceptKw(k: String): Boolean = { if (isKw(k)) { advance(); true } else false }
    private def expectKw(k: String): Unit = if (!acceptKw(k)) fail(s"expected $k")
    private def expect(kind: Tok.Value, what: String): String = {
      if (tok.kind != kind) fail(s"expected $what")
      val t = tok.text; advance(); t
    }
    def expectEof(): Unit = if (tok.kind != Tok.Eof) fail("trailing input after filter")

    // ---- grammar ----
    def parseOr(): Column = {
      var l = parseAnd()
      while (acceptKw("OR")) l = l || parseAnd()
      l
    }
    private def parseAnd(): Column = {
      var l = parseNot()
      while (acceptKw("AND")) l = l && parseNot()
      l
    }
    private def parseNot(): Column =
      if (acceptKw("NOT")) !parseNot() else parsePrimary()

    private def parsePrimary(): Column = {
      if (tok.kind == Tok.LParen) {
        // ambiguous lead: boolean grouping `(a > 1) AND b` vs an
        // arithmetic LHS `(1 + 2) * 2 = prop`. Try boolean first (every
        // corpus filter is); on failure rewind the two-var parser state
        // and read an expression comparison. If THAT fails too, rethrow
        // the boolean error — the likelier intent.
        val (savedPos, savedTok) = (pos, tok)
        try { advance(); val c = parseOr(); expect(Tok.RParen, ")"); c }
        catch {
          case boolErr: EcqlParseException =>
            pos = savedPos; tok = savedTok
            try exprComparison()
            catch { case _: EcqlParseException => throw boolErr }
        }
      }
      else if (acceptKw("INCLUDE")) lit(true)
      else if (acceptKw("EXCLUDE")) lit(false)
      else if (tok.kind == Tok.Ident && SpatialBinary.contains(tok.text.toUpperCase)) spatialBinary()
      else if (isKw("BBOX")) bbox()
      else if (isKw("DWITHIN") || isKw("BEYOND")) dwithin()
      else if (isKw("RELATE")) relate()
      else if (isKw("IN")) idFilter()
      else if (tok.kind == Tok.Num || tok.kind == Tok.Str || tok.kind == Tok.DateTime ||
               (tok.kind == Tok.Op && (tok.text == "-" || tok.text == "+")))
        exprComparison() // literal-leading: `3 < prop`, `1 + 2 = prop`
      else comparison()
    }

    /** Comparison whose LHS is a general expression rather than a leading
      * property: `3 < prop`, `1 + 2 = prop`, `(1 + 3) / 2 = prop`. Only
      * the six comparison operators apply here (the keyword forms — IS
      * NULL, DURING, LIKE, IN, BETWEEN — all lead with a property). */
    private def exprComparison(): Column = {
      val lhs = value()
      cmpOp(lhs, expect(Tok.Op, "comparison operator"), value())
    }

    private def cmpOp(lhs: Column, op: String, rhs: Column): Column = op match {
      case "="          => lhs === rhs
      case "<>" | "!="  => lhs =!= rhs
      case "<"          => lhs < rhs
      case "<="         => lhs <= rhs
      case ">"          => lhs > rhs
      case ">="         => lhs >= rhs
      case other        => fail(s"unknown operator $other")
    }

    /** Bare `IN('id1','id2')` — the GeoTools feature-ID filter (the
      * reference corpus' idPredicates): membership on the configured id
      * column, compared as strings (feature ids are strings). A property
      * IN-list goes through [[comparison]] (`prop IN (...)` — the property
      * name precedes the keyword, so the two forms never collide). */
    private def idFilter(): Column = {
      advance() // IN
      expect(Tok.LParen, "(")
      val ids = scala.collection.mutable.ArrayBuffer(expect(Tok.Str, "feature id string"))
      while (tok.kind == Tok.Comma) { advance(); ids += expect(Tok.Str, "feature id string") }
      expect(Tok.RParen, ")")
      col(idColumn).cast("string").isin(ids.toSeq: _*)
    }

    /** `RELATE(prop, <wkt>, 'DE-9IM pattern')` → JTS relate. */
    private def relate(): Column = {
      advance() // RELATE
      expect(Tok.LParen, "(")
      val prop = col(expect(Tok.Ident, "property name"))
      expect(Tok.Comma, ",")
      val g = geometryLiteral()
      expect(Tok.Comma, ",")
      val patPos = tok.pos
      val pat = expect(Tok.Str, "DE-9IM pattern")
      if (!pat.matches("[012TF*]{9}"))
        fail("DE-9IM pattern must be 9 characters of [012TF*]", patPos)
      expect(Tok.RParen, ")")
      st.relate(prop, g, lit(pat))
    }

    private def spatialBinary(): Column = {
      val op = tok.text.toUpperCase; advance()
      expect(Tok.LParen, "(")
      val prop = col(expect(Tok.Ident, "property name"))
      expect(Tok.Comma, ",")
      val g = geometryLiteral()
      expect(Tok.RParen, ")")
      op match {
        case "INTERSECTS" => st.intersects(prop, g)
        case "CONTAINS"   => st.contains(prop, g)
        case "WITHIN"     => st.within(prop, g)
        case "OVERLAPS"   => st.overlaps(prop, g)
        case "CROSSES"    => st.crosses(prop, g)
        case "TOUCHES"    => st.touches(prop, g)
        case "DISJOINT"   => st.disjoint(prop, g)
        case "EQUALS"     => st.equalsGeom(prop, g)
      }
    }

    private def bbox(): Column = {
      advance() // BBOX
      expect(Tok.LParen, "(")
      val prop = col(expect(Tok.Ident, "property name"))
      val nums = (1 to 4).map { _ => expect(Tok.Comma, ","); signedNumber() }
      // optional trailing CRS string (only EPSG:4326 / CRS:84 semantics here)
      if (tok.kind == Tok.Comma) { advance(); expect(Tok.Str, "crs string"); () }
      expect(Tok.RParen, ")")
      st.intersects(prop, st.makeBox(lit(nums(0)), lit(nums(1)), lit(nums(2)), lit(nums(3))))
    }

    private def dwithin(): Column = {
      val beyond = tok.text.equalsIgnoreCase("BEYOND"); advance()
      expect(Tok.LParen, "(")
      val prop = col(expect(Tok.Ident, "property name"))
      expect(Tok.Comma, ",")
      val g = geometryLiteral()
      expect(Tok.Comma, ",")
      val d = signedNumber()
      expect(Tok.Comma, ",")
      val unit0 = expect(Tok.Ident, "distance unit").toUpperCase
      // two-word units ("statute miles", "nautical miles")
      val unit = if (tok.kind == Tok.Ident && Units.contains(s"$unit0 ${tok.text.toUpperCase}")) {
        val u = s"$unit0 ${tok.text.toUpperCase}"; advance(); u
      } else unit0
      expect(Tok.RParen, ")")
      val meters = d * Units.getOrElse(unit, fail(s"unknown distance unit $unit"))
      val w = st.dwithin(prop, g, lit(meters))
      if (beyond) !w else w
    }

    /** WKT geometry literal: type keyword + balanced parens, parsed by the
      * engine's codec and folded to a WKB constant. */
    private def geometryLiteral(): Column = {
      if (tok.kind != Tok.Ident || !WktTypes.contains(tok.text.toUpperCase))
        fail("expected WKT geometry literal")
      val start = tok.pos
      // scan the raw input from the type keyword across one balanced group
      var i = start + tok.text.length
      while (i < input.length && input.charAt(i).isWhitespace) i += 1
      // EMPTY geometries: `POINT EMPTY`
      if (input.regionMatches(true, i, "EMPTY", 0, 5)) {
        val wkt = input.substring(start, i + 5)
        pos = i + 5; advance()
        return lit(wkb(wkt, start))
      }
      if (i >= input.length || input.charAt(i) != '(') fail("expected '(' in WKT", i)
      var depth = 0
      var end = i
      var done = false
      while (!done && end < input.length) {
        input.charAt(end) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) done = true
          case _ =>
        }
        end += 1
      }
      if (!done) fail("unbalanced parentheses in WKT", start)
      val wkt = input.substring(start, end)
      pos = end; advance()
      lit(wkb(wkt, start))
    }

    private def wkb(wkt: String, at: Int): Array[Byte] =
      try GeomCodec.toWkb(GeomCodec.fromWkt(wkt))
      catch { case e: Exception => fail(s"invalid WKT: ${e.getMessage}", at) }

    private def signedNumber(): Double = {
      val neg = tok.kind == Tok.Op && (tok.text == "-" || tok.text == "+")
      val sign = if (neg && tok.text == "-") -1.0 else 1.0
      if (neg) advance()
      sign * expect(Tok.Num, "number").toDouble
    }

    private def tsLit(text: String, at: Int): Column = lit(parseInstant(text, at))

    /** Parsed operand of BEFORE/AFTER/TEQUALS/DURING. */
    private sealed trait TemporalOperand
    private case class TInstant(t: Timestamp) extends TemporalOperand
    private case class TPeriod(start: Timestamp, end: Timestamp) extends TemporalOperand
    private case class TProp(name: String) extends TemporalOperand

    /** Operand of a temporal predicate: an instant literal, a period in any
      * of the three OGC forms — t1/t2, t1/duration, duration/t2 (ISO-8601
      * durations, e.g. P1D, PT2H30M) — or a reference to another timestamp
      * property (GeoTools accepts `dtg AFTER end_ts`). Instants may be bare
      * or 'single-quoted' in EVERY position, including a period's second
      * operand. Each operand's position is captured BEFORE expect()
      * advances past it, so a malformed operand reports itself, not the
      * next token. */
    private def temporalOperand(): TemporalOperand = {
      if (tok.kind == Tok.Ident) {
        val p1 = tok.pos
        val text = expect(Tok.Ident, "ISO-8601 duration or property name")
        // duration only when a '/' follows; a bare identifier is a column
        // reference (prop-vs-prop temporal comparison) — EXCEPT an ident
        // that is itself a valid ISO duration, a near-certain user error
        // (forgot the period's '/instant' half) that would otherwise
        // surface much later as an opaque unresolved-column failure
        if (tok.kind != Tok.Slash) {
          if (isIsoDuration(text))
            fail(s"duration '$text' must form a period (duration/instant or instant/duration)", p1)
          return TProp(text)
        }
        advance() // '/'
        val (raw, p2) = instantToken()
        val t2 = parseInstant(raw, p2)
        return TPeriod(Timestamp.from(shiftInstant(t2.toInstant, text, sign = -1, p1)), t2)
      }
      val (raw1, p1) = instantToken()
      val t1 = parseInstant(raw1, p1)
      if (tok.kind != Tok.Slash) return TInstant(t1)
      advance() // '/'
      if (tok.kind == Tok.Ident) { // t1/duration
        val p2 = tok.pos
        val durText = expect(Tok.Ident, "ISO-8601 duration")
        TPeriod(t1, Timestamp.from(shiftInstant(t1.toInstant, durText, sign = 1, p2)))
      } else {
        val (raw2, p2) = instantToken()
        TPeriod(t1, parseInstant(raw2, p2))
      }
    }

    /** True when the text parses as an ISO-8601 duration (P1D, PT2H30M,
      * P1MT10S, ...) — used only to improve the error for a duration left
      * dangling without its period half. */
    private def isIsoDuration(s: String): Boolean = {
      val up = s.toUpperCase
      if (!up.startsWith("P") || up.length < 2) false
      else try {
        val ti = up.indexOf('T')
        val (datePart, timePart) =
          if (ti < 0) (up, "") else (up.substring(0, ti), "P" + up.substring(ti))
        if (datePart.length > 1) java.time.Period.parse(datePart)
        if (timePart.nonEmpty) java.time.Duration.parse(timePart)
        datePart.length > 1 || timePart.nonEmpty
      } catch { case _: Exception => false }
    }

    /** Raw text + position of an instant token, quoted or bare. */
    private def instantToken(): (String, Int) = {
      val p = tok.pos
      val raw = if (tok.kind == Tok.Str) expect(Tok.Str, "ISO instant")
        else expect(Tok.DateTime, "ISO instant")
      (raw, p)
    }

    /** Shift an instant by an ISO-8601 duration (calendar part applied in
      * UTC — P1M over a month boundary follows java.time calendar rules,
      * matching GeoTools' UTC-anchored period arithmetic). */
    private def shiftInstant(t: Instant, iso: String, sign: Int, at: Int): Instant =
      try {
        val up = iso.toUpperCase
        if (!up.startsWith("P")) fail(s"bad ISO-8601 duration '$iso'", at)
        val ti = up.indexOf('T')
        val (datePart, timePart) =
          if (ti < 0) (up, "") else (up.substring(0, ti), "P" + up.substring(ti))
        var z = t.atZone(ZoneOffset.UTC)
        if (datePart.length > 1) { // more than the bare "P"
          val p = java.time.Period.parse(datePart)
          z = if (sign > 0) z.plus(p) else z.minus(p)
        }
        if (timePart.nonEmpty) {
          val d = java.time.Duration.parse(timePart)
          z = if (sign > 0) z.plus(d) else z.minus(d)
        }
        if (datePart.length <= 1 && timePart.isEmpty) fail(s"empty duration '$iso'", at)
        z.toInstant
      } catch {
        case e: EcqlParseException => throw e
        case _: Exception => fail(s"bad ISO-8601 duration '$iso'", at)
      }

    private def parseInstant(text: String, at: Int): Timestamp =
      try {
        if (text.endsWith("Z") || text.contains("+") || text.lastIndexOf('-') > 9)
          Timestamp.from(Instant.parse(text.replaceFirst("([+-]\\d{2})(\\d{2})$", "$1:$2")))
        else Timestamp.from(LocalDateTime.parse(text).toInstant(ZoneOffset.UTC))
      } catch { case _: Exception => fail(s"bad ISO-8601 instant '$text'", at) }

    /** Scalar operand in a comparison RHS / IN list / BETWEEN bound: a full
      * arithmetic expression over literals and properties (GeoTools ECQL
      * accepts `score = 1 + 2`, `prop * 2 > 10`; +,-,*,/ with the usual
      * precedence, unary sign, parentheses). */
    private def value(): Column = arithFrom(factor())

    /** Continue an arithmetic expression whose FIRST factor is already
      * parsed: finish the `* /` term level, then fold `+ -` over further
      * terms. A no-op (returns `first`) when no arithmetic operator
      * follows — which is every filter in the reference's corpus. */
    private def arithFrom(first: Column): Column = {
      var l = first
      while ((tok.kind == Tok.Op && tok.text == "*") || tok.kind == Tok.Slash) {
        val isMul = tok.kind == Tok.Op; advance()
        val r = factor()
        l = if (isMul) l * r else l / r
      }
      while (tok.kind == Tok.Op && (tok.text == "+" || tok.text == "-")) {
        val op = tok.text; advance()
        var r = factor()
        while ((tok.kind == Tok.Op && tok.text == "*") || tok.kind == Tok.Slash) {
          val isMul = tok.kind == Tok.Op; advance()
          val rr = factor()
          r = if (isMul) r * rr else r / rr
        }
        l = if (op == "+") l + r else l - r
      }
      l
    }

    /** Literal, property reference, signed factor, or parenthesized
      * arithmetic expression. */
    private def factor(): Column = tok.kind match {
      case Tok.Num => val v = tok.text; advance()
        if (v.contains('.') || v.contains('e') || v.contains('E')) lit(v.toDouble) else lit(v.toLong)
      case Tok.Op if tok.text == "-" => advance(); -factor()
      case Tok.Op if tok.text == "+" => advance(); factor()
      case Tok.Str =>
        val (t, p) = (tok.text, tok.pos); advance()
        if (DateTimeRe.pattern.matcher(t).matches()) tsLit(t, p) else lit(t)
      case Tok.DateTime => val (t, p) = (tok.text, tok.pos); advance(); tsLit(t, p)
      case Tok.Ident => val c = col(tok.text); advance(); c
      case Tok.LParen =>
        advance(); val e = value(); expect(Tok.RParen, ")"); e
      case _ => fail("expected literal or property name")
    }

    private def comparison(): Column = {
      // the LHS leads with a property (every corpus filter does); an
      // arithmetic continuation (`score + 1 > 2`, `len * 2 = width`) folds
      // onto it with normal precedence before the operator is read
      val prop = arithFrom(col(expect(Tok.Ident, "property name")))
      if (acceptKw("IS")) {
        val negated = acceptKw("NOT"); expectKw("NULL")
        return if (negated) prop.isNotNull else prop.isNull
      }
      if (acceptKw("DURING")) {
        temporalOperand() match {
          case TPeriod(t1, t2) => // OGC During: strict interior of the period
            return prop > lit(t1) && prop < lit(t2)
          case _ => fail("DURING takes a period (t1/t2, t1/duration, duration/t2)")
        }
      }
      // BEFORE/AFTER take an instant, a period (OGC: Before a period =
      // before its start; After a period = after its end) or another
      // timestamp property. These must NOT go through value() — the
      // arithmetic grammar would read the period's `/` as division over
      // two timestamps.
      if (acceptKw("BEFORE")) return temporalOperand() match {
        case TInstant(t) => prop < lit(t)
        case TPeriod(t1, _) => prop < lit(t1)
        case TProp(other) => prop < col(other)
      }
      if (acceptKw("AFTER")) return temporalOperand() match {
        case TInstant(t) => prop > lit(t)
        case TPeriod(_, t2) => prop > lit(t2)
        case TProp(other) => prop > col(other)
      }
      if (acceptKw("TEQUALS")) return temporalOperand() match {
        case TInstant(t) => prop === lit(t)
        case TProp(other) => prop === col(other)
        case _: TPeriod => fail("TEQUALS takes an instant, not a period")
      }
      val negated = acceptKw("NOT")
      if (acceptKw("LIKE")) {
        val c = prop.like(expect(Tok.Str, "pattern"))
        return if (negated) !c else c
      }
      if (acceptKw("ILIKE")) {
        val c = prop.ilike(expect(Tok.Str, "pattern"))
        return if (negated) !c else c
      }
      if (acceptKw("IN")) {
        expect(Tok.LParen, "(")
        val vs = scala.collection.mutable.ArrayBuffer(value())
        while (tok.kind == Tok.Comma) { advance(); vs += value() }
        expect(Tok.RParen, ")")
        val c = prop.isin(vs.toSeq: _*)
        return if (negated) !c else c
      }
      if (acceptKw("BETWEEN")) {
        val lo = value(); expectKw("AND"); val hi = value()
        val c = prop >= lo && prop <= hi
        return if (negated) !c else c
      }
      if (negated) fail("expected LIKE/ILIKE/IN/BETWEEN after NOT")
      cmpOp(prop, expect(Tok.Op, "comparison operator"), value())
    }
  }
}
