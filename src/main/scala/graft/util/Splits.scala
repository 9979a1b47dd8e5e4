package graft.util

/** Shared string-splitting helper for the two spec grammars that embed
  * commas inside bracket pairs (FeatureSpec's `List[..]`/`Map[..,..]`
  * attribute specs, AvroSplitSource's `{a,b}` Hadoop brace globs). */
object Splits {

  /** Split `s` on commas that sit at bracket depth zero for the given
    * bracket pair. Segments are optionally trimmed; empty segments are
    * kept (callers filter as their grammar requires). */
  def topLevel(s: String, open: Char, close: Char, trim: Boolean = false): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    def flush(): Unit = {
      out += (if (trim) cur.toString.trim else cur.toString)
      cur.clear()
    }
    s.foreach {
      case `open` => depth += 1; cur += open
      case `close` => depth = math.max(0, depth - 1); cur += close
      case ',' if depth == 0 => flush()
      case c => cur += c
    }
    flush()
    out.result()
  }
}
