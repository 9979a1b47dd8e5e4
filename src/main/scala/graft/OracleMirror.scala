package graft

import graft.functions.VecRT

/**
 * DuckDB-SQL mirrors of the engine's 64-bit hash kernels
 * ([[graft.functions.TextRT]] fnv1a64 / mix64 / simHash / fingerprint and
 * [[graft.functions.VecRT]] hyperplane LSH): the oracle side of the gate
 * queries whose Spark side uses custom expressions. DuckDB BIGINT
 * arithmetic errors on overflow instead of wrapping, so every multiply
 * runs in HUGEINT with an explicit split-by-2^32 mod-2^64 reduction; xor
 * and shifts stay in UBIGINT (bitwise ops are exact there). Generated from
 * the SAME Scala constants the executors use — the q_lang_guess /
 * q_geohash pattern (SQL authored from the engine's own tables/bit-math)
 * extended to wraparound hashing.
 */
object OracleMirror {

  private val M64 = "18446744073709551616" // 2^64

  private def u(c: Long): String = java.lang.Long.toUnsignedString(c)

  /** (h * c) mod 2^64 without overflowing HUGEINT (h < 2^64, c < 2^64):
    * h*c = (h>>32)*c*2^32 + (h&0xffffffff)*c; each partial product stays
    * under 2^97. `h` must be a UBIGINT-typed SQL expression. */
  def mulmod(h: String, c: Long): String =
    s"CAST((((CAST($h AS HUGEINT) % 4294967296) * ${u(c)} + " +
      s"(((CAST($h AS HUGEINT) // 4294967296) * ${u(c)}) % 4294967296) * 4294967296) % $M64) AS UBIGINT)"

  /** TextRT.mix64 (splitmix64: +golden then 3 xor-shift-multiply rounds). */
  def mix64(z0: String): String = {
    val add = s"CAST((CAST($z0 AS HUGEINT) + ${u(0x9e3779b97f4a7c15L)}) % $M64 AS UBIGINT)"
    val s1 = mulmod(s"xor($add, ($add) >> 30)", 0xbf58476d1ce4e5b9L)
    val s2 = mulmod(s"xor($s1, ($s1) >> 27)", 0x94d049bb133111ebL)
    s"xor($s2, ($s2) >> 31)"
  }

  /** TextRT.fnv1a64(word, seed 0): left fold over char codes. `w` names a
    * string column in scope. */
  def fnvWord(w: String): String =
    s"list_reduce(list_prepend(CAST(${u(0xcbf29ce484222325L)} AS UBIGINT), " +
      s"list_transform(range(1, length($w) + 1), i -> CAST(unicode($w[i]) AS UBIGINT))), " +
      s"(h, c) -> ${mulmod("xor(h, c)", 0x100000001b3L)})"

  /** UBIGINT expr → the signed BIGINT the JVM Long holds (two's complement). */
  def toSigned(uexpr: String): String =
    s"CAST(CASE WHEN $uexpr >= 9223372036854775808 THEN CAST($uexpr AS HUGEINT) - $M64 " +
      s"ELSE CAST($uexpr AS HUGEINT) END AS BIGINT)"

  /** CTE chain ending in `sig(doc_id, s UBIGINT)` = TextRT.simHash(text)
    * per document (docs with no tokens produce no row; the caller treats
    * absence as sig 0, matching the kernel). ASCII fixture: the kernel's
    * `[^\p{L}\p{N}]+` tokenizer reduces to `[a-z0-9]+` of lower(text). */
  def simhashCtes: String = {
    val tokh = mix64(fnvWord("w"))
    s"""tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w FROM documents),
       |th AS (SELECT doc_id, $tokh AS h FROM tok),
       |votes AS (SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM th CROSS JOIN range(0, 64) r(b) GROUP BY doc_id, b),
       |sig AS (SELECT doc_id, SUM(CASE WHEN v > 0 THEN CAST(1 AS UBIGINT) << b ELSE CAST(0 AS UBIGINT) END) AS s
       |  FROM votes GROUP BY doc_id)""".stripMargin
  }

  /** CTE chain ending in `fp(doc_id, fp BIGINT)` = TextRT.fingerprint(text,
    * `window`): consecutive non-overlapping char windows, rolling
    * h = h*257 + code, mix64 per window, SIGNED min (empty text → no row;
    * caller coalesces to 0). The window explode is a bounded cross join
    * (docs ≤ window*8192 chars — orders of magnitude above the fixture). */
  def fingerprintCtes(window: Int): String = {
    val roll = s"list_reduce(list_prepend(CAST(0 AS UBIGINT), " +
      s"list_transform(range(1, length(wtxt) + 1), i -> CAST(unicode(wtxt[i]) AS UBIGINT))), " +
      s"(h, c) -> CAST((CAST(${mulmod("h", 257L)} AS HUGEINT) + c) % $M64 AS UBIGINT))"
    s"""win AS (SELECT doc_id, substr(text, CAST(w * $window + 1 AS INT), $window) AS wtxt
       |  FROM documents CROSS JOIN range(0, 8192) r(w) WHERE w * $window < length(text)),
       |mx AS (SELECT doc_id, ${mix64(roll)} AS m FROM win),
       |fp AS (SELECT doc_id, MIN(${toSigned("m")}) AS fp FROM mx GROUP BY doc_id)""".stripMargin
  }

  // ---- HexLite mirrors ([[graft.index.HexLite]]): every fragment uses only
  // ANSI ops (sqrt/floor/abs/CASE/arithmetic) with the kernel's exact
  // operation order, so it runs bit-identically in Spark SQL (spec-checked)
  // AND DuckDB (driver oracle). Spark's floor returns BIGINT where DuckDB
  // returns DOUBLE — both exact integers here, so values agree. ----

  /** Exact decimal literal for HexLite.sizeOf(res) = 8/2^res: 8·5^res e-res
    * (finite binary fraction ⇒ finite decimal ⇒ exact in both parsers). */
  def hexSizeLit(res: Int): String = s"${BigInt(8) * BigInt(5).pow(res)}e-$res"

  /** Exact decimal literal for 2^-shift (HexLite.parent's axial scale). */
  def hexScaleLit(shift: Int): String = s"${BigInt(5).pow(shift)}e-$shift"

  /** Fractional axial coords (qf, rf) of (lon, lat) at `res`. */
  def hexAxialSql(lon: String, lat: String, res: Int): (String, String) = {
    val s = hexSizeLit(res)
    (s"((sqrt(3e0) / 3e0 * ($lon) - ($lat) / 3e0) / $s)",
      s"(((2e0 / 3e0) * ($lat)) / $s)")
  }

  /** Cube-rounded integral axial coords (q, r) from fractional (qf, rf) —
    * the standard cube-rounding with floor(v + 1/2). */
  def hexRoundedSql(qf: String, rf: String): (String, String) = {
    val x = qf; val z = rf; val y = s"(-($qf) - $rf)"
    val rx = s"floor($x + 5e-1)"; val ry = s"floor($y + 5e-1)"; val rz = s"floor($z + 5e-1)"
    val dx = s"abs($rx - ($x))"; val dy = s"abs($ry - ($y))"; val dz = s"abs($rz - ($z))"
    val b1 = s"($dx > $dy AND $dx > $dz)"
    val b2 = s"($dy > $dz)"
    (s"(CASE WHEN $b1 THEN -($ry) - $rz ELSE $rx END)",
      s"(CASE WHEN NOT $b1 AND NOT $b2 THEN -($rx) - $ry ELSE $rz END)")
  }

  /** Packed cell id from integral (q, r) exprs at `res`. */
  def hexPackSql(q: String, r: String, res: Int): String =
    s"(CAST($res AS BIGINT) * 4398046511104 + (CAST($q AS BIGINT) + 1048576) * 2097152 + (CAST($r AS BIGINT) + 1048576))"

  /** HexLite.encode(lon, lat, res) as one SQL expression. */
  def hexIdSql(lon: String, lat: String, res: Int): String = {
    val (qf, rf) = hexAxialSql(lon, lat, res)
    val (q, r) = hexRoundedSql(qf, rf)
    hexPackSql(q, r, res)
  }

  /** Hex center (lon, lat) from integral (q, r) exprs at `res`. */
  def hexCenterSql(q: String, r: String, res: Int): (String, String) = {
    val s = hexSizeLit(res)
    (s"($s * sqrt(3e0) * ($q + $r / 2e0))", s"($s * 15e-1 * $r)")
  }

  /** VecRT hyperplane-LSH bucket key of an `embedding` array<float> column:
    * bit i set iff the signed projection onto plane i is positive. The ±1
    * plane signs are emitted as literals from VecRT.planeSign (the same
    * splitmix64 parity the executors evaluate); each projection folds
    * left-to-right in DOUBLE — the identical IEEE op sequence as the
    * kernel, so the keys match bit-for-bit. */
  def lshKeySql(bits: Int, dim: Int): String = {
    val terms = (0 until bits).map { i =>
      val signs = (0 until dim).map(j =>
        if (VecRT.planeSign(i, j) > 0) "1e0" else "-1e0").mkString("[", ",", "]")
      val proj = s"list_reduce(list_transform(range(1, ${dim + 1}), " +
        s"j -> CAST(embedding[j] AS DOUBLE) * ($signs)[j]), (a, b) -> a + b)"
      s"(CASE WHEN $proj > 0 THEN ${1L << i} ELSE 0 END)"
    }
    terms.mkString(" + ")
  }
}
