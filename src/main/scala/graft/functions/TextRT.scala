package graft.functions

/**
 * Text-analysis kernels for web-scale training-data pipelines: MinHash
 * signatures, SimHash, rolling-hash fingerprints, n-gram language guess,
 * quality scoring. Pure static functions over String so the corresponding
 * Catalyst expressions stay codegen-friendly. All hashing is FNV-1a /
 * splitmix64 (public-domain constants) — deterministic across JVMs.
 */
object TextRT {

  @inline def fnv1a64(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  @inline def mix64(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // precompiled: String.split recompiles a multi-char regex on every call,
  // and tokens() runs per document in every signature/verify kernel
  private val TokenSplit = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")

  def tokens(text: String): Array[String] =
    TokenSplit.split(text.toLowerCase).filter(_.nonEmpty)

  /** MinHash signature over word shingles: sig(i) = min over shingles of
   *  mix64(fnv1a(shingle) + i*GOLDEN). One pass over the text. */
  def minHash(text: String, numHashes: Int, shingleSize: Int): Array[Long] = {
    val ts = tokens(text)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    if (ts.length >= shingleSize) {
      var i = 0
      while (i <= ts.length - shingleSize) {
        var base = 0xcbf29ce484222325L
        var j = 0
        while (j < shingleSize) {
          val w = ts(i + j)
          var k = 0
          while (k < w.length) { base ^= w.charAt(k).toLong; base *= 0x100000001b3L; k += 1 }
          base ^= ' '.toLong; base *= 0x100000001b3L
          j += 1
        }
        var h = 0
        while (h < numHashes) {
          val v = mix64(base + h * 0x9e3779b97f4a7c15L)
          if (v < sig(h)) sig(h) = v
          h += 1
        }
        i += 1
      }
    }
    sig
  }

  /** LSH band keys from a MinHash signature: bands of `rowsPerBand` hashes
   *  folded to one long each; docs sharing any band key are candidates. */
  def lshBands(sig: Array[Long], rowsPerBand: Int): Array[Long] = {
    val nBands = sig.length / rowsPerBand
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var h = 0xcbf29ce484222325L ^ b.toLong
      var r = 0
      while (r < rowsPerBand) { h ^= sig(b * rowsPerBand + r); h *= 0x100000001b3L; r += 1 }
      out(b) = (h & 0x7fffffffffffffffL) | (b.toLong << 56) // band id in high bits
      b += 1
    }
    out
  }

  /** 64-bit SimHash over tokens. */
  def simHash(text: String): Long = {
    val counts = new Array[Int](64)
    val ts = tokens(text)
    var i = 0
    while (i < ts.length) {
      val h = mix64(fnv1a64(ts(i), 0L))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hammingDist(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Rolling-hash document fingerprint: min over Rabin-style hashes of
   *  consecutive non-overlapping char windows (winnowing-flavored;
   *  deterministic). */
  def fingerprint(text: String, window: Int): Long = {
    if (text.isEmpty) return 0L
    var minH = Long.MaxValue
    var h = 0L
    var fill = 0
    var i = 0
    while (i < text.length) {
      h = h * 257L + text.charAt(i).toLong
      fill += 1
      if (fill == window) {
        val m = mix64(h)
        if (m < minH) minH = m
        h = 0L; fill = 0
      }
      i += 1
    }
    if (fill > 0) { val m = mix64(h); if (m < minH) minH = m }
    minH
  }

  /** The word-n-gram FNV hash SET of [[ngramJaccard]] as a SORTED distinct
   *  array — computed ONCE per document so the LSH verify tail can score a
   *  candidate pair by merging two sorted arrays instead of re-tokenizing
   *  and re-hashing both texts per pair (a doc in k candidate pairs paid
   *  the shingling k times; measured as the dominant CPU of the 4M-doc
   *  pipeline's verify stage). Same gram loop and constants as
   *  [[ngramJaccard]], so [[sortedJaccard]] over these arrays returns the
   *  identical double. */
  def shingleHashes(s: String, n: Int): Array[Long] = {
    val ts = tokens(s)
    val set = new java.util.HashSet[Long]()
    var i = 0
    while (i <= ts.length - n) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < n) {
        val w = ts(i + j); var k = 0
        while (k < w.length) { h ^= w.charAt(k).toLong; h *= 0x100000001b3L; k += 1 }
        h ^= ' '.toLong; h *= 0x100000001b3L
        j += 1
      }
      set.add(h)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    java.util.Arrays.sort(out)
    out
  }

  /** Jaccard of two SORTED distinct hash arrays (the [[shingleHashes]]
   *  form): |A∩B| / |A∪B| by linear merge — exactly [[ngramJaccard]]'s
   *  value, including the both-empty ⇒ 1.0 convention. */
  def sortedJaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter).toDouble
  }

  /** Jaccard similarity of word n-gram sets (exact verification step after
   *  LSH candidate generation). */
  def ngramJaccard(a: String, b: String, n: Int): Double = {
    def grams(s: String): java.util.HashSet[Long] = {
      val ts = tokens(s)
      val set = new java.util.HashSet[Long]()
      var i = 0
      while (i <= ts.length - n) {
        var h = 0xcbf29ce484222325L
        var j = 0
        while (j < n) {
          val w = ts(i + j); var k = 0
          while (k < w.length) { h ^= w.charAt(k).toLong; h *= 0x100000001b3L; k += 1 }
          h ^= ' '.toLong; h *= 0x100000001b3L
          j += 1
        }
        set.add(h)
        i += 1
      }
      set
    }
    val ga = grams(a); val gb = grams(b)
    if (ga.isEmpty && gb.isEmpty) return 1.0
    var inter = 0
    val it = ga.iterator()
    while (it.hasNext) if (gb.contains(it.next())) inter += 1
    inter.toDouble / (ga.size + gb.size - inter).toDouble
  }

  /** Stopword profiles (exposed so the DuckDB oracle SQL is generated from
    * the same lists). */
  val stopwords: Map[String, Array[String]] = Map(
    "en" -> Array(" the ", " and ", " of ", " to ", " in ", " is ", " that ", " it ", " with ", " for "),
    "de" -> Array(" der ", " die ", " und ", " das ", " ist ", " nicht ", " ein ", " mit ", " auf ", " von "),
    "fr" -> Array(" le ", " la ", " les ", " et ", " est ", " des ", " une ", " dans ", " que ", " pour "),
    "es" -> Array(" el ", " la ", " los ", " y ", " es ", " en ", " que ", " una ", " por ", " con "))

  /** Stopword-profile language guess over {en,de,fr,es} (n-gram heuristic;
   *  ties broken by fixed language order). Occurrence counting is
   *  NON-overlapping (advance past each match) — the single-pass replace
   *  semantics plain SQL can reproduce, so the gate query is
   *  oracle-checkable. */
  def langGuess(text: String): String = {
    val t = " " + text.toLowerCase + " "
    var best = "en"; var bestScore = -1
    for (lang <- Array("en", "de", "fr", "es")) {
      var score = 0
      val words = stopwords(lang)
      var i = 0
      while (i < words.length) {
        val w = words(i)
        var idx = t.indexOf(w)
        while (idx >= 0) { score += 1; idx = t.indexOf(w, idx + w.length) }
        i += 1
      }
      if (score > bestScore) { bestScore = score; best = lang }
    }
    best
  }

  /** Heuristic quality score in [0,1]: length, alpha ratio, mean word
   *  length sanity — the usual web-text filters. */
  def qualityScore(text: String): Double = {
    if (text.isEmpty) return 0.0
    val len = text.length
    var alpha = 0; var spaces = 0
    var i = 0
    while (i < len) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) alpha += 1
      else if (c == ' ') spaces += 1
      i += 1
    }
    val alphaRatio = alpha.toDouble / len
    val words = spaces + 1
    val meanWordLen = (len - spaces).toDouble / words
    val lenScore = math.min(1.0, len / 500.0)
    val wordLenScore = if (meanWordLen >= 3.0 && meanWordLen <= 12.0) 1.0 else 0.3
    0.4 * alphaRatio + 0.3 * lenScore + 0.3 * wordLenScore
  }

  private val DmsRegex = "(-?)(\\d{2,3}):?(\\d{2}):?(\\d{2}(?:\\.\\d+)?)([NnSsEeWw])".r

  /**
   * DMS ("38:04:31.17N" / "380431.17N" / signed) → decimal degrees
   * (reference F9: geomesa-core/.../csv/DMS.scala:44-67 — same regex, sign
   * flips the hemisphere, bounds checked). Returns NaN for unparseable or
   * out-of-range input (the Catalyst expression surfaces that as null —
   * SQL-idiomatic, where the reference throws).
   */
  def dmsToDeg(s: String): Double = s match {
    case DmsRegex(sign, degS, minS, secS, hemiS) =>
      val hUp = hemiS.head.toUpper
      val baseSign = if (hUp == 'N' || hUp == 'E') 1 else -1
      val effSign = if (sign.isEmpty) baseSign else -baseSign
      val maxDeg = if (hUp == 'N' || hUp == 'S') 90 else 180
      val d = degS.toInt; val m = minS.toInt; val sec = secS.toDouble
      val v = d + (m + sec / 60.0) / 60.0
      if (m >= 60 || sec >= 60.0 || v >= maxDeg) Double.NaN else effSign * v
    case _ => Double.NaN
  }

  /** Decimal degrees → DMS string ("dd:mm:ss.ssH" — reference DMS.toString
    * shape, with two fixes so the output always round-trips through
    * [[dmsToDeg]]: degrees are zero-padded to the regex's 2-digit minimum,
    * and seconds that round-format to 60.00 carry into minutes/degrees).
    * `isLat` selects N/S vs E/W. */
  def degToDms(deg: Double, isLat: Boolean): String = {
    val hemi = if (isLat) { if (deg >= 0) 'N' else 'S' } else { if (deg >= 0) 'E' else 'W' }
    val a = math.abs(deg)
    // fixed-point at 2-decimal seconds, then carry — avoids "59.995 → 60.00"
    var centiSec = math.round(a * 3600.0 * 100.0)
    var d = centiSec / (3600L * 100)
    centiSec -= d * 3600L * 100
    var m = centiSec / (60L * 100)
    centiSec -= m * 60L * 100
    if (centiSec >= 60L * 100) { centiSec -= 60L * 100; m += 1 } // defensive
    if (m >= 60) { m -= 60; d += 1 }
    f"$d%02d:$m%02d:${centiSec / 100.0}%05.2f$hemi%s"
  }

  /** BPE-ish token count: words + digit runs + punctuation marks. */
  def tokenCount(text: String): Int = {
    var count = 0
    var inWord = false
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      val isW = Character.isLetterOrDigit(c)
      if (isW && !inWord) count += 1
      else if (!isW && !Character.isWhitespace(c)) count += 1
      inWord = isW
      i += 1
    }
    count
  }
}
