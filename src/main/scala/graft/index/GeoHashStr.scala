package graft.index

/**
 * Base-32 geohash strings — parity with the reference's key format
 * (geomesa-utils/.../geohash/GeoHash.scala: bit-interleaved lon/lat
 * rendered in the public geohash base-32 alphabet). Internally the engine
 * uses packed-long Z2 ids (sort/join natively in Tungsten); these strings
 * exist for interchange and for prefix-key compatibility tests.
 * Implemented from the public geohash algorithm (Niemeyer 2008), not the
 * reference code.
 */
object GeoHashStr {
  private val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
  private val AlphabetIdx: Map[Char, Int] = Alphabet.zipWithIndex.toMap

  /** Encode to `chars` base-32 characters (5 bits each, lon bit first). */
  def encode(lon: Double, lat: Double, chars: Int): String = {
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    val sb = new StringBuilder(chars)
    var isLon = true
    var bit = 0
    var cur = 0
    while (sb.length < chars) {
      if (isLon) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { cur = (cur << 1) | 1; lonLo = mid }
        else { cur = cur << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { cur = (cur << 1) | 1; latLo = mid }
        else { cur = cur << 1; latHi = mid }
      }
      isLon = !isLon
      bit += 1
      if (bit == 5) { sb += Alphabet(cur); bit = 0; cur = 0 }
    }
    sb.toString
  }

  /** Decode to (lonMin, latMin, lonMax, latMax). */
  def decodeBounds(hash: String): (Double, Double, Double, Double) = {
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var isLon = true
    hash.foreach { c =>
      val v = AlphabetIdx.getOrElse(c,
        throw new IllegalArgumentException(s"bad geohash char: $c"))
      var i = 4
      while (i >= 0) {
        val b = (v >> i) & 1
        if (isLon) {
          val mid = (lonLo + lonHi) / 2
          if (b == 1) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (b == 1) latLo = mid else latHi = mid
        }
        isLon = !isLon
        i -= 1
      }
    }
    (lonLo, latLo, lonHi, latHi)
  }

  /** Decode to the cell's center point (the conventional geohash decode). */
  def decodeCenter(hash: String): (Double, Double) = {
    val (x0, y0, x1, y1) = decodeBounds(hash)
    ((x0 + x1) / 2, (y0 + y1) / 2)
  }
}
