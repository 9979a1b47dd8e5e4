package graft.geom

/**
 * Geodetic math. The reference measures point distance with Vincenty on the
 * WGS84 ellipsoid (geomesa-utils/.../geohash/GeomDistance.scala:84-140) and
 * converts meter buffers to local degree equivalents
 * (geomesa-utils/.../GeometryUtils.scala:34-55). Re-derived here from the
 * published Vincenty inverse formula (Vincenty 1975) — not copied.
 */
object Geodesy {
  val EarthRadiusMeters = 6371008.8 // mean radius (IUGG)
  private val WGS84_A = 6378137.0
  private val WGS84_B = 6356752.314245
  private val WGS84_F = 1.0 / 298.257223563

  /** WGS84 semi-minor axis — the radius of the inscribed sphere; chord
    * bounds through it lower-bound any surface path on the ellipsoid. */
  val PolarRadiusMeters: Double = WGS84_B

  /** Great-circle distance in meters (spherical haversine). */
  def haversineMeters(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2.0 * EarthRadiusMeters * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** Vincenty inverse distance in meters on WGS84. Falls back to haversine
   *  on non-convergence (antipodal points). */
  def vincentyMeters(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    if (lon1 == lon2 && lat1 == lat2) return 0.0
    val L = math.toRadians(lon2 - lon1)
    val u1 = math.atan((1 - WGS84_F) * math.tan(math.toRadians(lat1)))
    val u2 = math.atan((1 - WGS84_F) * math.tan(math.toRadians(lat2)))
    val sinU1 = math.sin(u1); val cosU1 = math.cos(u1)
    val sinU2 = math.sin(u2); val cosU2 = math.cos(u2)
    var lambda = L
    var iter = 0
    var cosSqAlpha = 0.0; var sinSigma = 0.0; var cosSigma = 0.0
    var sigma = 0.0; var cos2SigmaM = 0.0
    var converged = false
    while (iter < 100 && !converged) {
      val sinL = math.sin(lambda); val cosL = math.cos(lambda)
      sinSigma = math.sqrt(math.pow(cosU2 * sinL, 2) +
        math.pow(cosU1 * sinU2 - sinU1 * cosU2 * cosL, 2))
      if (sinSigma == 0.0) return 0.0
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosL
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinL / sinSigma
      cosSqAlpha = 1 - sinAlpha * sinAlpha
      cos2SigmaM = if (cosSqAlpha == 0.0) 0.0 else cosSigma - 2 * sinU1 * sinU2 / cosSqAlpha
      val c = WGS84_F / 16 * cosSqAlpha * (4 + WGS84_F * (4 - 3 * cosSqAlpha))
      val prev = lambda
      lambda = L + (1 - c) * WGS84_F * sinAlpha *
        (sigma + c * sinSigma * (cos2SigmaM + c * cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM)))
      if (math.abs(lambda - prev) < 1e-12) converged = true
      iter += 1
    }
    if (!converged) return haversineMeters(lon1, lat1, lon2, lat2)
    val uSq = cosSqAlpha * (WGS84_A * WGS84_A - WGS84_B * WGS84_B) / (WGS84_B * WGS84_B)
    val a = 1 + uSq / 16384 * (4096 + uSq * (-768 + uSq * (320 - 175 * uSq)))
    val b = uSq / 1024 * (256 + uSq * (-128 + uSq * (74 - 47 * uSq)))
    val dSigma = b * sinSigma * (cos2SigmaM + b / 4 *
      (cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM) -
        b / 6 * cos2SigmaM * (-3 + 4 * sinSigma * sinSigma) * (-3 + 4 * cos2SigmaM * cos2SigmaM)))
    WGS84_B * a * (sigma - dSigma)
  }

  /** Vincenty DIRECT problem on WGS84: the destination point `meters`
    * along `bearingDeg` (clockwise from north) from (lon, lat). Reference
    * analog: VincentyModel.moveWithBearingAndDistance
    * (geomesa-utils/.../geohash/GeomDistance.scala); re-derived from the
    * published direct formula (Vincenty 1975), not copied.
    * @return (lon, lat) of the destination, degrees */
  def vincentyMove(lon: Double, lat: Double, bearingDeg: Double,
                   meters: Double): (Double, Double) = {
    val alpha1 = math.toRadians(bearingDeg)
    val sinA1 = math.sin(alpha1); val cosA1 = math.cos(alpha1)
    val tanU1 = (1 - WGS84_F) * math.tan(math.toRadians(lat))
    val cosU1 = 1 / math.sqrt(1 + tanU1 * tanU1)
    val sinU1 = tanU1 * cosU1
    val sigma1 = math.atan2(tanU1, cosA1)
    val sinAlpha = cosU1 * sinA1
    val cosSqAlpha = 1 - sinAlpha * sinAlpha
    val uSq = cosSqAlpha * (WGS84_A * WGS84_A - WGS84_B * WGS84_B) / (WGS84_B * WGS84_B)
    val a = 1 + uSq / 16384 * (4096 + uSq * (-768 + uSq * (320 - 175 * uSq)))
    val b = uSq / 1024 * (256 + uSq * (-128 + uSq * (74 - 47 * uSq)))
    var sigma = meters / (WGS84_B * a)
    var cos2SigmaM = 0.0; var sinSigma = 0.0; var cosSigma = 0.0
    var iter = 0
    var converged = false
    while (iter < 100 && !converged) {
      cos2SigmaM = math.cos(2 * sigma1 + sigma)
      sinSigma = math.sin(sigma); cosSigma = math.cos(sigma)
      val dSigma = b * sinSigma * (cos2SigmaM + b / 4 *
        (cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM) -
          b / 6 * cos2SigmaM * (-3 + 4 * sinSigma * sinSigma) * (-3 + 4 * cos2SigmaM * cos2SigmaM)))
      val prev = sigma
      sigma = meters / (WGS84_B * a) + dSigma
      if (math.abs(sigma - prev) < 1e-12) converged = true
      iter += 1
    }
    val tmp = sinU1 * sinSigma - cosU1 * cosSigma * cosA1
    val lat2 = math.atan2(sinU1 * cosSigma + cosU1 * sinSigma * cosA1,
      (1 - WGS84_F) * math.sqrt(sinAlpha * sinAlpha + tmp * tmp))
    val lambda = math.atan2(sinSigma * sinA1, cosU1 * cosSigma - sinU1 * sinSigma * cosA1)
    val c = WGS84_F / 16 * cosSqAlpha * (4 + WGS84_F * (4 - 3 * cosSqAlpha))
    val dL = lambda - (1 - c) * WGS84_F * sinAlpha *
      (sigma + c * sinSigma * (cos2SigmaM + c * cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM)))
    val lon2 = lon + math.toDegrees(dL)
    // normalize into ±180 (a move across the antimeridian must stay valid)
    val lonN = if (lon2 > 180) lon2 - 360 else if (lon2 < -180) lon2 + 360 else lon2
    (lonN, math.toDegrees(lat2))
  }

  /** Degrees of longitude/latitude that over-cover `meters` at `lat`
   *  (reference rewrite: DWithin meters → degree buffer,
   *  FilterHelper.scala:111-123). Uses the shrunk parallel for lon so the
   *  buffer is conservative (never under-covers). */
  def metersToDegrees(meters: Double, lat: Double): Double = {
    val latDeg = meters / 111320.0 // meters per degree latitude (max)
    val cos = math.cos(math.toRadians(math.min(89.9, math.abs(lat))))
    val lonDeg = meters / (111320.0 * math.max(1e-6, cos))
    math.max(latDeg, lonDeg)
  }
}
