package graft.ops

import graft.functions.st
import graft.geom.Geodesy
import graft.index.Z2
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Spatio-temporal operators: tube-select (track join) and proximity join —
 * the reference's multi-query client-side geoprocesses
 * (geomesa-core/.../process/tube/TubeSelectProcess.scala:152-200,
 * process/proximity/ProximitySearchProcess.scala:42-127) re-expressed as
 * single distributed joins keyed on (Z2 cell, time bin) — the composite
 * key mirrors the reference's geohash~date row tier
 * (AccumuloDataStore.scala:100-111) so hot cells split across time bins.
 */
object SpatioTemporal {

  /** Pick a cover resolution so a 2r x 2r degree box covers ≤ ~budget cells. */
  private[ops] def resForRadius(radiusDeg: Double, budget: Int = 16): Int = {
    val levels = Array(3, 5, 7, 9, 12, 15)
    Z2.chooseRes(0.0, 0.0, math.min(360.0, 2 * radiusDeg), math.min(180.0, 2 * radiusDeg),
      budget, levels)
  }

  /**
   * Tube-select, NoGapFill point-buffer semantics (reference
   * TubeBuilder.scala:120-147): data rows within `bufferDeg` planar degrees
   * AND `tolSec` seconds of ANY track point, deduped per (tube, data id).
   *
   * Plan shape: both sides exploded onto a composite (space cell, time bin)
   * key → hash equi-join → exact refine → distinct. Time bins bound the
   * join fan-out of spatial hot cells; `periodSec = tolSec` keeps each
   * track point in ≤ 3 bins.
   */
  def tubeSelect(
      track: DataFrame, tidName: String, tlonName: String, tlatName: String, tsecName: String,
      data: DataFrame, idName: String, lonName: String, latName: String, secName: String,
      bufferDeg: Double, tolSec: Long,
      broadcastTrack: Option[Boolean] = None): DataFrame = {
    val res = resForRadius(bufferDeg)
    val periodSec = math.max(1L, tolSec)
    val MaxBroadcastTrack = 200000L

    val t = track
      .withColumn("__cell", explode(st.cellCover(
        st.makeBox(col(tlonName) - bufferDeg, col(tlatName) - bufferDeg,
          col(tlonName) + bufferDeg, col(tlatName) + bufferDeg), lit(res))))
      .withColumn("__bin", explode(sequence(
        st.timeBin(col(tsecName) - tolSec, lit(periodSec)),
        st.timeBin(col(tsecName) + tolSec, lit(periodSec)))))

    val d = data
      .withColumn("__cell", st.z2Encode(col(lonName), col(latName), lit(res)))
      .withColumn("__bin", st.timeBin(col(secName), lit(periodSec)))

    // broadcast the SMALLER exploded side (plan-stats estimate, no job):
    // track explodes ~30x (cells × bins), data adds two long columns
    val limit = BigInt(256L * 1024 * 1024)
    val trackEst = track.queryExecution.optimizedPlan.stats.sizeInBytes * 30
    val dataEst = data.queryExecution.optimizedPlan.stats.sizeInBytes
    val joined = broadcastTrack match {
      case Some(true) => d.join(broadcast(t), Seq("__cell", "__bin"), "inner")
      case Some(false) => d.join(t, Seq("__cell", "__bin"), "inner")
      case None =>
        if (trackEst <= dataEst && trackEst <= limit)
          d.join(broadcast(t), Seq("__cell", "__bin"), "inner")
        else if (dataEst < trackEst && dataEst <= limit)
          broadcast(d).join(t, Seq("__cell", "__bin"), "inner")
        else d.join(t, Seq("__cell", "__bin"), "inner")
    }
    val dx = joined(lonName) - joined(tlonName)
    val dy = joined(latName) - joined(tlatName)
    joined
      .filter(dx * dx + dy * dy < lit(bufferDeg) * lit(bufferDeg) &&
        abs(joined(secName) - joined(tsecName)) <= tolSec)
      .select(col(tidName), col(idName))
      .distinct()
  }

  /**
   * Proximity join (reference J2): data points within `meters` of any
   * center point, geodetic (haversine) exact refine after a conservative
   * degree-box cell join (meters→degrees over-cover:
   * GeometryUtils.scala:34-55).
   */
  def proximityJoin(
      centers: DataFrame, clonName: String, clatName: String,
      points: DataFrame, plonName: String, platName: String,
      meters: Double): DataFrame = {
    // conservative per-row degree radius (depends on center latitude)
    val radiusDeg = udfFreeMetersToDeg(col(clatName), meters)
    val xmin = col(clonName) - radiusDeg
    val xmax = col(clonName) + radiusDeg
    val ymin = greatest(lit(-90.0), col(clatName) - radiusDeg)
    val ymax = least(lit(90.0), col(clatName) + radiusDeg)
    // antimeridian safety (reference getInternationalDateLineSafeGeometry,
    // GeohashUtils.scala:665-721): a buffer crossing ±180 splits into the
    // clamped box plus its wrapped remainder; lon ranges are disjoint so a
    // point matches at most one box — no dedupe needed
    val mainBox = st.makeBox(greatest(lit(-180.0), xmin), ymin, least(lit(180.0), xmax), ymax)
    val wrapLow = when(xmin < -180.0,
      st.makeBox(xmin + 360.0, ymin, lit(180.0), ymax))
    val wrapHigh = when(xmax > 180.0,
      st.makeBox(lit(-180.0), ymin, xmax - 360.0, ymax))
    val boxes = centers
      .withColumn("__cbox", explode(array_compact(array(mainBox, wrapLow, wrapHigh))))
    SpatialJoin.polygonsWithPoints(
        boxes, col("__cbox"), points, st.point(col(plonName), col(platName)),
        df => st.distanceSphere(st.point(df(clonName), df(clatName)),
          st.point(df(plonName), df(platName))) < meters)
      .drop("__cbox")
  }

  /** metersToDegrees as a column formula (no UDF): max(lat-deg, lon-deg at
    * the center's parallel), matching Geodesy.metersToDegrees. */
  private def udfFreeMetersToDeg(lat: Column, meters: Double): Column = {
    val latDeg = lit(meters / 111320.0)
    val lonDeg = lit(meters) / (lit(111320.0) * greatest(lit(1e-6), cos(radians(least(lit(89.9), abs(lat))))))
    greatest(latDeg, lonDeg)
  }

  /**
   * XZ2 extents join: each left extent is indexed at exactly ONE cell
   * (xz2_encode) — no multi-index duplicates, no dedupe — and each query
   * window probes with xz2_query_cover. Exact st_intersects refine.
   * (Reference contrast: multi-geohash decomposition + DeDuplicatingIterator,
   * STIndexEntry.scala:45-59 + QueryPlanner.scala:84-93.)
   */
  def xzIntersectsJoin(
      extents: DataFrame, extGeomName: String,
      windows: DataFrame, winGeomName: String,
      maxRes: Int = 10, coverBudget: Int = 65536): DataFrame = {
    // plan-time budget degrade (reference overflow path QueryPlanners.scala:
    // 344-360): one tiny aggregation over the (query) window side finds the
    // widest window; the finest enumerated resolution is capped so every
    // window's cumulative cover fits the budget. BOTH sides use the capped
    // res — encoding finer than the cover enumerates would miss matches.
    // A large window thus degrades to a coarser (slower, still sound) plan
    // instead of a runtime exception.
    val env = windows.agg(
      max(st.xmax(col(winGeomName)) - st.xmin(col(winGeomName))).as("w"),
      max(st.ymax(col(winGeomName)) - st.ymin(col(winGeomName))).as("h")).head()
    val res =
      if (env.isNullAt(0) || env.isNullAt(1)) maxRes
      else math.min(maxRes,
        graft.index.XZ2.maxResForBudget(env.getDouble(0), env.getDouble(1), maxRes, coverBudget))
    val e = extents.withColumn("__xcell", st.xz2(col(extGeomName), lit(res)))
    val w = windows.withColumn("__xcell",
      explode(st.xz2QueryCover(col(winGeomName), lit(res))))
    val joined = e.join(w, Seq("__xcell"), "inner")
    joined.filter(st.intersects(joined(extGeomName), joined(winGeomName)))
      .drop("__xcell")
  }

  /**
   * Line-gap-fill tube (reference LineGapFill, TubeBuilder.scala:160-190):
   * consecutive track points (by time, per tube) are interpolated with
   * extra waypoints so sparse tracks still form a continuous tube; the
   * densified track then runs through the point-buffer tubeSelect. The
   * window/lag shape is the reference's sliding(2) over the sorted track
   * (W3), done distributed per tube id.
   */
  def tubeSelectLine(
      track: DataFrame, tidName: String, tlonName: String, tlatName: String, tsecName: String,
      data: DataFrame, idName: String, lonName: String, latName: String, secName: String,
      bufferDeg: Double, tolSec: Long, waypoints: Int = 4,
      broadcastTrack: Option[Boolean] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(tidName).orderBy(tsecName)
    val seg = track
      .withColumn("__nlon", lag(col(tlonName), -1).over(w))
      .withColumn("__nlat", lag(col(tlatName), -1).over(w))
      .withColumn("__nsec", lag(col(tsecName), -1).over(w))
    // densify: fraction f = i/waypoints along each segment (endpoint owned
    // by the next segment; last row keeps only its own point)
    val densified = seg
      .withColumn("__i", explode(sequence(lit(0), lit(waypoints - 1))))
      .filter(col("__i") === 0 || col("__nlon").isNotNull)
      .select(
        col(tidName),
        (when(col("__nlon").isNotNull,
            col(tlonName) + (col("__nlon") - col(tlonName)) * col("__i") / waypoints)
          .otherwise(col(tlonName))).as(tlonName),
        (when(col("__nlat").isNotNull,
            col(tlatName) + (col("__nlat") - col(tlatName)) * col("__i") / waypoints)
          .otherwise(col(tlatName))).as(tlatName),
        // floor() the fractional part rather than casting the sum: CAST of a
        // double rounds in some engines (DuckDB) but truncates in Spark;
        // floor is unambiguous, so the DuckDB oracle reproduces it exactly
        (when(col("__nsec").isNotNull,
            col(tsecName) + floor((col("__nsec") - col(tsecName)) * col("__i") / waypoints).cast("long"))
          .otherwise(col(tsecName))).as(tsecName))
    tubeSelect(densified, tidName, tlonName, tlatName, tsecName,
      data, idName, lonName, latName, secName, bufferDeg, tolSec, broadcastTrack)
  }
}
