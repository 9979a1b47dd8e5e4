package graft.ops

import graft.functions.st
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Spatial joins as cell-keyed equi-joins + exact refine — the Spark-native
 * replacement for the reference's range-scan + iterator re-check pipeline
 * (geomesa-core/.../index/STIdxStrategy.scala coarse ranges →
 * SpatioTemporalIntersectingIterator exact re-check). Coarse pruning is an
 * equi-join Catalyst can hash/broadcast/AQE-skew-optimize; exactness comes
 * from the codegen'd ST_* predicate applied after the match.
 *
 * Strategy choice (reference precedent: cost-based QueryStrategyDecider):
 * if the polygon side's exploded cover is small, broadcast it (zero shuffle
 * of the big page table); otherwise shuffle both sides on the cell key and
 * let AQE split skewed cells.
 */
object SpatialJoin {

  /** Resolution ladder (bits/dim): 8 → 64 → ... → 16.7M world cells. The
   *  adaptive cover picks the finest level whose cover fits the budget
   *  (reference cover budget: QueryPlanners.scala:272-274). */
  val DefaultLevels: Array[Int] = Array(3, 5, 7, 9, 12)
  val DefaultBudget = 256

  /** Rows (post-explode) under which the cover side is broadcast. */
  val BroadcastCoverRows = 2000000L

  /**
   * Join polygons/boxes against points: emit (poly row ++ point row) pairs
   * where `refine` holds. Each polygon is covered at ONE adaptive
   * resolution; each point emits its ancestor cell at every ladder level,
   * so every qualifying pair matches on exactly one cell — no duplicates,
   * no post-join dedupe (the reference needs dedupe because non-point
   * geometries are multi-indexed; single-resolution covers avoid that,
   * cf. mayContainDuplicates, IndexSchema.scala:312-319).
   */
  def polygonsWithPoints(
      polys: DataFrame, polyGeom: Column,
      points: DataFrame, pointGeom: Column,
      refine: DataFrame => Column,
      levels: Array[Int] = DefaultLevels,
      budget: Int = DefaultBudget,
      broadcastPolys: Option[Boolean] = None,
      salts: Int = 1): DataFrame = {

    val levelsLit = typedLit(levels)
    val polyCells = polys.withColumn("__pcell",
      explode(st.cellCoverBudget(polyGeom, lit(budget), levelsLit)))

    // finest-level cell once (one WKB parse), ancestors by bit math
    val finest = levels.last
    val withFinest = points.withColumn("__fcell", st.cellOf(pointGeom, lit(finest)))
    val ancestorCols = levels.map(r =>
      if (r == finest) col("__fcell") else st.cellParent(col("__fcell"), lit(r)))
    val pointCells = withFinest
      .withColumn("__qcell", explode(array(ancestorCols: _*)))
      .drop("__fcell")

    val doBroadcast = broadcastPolys.getOrElse {
      // plan-statistics cost probe — no job launched (the reference's
      // cost-based strategy choice, QueryStrategyDecider.scala:52-110,
      // reads cardinality metadata the same way). Covers multiply rows by
      // at most `budget`, so scale the pre-explode size estimate.
      val bytes = polys.queryExecution.optimizedPlan.stats.sizeInBytes
      bytes * 64 <= BigInt(256L * 1024 * 1024) // 64 ≈ typical budget-capped cover size
    }

    if (doBroadcast || salts <= 1) {
      // broadcast join: the big side never shuffles, hot cells are a
      // non-issue (every task probes the same hash table)
      val buildSide = if (doBroadcast) broadcast(polyCells) else polyCells
      val joined = pointCells.join(buildSide, col("__qcell") === col("__pcell"), "inner")
      joined.filter(refine(joined)).drop("__pcell", "__qcell")
    } else {
      // shuffled path with explicit hot-cell salting (north rule: skew
      // handled explicitly; reference precedent: shard tier in the key
      // layout, AccumuloDataStore.scala:100-111). Hot cells from a probe-
      // side sample histogram; the build row for a hot cell is replicated
      // across all salts, probe rows scatter by content hash.
      val hot = hotCells(pointCells, col("__qcell"), salts)
      val hotLit = typedLit(hot.toSeq)
      val saltedBuild = polyCells.withColumn("__psalt",
        explode(when(array_contains(hotLit, col("__pcell")),
          sequence(lit(0), lit(salts - 1))).otherwise(array(lit(0)))))
      val saltedProbe = pointCells.withColumn("__qsalt",
        when(array_contains(hotLit, col("__qcell")),
          pmod(hash(pointGeom), lit(salts))).otherwise(lit(0)))
      val joined = saltedProbe.join(saltedBuild,
        col("__qcell") === col("__pcell") && col("__qsalt") === col("__psalt"), "inner")
      joined.filter(refine(joined)).drop("__pcell", "__qcell", "__psalt", "__qsalt")
    }
  }

  /** Probe-side cell histogram → cells whose estimated row count exceeds
    * `HotCellRows` (sampled; the cost model the reference drives from
    * cardinality hints, QueryStrategyDecider.scala:31-110). */
  val HotCellSampleFraction = 0.05
  val HotCellRows = 100000L
  def hotCells(pointCells: DataFrame, cellCol: Column, salts: Int): Array[Long] =
    pointCells.sample(HotCellSampleFraction, seed = 42)
      .groupBy(cellCol.as("__c")).count()
      .filter(col("count") > HotCellRows * HotCellSampleFraction)
      .select("__c").collect().map(_.getLong(0))

  /** Point-in-polygon join: st_contains(polyGeom, pointGeom) refine. */
  def containsJoin(
      polys: DataFrame, polyGeomName: String,
      points: DataFrame, pointGeomName: String,
      levels: Array[Int] = DefaultLevels,
      budget: Int = DefaultBudget): DataFrame =
    polygonsWithPoints(polys, col(polyGeomName), points, col(pointGeomName),
      df => st.contains(df(polyGeomName), df(pointGeomName)), levels, budget)

  /**
   * Geometry×geometry intersects join (both sides may be non-point): cover
   * both sides at one fixed resolution, equi-join, exact refine, then
   * dedupe on the caller's keys (non-point × non-point pairs can match in
   * several cells — the analog of the reference's DeDuplicatingIterator,
   * QueryPlanner.scala:84-93).
   */
  def intersectsJoin(
      left: DataFrame, leftGeomName: String,
      right: DataFrame, rightGeomName: String,
      keys: Seq[String],
      res: Int = 6): DataFrame = {
    val l = left.withColumn("__lcell", explode(st.cellCover(col(leftGeomName), lit(res))))
    val r = right.withColumn("__rcell", explode(st.cellCover(col(rightGeomName), lit(res))))
    val joined = l.join(r, col("__lcell") === col("__rcell"), "inner")
    joined.filter(st.intersects(joined(leftGeomName), joined(rightGeomName)))
      .drop("__lcell", "__rcell")
      .dropDuplicates(keys)
  }

  /**
   * Distance join with planar-degree radius (the oracle-parity variant; the
   * meters API wraps this via Geodesy.metersToDegrees). A within-distance
   * pair is exactly a point-in-expanded-box pair refined by the exact
   * distance test, so it reuses the cover join: centers become ±radius
   * boxes (reference DWithin → buffered-geometry rewrite,
   * FilterHelper.scala:111-123).
   */
  def dwithinDegJoin(
      centers: DataFrame, clonName: String, clatName: String,
      points: DataFrame, plonName: String, platName: String,
      radiusDeg: Double,
      levels: Array[Int] = DefaultLevels,
      budget: Int = DefaultBudget): DataFrame = {
    val boxes = centers.withColumn("__cbox",
      st.makeBox(col(clonName) - radiusDeg, col(clatName) - radiusDeg,
        col(clonName) + radiusDeg, col(clatName) + radiusDeg))
    polygonsWithPoints(boxes, col("__cbox"), points, st.point(col(plonName), col(platName)),
      df => {
        val dx = df(plonName) - df(clonName)
        val dy = df(platName) - df(clatName)
        dx * dx + dy * dy < lit(radiusDeg) * lit(radiusDeg)
      }, levels, budget)
      .drop("__cbox")
  }

  /**
   * kNN: k nearest data points per query point, planar degree distance,
   * ties broken by `dataIdName`. Small query side is broadcast and the rank
   * is a per-query window — the reference's PQ-of-geohash-rings driver
   * (KNNQuery.scala:41-105) collapses to one distributed pass. (A
   * ring-pruned variant for huge query sides is future work.)
   */
  def knnPlanar(
      queries: DataFrame, qlonName: String, qlatName: String,
      data: DataFrame, dlonName: String, dlatName: String,
      dataIdName: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = data.crossJoin(broadcast(queries))
    val dx = joined(dlonName) - joined(qlonName)
    val dy = joined(dlatName) - joined(qlatName)
    val withDist = joined.withColumn("__dist2", dx * dx + dy * dy)
    val qKeys = queries.columns.filter(c => c != qlonName && c != qlatName)
    val w = Window.partitionBy(qKeys.map(col): _*)
      .orderBy(col("__dist2").asc, col(dataIdName).asc)
    withDist.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .drop("__dist2")
  }
}
