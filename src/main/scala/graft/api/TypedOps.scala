package graft.api

import graft.functions.st
import org.apache.spark.sql.{Column, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Typed Dataset surface (north star: "typed Dataset operators"). The
 * spatial joins are `joinWith` pair-joins — the result keeps BOTH rows
 * fully typed as `Dataset[(L, R)]` — with the raw ST_* theta condition;
 * the [[graft.plans.SpatialJoinRewrite]] optimizer rule then turns that
 * condition into a cell equi-join (shape 1 for point probes, shape 2 XZ2
 * for geometry×geometry), so the typed API pays ZERO plan penalty vs the
 * DataFrame operators: same broadcast/hash/AQE strategies, no nested
 * loop. Requires [[graft.plans.GraftExtensions.install]] on the session.
 *
 * Lenses are `Dataset[T] => Column` so callers point at their fields
 * without the library assuming names:
 *   `typedOps.containsJoin(regions, r => st.makeBox(r("x0"), ...), pages,
 *    p => st.point(p("lon"), p("lat")))`
 */
object typedOps {

  /** Polygon-contains-point pair join: Dataset[(poly, point)]. Curried so
    * the dataset types fix L/R before the lens lambdas are checked. */
  def containsJoin[L, R](polys: Dataset[L], points: Dataset[R])(
      polyGeom: Dataset[L] => Column, pointGeom: Dataset[R] => Column): Dataset[(L, R)] =
    polys.joinWith(points, st.contains(polyGeom(polys), pointGeom(points)), "inner")

  /** Geometry×geometry intersects pair join (XZ2 rewrite — dedup-safe). */
  def intersectsJoin[L, R](left: Dataset[L], right: Dataset[R])(
      leftGeom: Dataset[L] => Column, rightGeom: Dataset[R] => Column): Dataset[(L, R)] =
    left.joinWith(right, st.intersects(leftGeom(left), rightGeom(right)), "inner")

  /** Point-within-degrees pair join. */
  def dwithinJoin[L, R](centers: Dataset[L], points: Dataset[R], radiusDeg: Double)(
      centerGeom: Dataset[L] => Column, pointGeom: Dataset[R] => Column): Dataset[(L, R)] =
    centers.joinWith(points,
      st.dwithinDeg(centerGeom(centers), pointGeom(points), lit(radiusDeg)), "inner")

  /** kNN hit: query key, data key, 1-based rank. */
  case class KnnHit(qid: Long, id: Long, rank: Long)

  /** Typed kNN join over long-keyed sides (planar or geodetic — delegates
    * to the ladder join, so the plan is the provable-bound ring join). */
  def knnJoin[Q, D](queries: Dataset[Q], qid: String, qlon: String, qlat: String,
                    data: Dataset[D], dlon: String, dlat: String, did: String,
                    k: Int, res: Int = 7, geodetic: Boolean = false): Dataset[KnnHit] = {
    implicit val enc: Encoder[KnnHit] = Encoders.product[KnnHit]
    graft.ops.SpatialJoin.knnJoin(
        queries.toDF(), qid, qlon, qlat, data.toDF(), dlon, dlat, did, k, res, geodetic)
      .select(col(qid).cast("long").as("qid"), col(did).cast("long").as("id"), col("rank"))
      .as[KnnHit]
  }

  /** Typed exact-dedup survivors: keep the min-key row per distinct value
    * of `by`, preserving the row type. */
  def dedupSurvivors[T](ds: Dataset[T])(by: Dataset[T] => Column,
                        tieBreak: Dataset[T] => Column): Dataset[T] = {
    import org.apache.spark.sql.expressions.Window
    implicit val enc: Encoder[T] = ds.encoder
    val w = Window.partitionBy(by(ds)).orderBy(tieBreak(ds).asc)
    ds.toDF().withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn").as[T]
  }
}
