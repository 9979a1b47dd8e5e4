package graft.plans

import graft.functions._
import graft.geom.GeomCodec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Catalyst optimizer rules for spatial predicates — the Spark-native
 * analog of the reference's query planning (geomesa-core/.../index/
 * STIdxStrategy.planQuery:219-257 turns a spatial filter into coarse key
 * ranges + an exact re-check; here the "ranges" are plain lon/lat/cell
 * comparisons Catalyst pushes into the parquet scan, and the exact ST_*
 * predicate stays in the Filter).
 *
 * 1. Whole-world elision (FilterHelper.isFilterWholeWorld:76-89):
 *    st_contains(<world box literal>, g) → IsNotNull(g).
 * 2. BBox derivation: st_contains/intersects/within with a literal geometry
 *    against st_point(lonCol, latCol) gains redundant range conjuncts
 *    lon BETWEEN … AND lat BETWEEN … from the literal's ENVELOPE (sound
 *    over-approximation for any geometry shape). Those plain comparisons
 *    reach FileScan PushedFilters → row-group / partition pruning, which is
 *    this engine's replacement for Accumulo key-range planning.
 */
object SpatialRules {

  /** Envelope of a foldable WKB geometry expression, if any. */
  private def litEnvelope(e: Expression): Option[(Double, Double, Double, Double)] =
    if (e.foldable && e.dataType == org.apache.spark.sql.types.BinaryType) {
      e.eval() match {
        case b: Array[Byte] =>
          val env = GeomCodec.fromWkb(b).getEnvelopeInternal
          Some((env.getMinX, env.getMinY, env.getMaxX, env.getMaxY))
        case _ => None
      }
    } else None

  private def isWorld(env: (Double, Double, Double, Double)): Boolean =
    env._1 <= -180.0 && env._2 <= -90.0 && env._3 >= 180.0 && env._4 >= 90.0

  /** JTS contains() excludes the boundary, so contains-elision is only
    * sound when the literal strictly exceeds the world bounds. */
  private def isWorldStrict(env: (Double, Double, Double, Double)): Boolean =
    env._1 < -180.0 && env._2 < -90.0 && env._3 > 180.0 && env._4 > 90.0

  private def isRectLit(e: Expression): Boolean = e.foldable && (e.eval() match {
    case b: Array[Byte] => GeomCodec.fromWkb(b).isRectangle
    case _ => false
  })

  /** Range conjuncts implied by "point (x,y) interacts with litGeom". */
  private def pointRanges(x: Expression, y: Expression,
                          env: (Double, Double, Double, Double)): Seq[Expression] = Seq(
    GreaterThanOrEqual(x, Literal(env._1)), LessThanOrEqual(x, Literal(env._3)),
    GreaterThanOrEqual(y, Literal(env._2)), LessThanOrEqual(y, Literal(env._4)))

  /** Derived (litGeomSide, pointSide) for predicates where a point row
    * matching implies the point lies in the literal's envelope. */
  private def derive(cond: Expression): Seq[Expression] = cond match {
    case StContains(l, StPoint(x, y)) => litEnvelope(l).toSeq.flatMap(pointRanges(x, y, _))
    case StIntersects(l, StPoint(x, y)) => litEnvelope(l).toSeq.flatMap(pointRanges(x, y, _))
    case StIntersects(StPoint(x, y), l) => litEnvelope(l).toSeq.flatMap(pointRanges(x, y, _))
    case StCovers(l, StPoint(x, y)) => litEnvelope(l).toSeq.flatMap(pointRanges(x, y, _))
    case StWithin(StPoint(x, y), l) => litEnvelope(l).toSeq.flatMap(pointRanges(x, y, _))
    case _ => Seq.empty
  }

  /** Split a conjunction into its conjuncts. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  /** Rule: replace whole-world spatial predicates with a null check.
    *
    * DATA CONTRACT: sound only for coordinates within ±180/±90 — a row with
    * out-of-range lon/lat would flip from false to true under the rewrite.
    * The engine's ingest surface enforces the contract
    * (IngestExport.enforceLonLatDomain: reject or clamp); disable here via
    * `elideWholeWorld = false` for pipelines that ingest unvalidated
    * coordinates. */
  @volatile var elideWholeWorld: Boolean = true
  object WholeWorldElision extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = if (!elideWholeWorld) plan else plan.transformAllExpressions {
      case p @ StContains(l, g) if litEnvelope(l).exists(isWorldStrict) && isRectLit(l) =>
        IsNotNull(g) // predicate was null-intolerant: null geom stays filtered
      case p @ StCovers(l, g) if litEnvelope(l).exists(isWorld) && isRectLit(l) =>
        IsNotNull(g)
      case p @ StIntersects(l, g) if litEnvelope(l).exists(isWorld) && isRectLit(l) =>
        IsNotNull(g)
      case p @ StIntersects(g, l) if litEnvelope(l).exists(isWorld) && isRectLit(l) =>
        IsNotNull(g)
    }
  }

  /** Rule: add pushdown-able lon/lat range conjuncts next to exact spatial
    * predicates on points (idempotent: skips conjuncts already present). */
  object SpatialFilterPushdown extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
      case f @ Filter(cond, child) =>
        val existing = conjuncts(cond)
        val derived = existing.flatMap(derive)
          .filterNot(d => existing.exists(_.semanticEquals(d)))
          .distinct
        if (derived.isEmpty) f
        else Filter(derived.foldLeft(cond)(And(_, _)), child)
    }
  }

  /** All graft optimizer rules, in application order. */
  val all: Seq[Rule[LogicalPlan]] = Seq(WholeWorldElision, SpatialFilterPushdown, SpatialJoinRewrite)
}

/**
 * Session installer: `spark.sql.extensions=graft.plans.GraftExtensions` at
 * build time, or `GraftExtensions.install(spark)` on a live session.
 */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    SpatialRules.all.foreach(r => ext.injectOptimizerRule(_ => r))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cql_filter"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.cql.Ecql", "cql_filter"),
      graft.cql.Ecql.sqlBuilder))
  }
}

object GraftExtensions {
  /** Register functions + optimizer rules on an existing session. */
  def install(spark: SparkSession): Unit = {
    graft.functions.st.register(spark)
    graft.functions.tx.register(spark)
    graft.functions.vx.register(spark)
    graft.functions.mx.register(spark)
    graft.cql.Ecql.register(spark)
    val current = spark.experimental.extraOptimizations
    val missing = SpatialRules.all.filterNot(r => current.exists(_ eq r))
    spark.experimental.extraOptimizations = current ++ missing
  }
}
