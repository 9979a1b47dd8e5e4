package graft.plans

import graft.functions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/**
 * Logical rewrite of theta spatial joins into cell-keyed equi-joins — the
 * SQL-surface version of [[graft.ops.SpatialJoin.polygonsWithPoints]].
 * Without it, `a JOIN b ON st_contains(a.geom, st_point(b.lon, b.lat))`
 * plans as a nested-loop/cartesian join; with it, Catalyst sees an
 * equi-join key and picks hash/broadcast/AQE-skew strategies (the
 * strategy-choice role of the reference's QueryStrategyDecider,
 * geomesa-core/.../index/QueryStrategyDecider.scala:31-110).
 *
 * Soundness scope: the probe side must be a CONSTRUCTED point
 * (`st_point(x, y)`) — a point's containing cell at each ladder level is
 * unique, so polygon-side adaptive cover + point-side ancestor ladder
 * matches every qualifying pair on exactly one cell: no duplicates, no
 * dedupe, and the original predicate is kept for exact refinement.
 * Arbitrary-geometry probes are left untouched (multi-cell probes would
 * need join-output dedupe, which is unsound under SQL bag semantics).
 */
object SpatialJoinRewrite extends Rule[LogicalPlan] {

  private val Levels = graft.ops.SpatialJoin.DefaultLevels
  private val Budget = graft.ops.SpatialJoin.DefaultBudget

  /** (coverGeom, pointX, pointY) when the predicate is a supported
    * geom-contains-point shape. */
  private def asCoverPoint(e: Expression): Option[(Expression, Expression, Expression)] = e match {
    case StContains(g, StPoint(x, y)) => Some((g, x, y))
    case StCovers(g, StPoint(x, y)) => Some((g, x, y))
    case StIntersects(g, StPoint(x, y)) => Some((g, x, y))
    case StIntersects(StPoint(x, y), g) => Some((g, x, y))
    case StWithin(StPoint(x, y), g) => Some((g, x, y))
    // point-point distance join: the "cover geometry" is the ±r box around
    // one point (the DWithin→buffered-box rewrite, FilterHelper.scala:111-123)
    // optimizer-stage rewrite gets no type coercion: require double radius
    case StDWithinDeg(StPoint(ax, ay), StPoint(bx, by), r)
        if r.foldable && r.dataType == org.apache.spark.sql.types.DoubleType =>
      Some((StMakeBox(Seq(
        Subtract(ax, r), Subtract(ay, r), Add(ax, r), Add(ay, r))), bx, by))
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !j.output.exists(_.name.startsWith("__graft_")) =>
      val cs = conjuncts(cond)
      // already has a usable equi-conjunct? leave it to the normal planner
      val hasEqui = cs.exists {
        case EqualTo(a, b) =>
          (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
        case _ => false
      }
      val hit = if (hasEqui) None else cs.flatMap { c =>
        asCoverPoint(c).flatMap { case (g, x, y) =>
          val ptRefs = x.references ++ y.references
          if (g.references.subsetOf(left.outputSet) && ptRefs.subsetOf(right.outputSet))
            Some((left, right, g, x, y, false))
          else if (g.references.subsetOf(right.outputSet) && ptRefs.subsetOf(left.outputSet))
            Some((right, left, g, x, y, true))
          else None
        }
      }.headOption

      hit match {
        case None => j
        case Some((polySide, pointSide, g, x, y, swapped)) =>
          val levelsLit = CreateArray(Levels.toSeq.map(Literal(_)))
          val pcell = AttributeReference("__graft_pcell", LongType, nullable = false)()
          val polyGen = Generate(
            Explode(CellCoverBudget(g, Literal(Budget), levelsLit)),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(pcell), child = polySide)

          val finest = Levels.last
          val fcell = Z2Encode(x, y, Literal(finest))
          val ladder = CreateArray(Levels.toSeq.map { r =>
            if (r == finest) fcell else CellParent(fcell, Literal(r))
          })
          val qcell = AttributeReference("__graft_qcell", LongType, nullable = false)()
          val pointGen = Generate(
            Explode(ladder),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(qcell), child = pointSide)

          val newCond = And(EqualTo(pcell, qcell), cond)
          val (nl, nr) = if (swapped) (pointGen, polyGen) else (polyGen, pointGen)
          Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
      }
  }
}
