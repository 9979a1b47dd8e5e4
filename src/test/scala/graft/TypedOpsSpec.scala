package graft

import graft.api.typedOps
import graft.functions.st
import graft.pages.WebPages
import org.apache.spark.sql.functions._

/** Typed Dataset surface: pair-joins keep full row types AND the optimizer
  * rewrite still produces cell equi-join plans (no nested loop). */
case class Box(rid: Long, x0: Double, y0: Double, x1: Double, y1: Double)
case class Pt(pid: Long, lon: Double, lat: Double)

class TypedOpsSpec extends SparkSpec {
  import spark.implicits._

  private def installed[A](body: => A): A = {
    graft.plans.GraftExtensions.install(spark)
    body
  }

  private lazy val boxes = Seq(
    Box(1, -10, -10, 10, 10), Box(2, 5, 5, 25, 25), Box(3, 100, 40, 120, 60)).toDS()
  private lazy val pts = Seq(
    Pt(1, 0, 0), Pt(2, 7, 7), Pt(3, 20, 20), Pt(4, 110, 50), Pt(5, -50, -50)).toDS()

  test("typed containsJoin: Dataset[(Box, Pt)] pairs, plan rewritten to cell equi-join") {
    installed {
      val j = typedOps.containsJoin(boxes, pts)(
        b => st.makeBox(b("x0"), b("y0"), b("x1"), b("y1")),
        p => st.point(p("lon"), p("lat")))
      val phys = j.queryExecution.executedPlan.toString()
      assert(!phys.contains("NestedLoopJoin") && !phys.contains("CartesianProduct"),
        phys.take(1000))
      val got = j.collect().map { case (b, p) => (b.rid, p.pid) }.toSet
      assert(got === Set((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 4L)))
      // full typed rows survive the join
      val (b, p) = j.filter(_._2.pid == 4L).head()
      assert(b === Box(3, 100, 40, 120, 60) && p === Pt(4, 110, 50))
    }
  }

  test("typed intersectsJoin: XZ2 shape-2 rewrite, typed pairs") {
    installed {
      val other = Seq(Box(7, 8, 8, 30, 30), Box(8, -60, -60, -40, -40)).toDS()
      val j = typedOps.intersectsJoin(boxes, other)(
        b => st.makeBox(b("x0"), b("y0"), b("x1"), b("y1")),
        o => st.makeBox(o("x0"), o("y0"), o("x1"), o("y1")))
      assert(j.queryExecution.optimizedPlan.toString().contains("__graft_"),
        "shape-2 rewrite did not fire")
      val got = j.collect().map { case (a, b) => (a.rid, b.rid) }.toSet
      assert(got === Set((1L, 7L), (2L, 7L)))
    }
  }

  test("typed knnJoin matches the DataFrame ladder join") {
    installed {
      // column names must be disjoint across sides (join-key contract)
      val q = Seq((100L, 0.0, 0.0), (200L, 110.0, 50.0)).toDF("qid", "qlon", "qlat")
        .as[(Long, Double, Double)]
      val hits = typedOps.knnJoin(q, "qid", "qlon", "qlat",
        pts, "lon", "lat", "pid", k = 2, res = 3)
      val got = hits.collect().map(h => (h.qid, h.id, h.rank)).toSet
      val expect = graft.ops.SpatialJoin.knnPlanar(
          q.toDF(), "qlon", "qlat", pts.toDF(), "lon", "lat", "pid", 2)
        .select("qid", "pid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expect)
    }
  }

  test("typed dedupSurvivors keeps min-key row per group, typed") {
    val docs = Seq(Pt(3, 1, 1), Pt(1, 1, 1), Pt(2, 9, 9)).toDS()
    val kept = typedOps.dedupSurvivors(docs)(d => struct(d("lon"), d("lat")), d => d("pid"))
      .collect().map(_.pid).toSet
    assert(kept === Set(1L, 2L))
  }
}
