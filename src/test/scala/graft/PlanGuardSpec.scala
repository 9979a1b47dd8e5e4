package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** Static plan audit over EVERY `SparkEntry.queries` gate: the r3
  * spreadBuild regression (a small build side silently falling off the
  * broadcast path) was caught by the bench, not by any check — this spec
  * makes the plan shape itself a gate.
  *
  * Asserted, per query, on the AQE-off physical plan at sf0.001:
  *  1. no `CartesianProduct` anywhere (incl. subqueries — string check on
  *     the full explain output, which renders subquery plans too);
  *  2. `BroadcastNestedLoopJoin` only in the documented kNN brute tail
  *     (ops/SpatialJoin.scala:508,527 — crossJoin(broadcast(queries)) with
  *     a bounded query side) and the tube-select broadcast range join
  *     (SpatioTemporal.scala — broadcastTrack, non-equi time|cell band);
  *  3. no `SortMergeJoin` whose either side has a KNOWN optimizer size
  *     estimate under the 10 MB broadcast threshold: stats-known small
  *     sides must ride a broadcast (or an explicit shuffle_hash hint,
  *     which plans as ShuffledHashJoin and is exempt by construction) —
  *     an SMJ there means the stats pipeline broke, exactly the
  *     spreadBuild failure mode.
  */
class PlanGuardSpec extends SparkSpec {

  private val BroadcastBytes = BigInt(10L * 1024 * 1024)

  /** Gates whose plan legitimately contains BroadcastNestedLoopJoin. */
  private val bnljAllowed = Set(
    "q_knn", "q_knn_ring", "q_knn_geo", // brute tail: crossJoin(broadcast)
    "q_tube_select", "q_tube_line",     // broadcast track, non-equi band
    "q_proximity_meters")               // broadcast probe ring, non-equi

  /** Optimizer size estimate of a join side: the SMJ's immediate children
    * are Sort/Exchange nodes EnsureRequirements inserted after planning,
    * which usually carry no logicalLink — walk down (pre-order) to the
    * NEAREST descendant that does. Without the walk the check is vacuous;
    * the canary test below pins that it can actually fire. */
  private def sideSize(side: SparkPlan): Option[BigInt] = {
    val link = side.collectFirst { case p if p.logicalLink.isDefined => p.logicalLink.get }
    link.map(_.stats.sizeInBytes)
  }

  private def offendingSmj(plan: SparkPlan): Seq[String] =
    plan.collect { case j: SortMergeJoinExec =>
      j.children.flatMap { side =>
        sideSize(side).flatMap { sz =>
          // "known" = a real estimate, not the conservative fallback
          // (fallbacks multiply out near 8 EiB and always exceed this)
          if (sz < BroadcastBytes)
            Some(s"SortMergeJoin side with known ${sz}B < 10MB: ${side.nodeName}")
          else None
        }
      }
    }.flatten

  test("plan guard canary: the SMJ small-side check can fire") {
    // with broadcast disabled, a tiny-known-stats equi-join plans as SMJ
    // with both sides' estimates far under 10 MB — the guard MUST flag it,
    // or the logicalLink walk has gone vacuous
    withSqlConf("spark.sql.adaptive.enabled" -> "false",
                "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      import spark.implicits._
      val a = Seq((1, "x"), (2, "y")).toDF("k", "va")
      val b = Seq((1, "p"), (2, "q")).toDF("k", "vb")
      val plan = a.join(b, "k").queryExecution.executedPlan
      assert(plan.exists(_.isInstanceOf[SortMergeJoinExec]),
        s"canary expected a SortMergeJoin:\n$plan")
      assert(offendingSmj(plan).nonEmpty,
        s"SMJ small-side guard failed to flag a known-tiny merge join:\n$plan")
    }
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"plan guard: $name") {
      withSqlConf("spark.sql.adaptive.enabled" -> "false") {
        graft.plans.GraftExtensions.install(spark)
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.executedPlan
        val rendered = df.queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode)
        assert(!rendered.contains("CartesianProduct"),
          s"$name plans a CartesianProduct:\n$rendered")
        if (!bnljAllowed(name))
          assert(!rendered.contains("BroadcastNestedLoopJoin"),
            s"$name plans a BroadcastNestedLoopJoin outside the allowlist:\n$rendered")
        val bad = offendingSmj(plan)
        assert(bad.isEmpty, s"$name: ${bad.mkString("; ")}\n$rendered")
      }
    }
  }
}
