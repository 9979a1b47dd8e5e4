package graft

import graft.functions.st
import graft.plans.{GraftExtensions, SpatialRules}
import org.apache.spark.sql.functions._

/** Optimizer rules: results unchanged, plans gain pushdown / lose
  * redundant work (SURVEY.md §4.2 custom rewrites). */
class SpatialRulesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lonLatTable: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_rules").toString
    graft.pages.WebPages.pages(spark, sfDir)
      .select("doc_id", "lon", "lat")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def installed[T](f: => T): T = {
    GraftExtensions.install(spark)
    try f finally spark.experimental.extraOptimizations = Nil
  }

  test("SpatialFilterPushdown: bbox conjuncts reach parquet PushedFilters; results identical") {
    val df = spark.read.parquet(lonLatTable)
    def query = df.filter(st.contains(
      st.makeBox(lit(-80.0), lit(35.0), lit(-70.0), lit(45.0)),
      st.point($"lon", $"lat")))

    val before = query.collect().map(_.getLong(0)).toSet
    val (after, plan) = installed {
      val q = query
      (q.collect().map(_.getLong(0)).toSet, q.queryExecution.executedPlan.toString())
    }
    assert(after === before)
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThanOrEqual(lon"),
      s"expected lon range in PushedFilters:\n${plan.takeRight(800)}")
  }

  test("pushdown rule is idempotent (no optimizer fixpoint churn)") {
    installed {
      val df = spark.read.parquet(lonLatTable).filter(st.contains(
        st.makeBox(lit(-80.0), lit(35.0), lit(-70.0), lit(45.0)),
        st.point($"lon", $"lat")))
      val once = df.queryExecution.optimizedPlan
      val twice = SpatialRules.SpatialFilterPushdown(once)
      assert(twice.fastEquals(once))
    }
  }

  test("WholeWorldElision: strict-world contains becomes a null check, no ST eval in plan") {
    installed {
      val df = spark.read.parquet(lonLatTable).filter(st.contains(
        st.makeBox(lit(-181.0), lit(-91.0), lit(181.0), lit(91.0)),
        st.point($"lon", $"lat")))
      val plan = df.queryExecution.optimizedPlan.toString()
      assert(!plan.contains("stcontains"), plan)
      assert(df.count() === spark.read.parquet(lonLatTable).count())
    }
  }

  test("exact-world contains is NOT elided (JTS contains excludes the boundary)") {
    installed {
      val df = spark.read.parquet(lonLatTable).filter(st.contains(
        st.makeBox(lit(-180.0), lit(-90.0), lit(180.0), lit(90.0)),
        st.point($"lon", $"lat")))
      val plan = df.queryExecution.optimizedPlan.toString()
      assert(plan.contains("stcontains"), plan)
    }
  }

  test("covers world IS elided with exact bounds (covers includes boundary)") {
    installed {
      val df = spark.read.parquet(lonLatTable).filter(st.covers(
        st.makeBox(lit(-180.0), lit(-90.0), lit(180.0), lit(90.0)),
        st.point($"lon", $"lat")))
      val plan = df.queryExecution.optimizedPlan.toString()
      assert(!plan.contains("stcovers"), plan)
      assert(df.count() === spark.read.parquet(lonLatTable).count())
    }
  }
}
