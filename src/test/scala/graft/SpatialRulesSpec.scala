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

  test("SpatialJoinRewrite: SQL theta spatial join becomes a cell equi-join, results identical") {
    installed {
      graft.functions.st.register(spark)
      spark.read.parquet(lonLatTable).createOrReplaceTempView("pts")
      graft.pages.WebPages.regions(spark, sfDir)
        .select("region_id", "region_geom").createOrReplaceTempView("regs")
      val q = spark.sql(
        """SELECT r.region_id, p.doc_id FROM regs r JOIN pts p
          |ON st_contains(r.region_geom, st_point(p.lon, p.lat))""".stripMargin)
      val plan = q.queryExecution.executedPlan.toString()
      assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"spatial join not rewritten:\n${plan.take(1200)}")
      assert(plan.contains("HashJoin"), plan.take(800))
      val got = q.collect().map(r => (r.get(0) match {
        case l: java.lang.Long => l.longValue(); case n: java.lang.Number => n.longValue()
      }, r.getLong(1))).toSet
      // oracle: the library cell join (itself proven vs brute force)
      val expect = graft.ops.SpatialJoin.containsJoin(
          graft.pages.WebPages.regions(spark, sfDir).select("region_id", "region_geom"),
          "region_geom",
          spark.read.parquet(lonLatTable)
            .withColumn("geom", graft.functions.st.point(col("lon"), col("lat")))
            .select("doc_id", "geom"),
          "geom")
        .select("region_id", "doc_id").collect().map(r => (r.get(0) match {
          case l: java.lang.Long => l.longValue(); case n: java.lang.Number => n.longValue()
        }, r.getLong(1))).toSet
      assert(got === expect)
    }
  }

  test("SpatialJoinRewrite shape 2: geometry×geometry intersects becomes an XZ2 equi-join, no dupes") {
    installed {
      val nb = graft.pages.WebPages.nationBoxes(spark, sfDir).select("n_nationkey", "nation_geom")
      val rg = graft.pages.WebPages.regions(spark, sfDir).select("region_id", "region_geom")
      nb.createOrReplaceTempView("nb"); rg.createOrReplaceTempView("rg")
      val theta = spark.sql(
        "SELECT n_nationkey, region_id FROM nb JOIN rg ON st_intersects(nation_geom, region_geom)")
      val plan = theta.queryExecution.optimizedPlan.toString()
      assert(plan.contains("__graft_ecell") && plan.contains("__graft_ccell"), plan.take(1200))
      val phys = theta.queryExecution.executedPlan.toString()
      assert(!phys.contains("NestedLoopJoin") && !phys.contains("CartesianProduct"), phys.take(800))
      // bag semantics preserved: single-cell extent index → no duplicate pairs
      val got = theta.collect().map(r => (r.get(0) match {
        case l: java.lang.Long => l.longValue(); case n: java.lang.Number => n.longValue()
      }, r.getLong(1)))
      assert(got.length === got.toSet.size, "rewrite introduced duplicate pairs")
      val expect = graft.ops.SpatioTemporal.xzIntersectsJoin(nb, "nation_geom", rg, "region_geom")
        .select("n_nationkey", "region_id").collect().map(r => (r.get(0) match {
          case l: java.lang.Long => l.longValue(); case n: java.lang.Number => n.longValue()
        }, r.getLong(1))).toSet
      assert(got.toSet === expect)
      assert(expect.nonEmpty)
    }
  }

  test("SpatialJoinRewrite: st_dwithin METERS joins become cell equi-joins, results identical") {
    installed {
      import spark.implicits._
      val ctrs = Seq((1L, 10.0, 60.0), (2L, -75.0, 40.0)).toDF("cid", "clon", "clat")
      val pts = Seq((1L, 10.5, 60.1), (2L, 12.0, 60.0), (3L, -74.9, 40.2), (4L, 100.0, 0.0))
        .toDF("pid", "plon", "plat")
      ctrs.createOrReplaceTempView("dw_c"); pts.createOrReplaceTempView("dw_p")
      val q = spark.sql(
        """SELECT cid, pid FROM dw_c JOIN dw_p
          |ON st_dwithin(st_point(clon, clat), st_point(plon, plat), 50000.0D)""".stripMargin)
      assert(q.queryExecution.optimizedPlan.toString().contains("__graft_"),
        "meters dwithin rewrite did not fire")
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // oracle: the raw predicate over the cross product (rule leaves the
      // exact predicate in place, so the rewrite may only prune, not add)
      val expect = ctrs.crossJoin(pts)
        .filter(graft.functions.st.dwithin(
          graft.functions.st.point(col("clon"), col("clat")),
          graft.functions.st.point(col("plon"), col("plat")), lit(50000.0)))
        .select("cid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expect)
      assert(expect.nonEmpty)
    }
  }

  test("SpatialJoinRewrite: existing equi-joins untouched") {
    installed {
      val nb = graft.pages.WebPages.nationBoxes(spark, sfDir).select("n_nationkey", "nation_geom")
      val rg = graft.pages.WebPages.regions(spark, sfDir).select("region_id", "region_geom")
      nb.createOrReplaceTempView("nb2"); rg.createOrReplaceTempView("rg2")
      // equi-join with a residual spatial predicate: not rewritten
      val equi = spark.sql(
        """SELECT n_nationkey, region_id FROM nb2 JOIN rg2
          |ON n_nationkey = region_id AND st_intersects(nation_geom, region_geom)""".stripMargin)
      assert(!equi.queryExecution.optimizedPlan.toString().contains("__graft_"))
    }
  }
}
