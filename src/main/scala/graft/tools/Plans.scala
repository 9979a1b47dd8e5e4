package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints formatted physical plans for the headline queries
  * so shuffle/broadcast/pushdown shape is reviewable per round.
  * Run: `sbt "runMain graft.tools.Plans [names...]"`. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // match the driver's Verify session — without the extensions the audit
    // shows pre-optimizer-rule plans (no elision/pushdown/join rewrites)
    graft.plans.GraftExtensions.install(spark)
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_st_contains_join", "q_st_dwithin_join", "q_knn", "q_tube_select",
        "q_dedup_minhash", "q_density_grid", "q_ann_ivf", "q_xz_intersects_join")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try println(graft.SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
      catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
    }
    spark.stop()
  }
}
