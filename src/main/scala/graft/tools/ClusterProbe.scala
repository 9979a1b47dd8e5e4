package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: does the clusters() loop reuse the label/edge partitioning
  * (no per-round exchange beyond the groupBy one), and which size path is
  * the sf0.1 gate taking? */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val EDGE_WHERE = "(doc_id % 10) < 9 AND ((doc_id * 1103515245 + 12345) % 97) < 40"
    def edges = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(expr(EDGE_WHERE))
      .selectExpr("doc_id AS id_a", "doc_id + 1 AS id_b")
    // what does each ROUND's plan look like? clusters() materializes its
    // rounds eagerly (localCheckpoint + count per iteration), so the
    // returned frame's plan is just a Scan over the checkpointed RDD —
    // inspecting it would count zero exchanges for ANY implementation.
    // Capture the real per-round executed plans as they run instead.
    val roundExchanges = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        roundExchanges.add(
          qe.executedPlan.toString.linesIterator.count(_.contains("Exchange")))
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    graft.ops.Dedup.clusters(edges, "id_a", "id_b", maxIter = 3).count()
    Thread.sleep(5000) // ExecutionListenerManager delivers asynchronously
    spark.listenerManager.unregister(listener)
    // each round fires MORE than one execution (localCheckpoint + the
    // convergence count both go through the listener), so report the raw
    // per-execution series rather than claiming a 1:1 round mapping
    println(s"exchange counts per query execution inside one clusters() call " +
      s"(${roundExchanges.size()} executions; rounds fire ~2 each): " +
      roundExchanges.toArray.mkString(", "))
    def time(label: String)(body: => Long): Unit = {
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label%-22s best=${walls.map(_._1).min}%.2fs rows=${walls.head._2}")
    }
    graft.ops.Dedup.clusters(edges, "id_a", "id_b").count() // warm
    for (mode <- Seq("small", "big")) {
      spark.conf.set("spark.graft.dedup.sizeClass", mode)
      time(s"clusters $mode") { graft.ops.Dedup.clusters(edges, "id_a", "id_b").count() }
    }
    spark.conf.unset("spark.graft.dedup.sizeClass")
    time("clusters auto") { graft.ops.Dedup.clusters(edges, "id_a", "id_b").count() }
    spark.stop()
  }
}
