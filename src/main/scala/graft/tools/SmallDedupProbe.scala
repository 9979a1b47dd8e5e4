package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: where does the SMALL-corpus (sf0.1, 500 docs) dedup latency
  * go — stage dispatch, exchanges, or the expansion machinery? */
object SmallDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    // warm
    graft.ops.Dedup.simhashPairs(df, "text", "doc_id").count()

    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}
    case class J(id: Int, var name: String = "", var t0: Long = 0, var t1: Long = 0, var stages: Int = 0, var tasks: Int = 0)
    val jobs = scala.collection.mutable.LinkedHashMap[Int, J]()
    val l = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = jobs.getOrElseUpdate(e.jobId, J(e.jobId))
        j.t0 = e.time
        j.name = Option(e.properties.getProperty("spark.job.description")).getOrElse("")
          .take(60)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = ()
    }
    graft.ops.Dedup.minhashPairs(df, "text", "doc_id").count() // warm
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    val n = graft.ops.Dedup.simhashPairs(df, "text", "doc_id").count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"SIMHASH wall=$wall%.2f rows=$n jobs=${jobs.size}")
    jobs.values.foreach { j =>
      println(f"JOB ${j.id}%3d ${(j.t1 - j.t0) / 1000.0}%6.2fs  ${j.name}")
    }
    jobs.clear()
    val t1 = System.nanoTime()
    val m = graft.ops.Dedup.minhashPairs(df, "text", "doc_id").count()
    val wall2 = (System.nanoTime() - t1) / 1e9
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(l)
    println(f"MINHASH wall=$wall2%.2f rows=$m jobs=${jobs.size}")
    jobs.values.foreach { j =>
      println(f"JOB ${j.id}%3d ${(j.t1 - j.t0) / 1000.0}%6.2fs  ${j.name}")
    }
    spark.stop()
  }
}
