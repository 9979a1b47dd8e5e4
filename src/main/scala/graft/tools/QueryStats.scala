package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * Per-query stats capture — the reference writes (planningTime, scanTime,
 * numResults) per query to a stats table (geomesa-core/.../stats/
 * QueryStat.scala:33-40, StatWriter.scala). Spark's QueryExecutionListener
 * gives the same observability without touching the query path.
 */
object QueryStats {

  case class Stat(action: String, durationNs: Long, planDigest: String,
                  failed: Boolean)

  private val buffer = new ConcurrentLinkedQueue[Stat]()
  @volatile private var installed: Option[QueryExecutionListener] = None

  def install(spark: SparkSession): Unit = synchronized {
    if (installed.isEmpty) {
      val l = new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          buffer.add(Stat(funcName, durationNs, digest(qe), failed = false))
        override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
          buffer.add(Stat(funcName, -1L, digest(qe), failed = true))
      }
      spark.listenerManager.register(l)
      installed = Some(l)
    }
  }

  private def digest(qe: QueryExecution): String = {
    val s = qe.optimizedPlan.toString()
    Integer.toHexString(s.hashCode)
  }

  def snapshot(): Seq[Stat] = {
    import scala.jdk.CollectionConverters._
    buffer.iterator().asScala.toSeq
  }

  def clear(): Unit = buffer.clear()

  /** Dump captured stats as a DataFrame (persistable like the reference's
    * stats table). */
  def toDF(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    snapshot().toDF()
  }
}
