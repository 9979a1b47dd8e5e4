package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Test-only window into the splittable Avro source's private config
  * plumbing (the members are private[sources]). */
object AvroTestHooks {
  /** Rebuilds the Configuration exactly as an executor-side
    * AvroSplitReader does: session conf → serializable entries → rebuild. */
  def readerConf(spark: SparkSession): Configuration =
    AvroSplitSource.confFromEntries(
      AvroSplitSource.confEntries(AvroSplitSource.hadoopConf()))
}
