package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** One place to resolve a Hadoop FileSystem from the session conf — the
  * layout and versioning layers both hit this for every listing, stat,
  * and rename. */
private[sources] object FsUtil {
  def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
}
