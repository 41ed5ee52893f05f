package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Filesystem listing as a DataFrame — the reference-surface layer
  * (SURVEY.md §2h): re-expresses an `hh ls/find/du`-style surface over
  * the Hadoop FileSystem API, which is identical for `file://` (tests)
  * and `hdfs://` (production).
  *
  * Both entry points delegate to [[FsListSource]], the DataSource V2
  * implementation: per-subtree input partitions, executor-side streaming
  * RemoteIterators (no driver materialization at any namespace size),
  * and pushed-down column pruning visible on the BatchScan plan node.
  */
object FsOps {
  val listingSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("name", StringType),
    StructField("is_dir", BooleanType),
    StructField("is_symlink", BooleanType),
    StructField("length", LongType),
    StructField("mtime_ms", LongType),
    StructField("perm_octal", StringType),
    StructField("owner", StringType),
    StructField("grp", StringType),
    StructField("replication", IntegerType),
    StructField("block_size", LongType)))

  /** Non-recursive listing of one directory (hh ls). */
  def ls(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft.sources.FsListSource").load(dir)

  /** Recursive file listing (hh find): one partition batch per top-level
    * child, each streaming its subtree on an executor.
    */
  def find(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft.sources.FsListSource")
      .option("recursive", "true").load(dir)
}
