package graft.sources

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Filesystem listing as a DataFrame — the reference-surface layer
  * (SURVEY.md §2h): re-expresses hadoop-tools' `hh ls/find/du` over the
  * Hadoop FileSystem API, which is identical for `file://` (tests) and
  * `hdfs://` (production).
  *
  * Scale note: listing is a namenode-metadata operation, so rows are
  * materialized driver-side via the paginated RemoteIterator (bounded
  * memory, like the reference's streamed getListing consumption) and
  * parallelized into a DataFrame for the analytic part (du rollups,
  * glob filtering) — the aggregation over billions of listing rows is
  * the distributed piece, exactly how a 100 TB namespace census runs.
  */
object FsOps {
  val listingSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("name", StringType),
    StructField("is_dir", BooleanType),
    StructField("length", LongType),
    StructField("mtime_ms", LongType),
    StructField("perm_octal", StringType),
    StructField("owner", StringType),
    StructField("grp", StringType),
    StructField("replication", IntegerType),
    StructField("block_size", LongType)))

  private def toRow(st: FileStatus): Row = Row(
    st.getPath.toUri.getPath,
    st.getPath.getName,
    st.isDirectory,
    st.getLen,
    st.getModificationTime,
    "%04o".format(st.getPermission.toShort.toInt & 0xFFF),
    st.getOwner,
    st.getGroup,
    st.getReplication.toInt,
    st.getBlockSize)

  /** Non-recursive listing of one directory (hh ls). */
  def ls(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows = fs.listStatus(p).toIndexedSeq.map(toRow)
    spark.createDataFrame(spark.sparkContext.parallelize(rows), listingSchema)
  }

  /** Recursive file listing (hh find): streams the RemoteIterator. */
  def find(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val rows = Iterator.continually(it)
      .takeWhile(_.hasNext)
      .map(i => toRow(i.next()))
      .toIndexedSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows), listingSchema)
  }
}
