package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path, RemoteIterator}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** Filesystem listing as a DataFrame — the reference-surface layer
  * (SURVEY.md §2h): re-expresses an `hh ls/find/du`-style surface over
  * the Hadoop FileSystem API, which is identical for `file://` (tests)
  * and `hdfs://` (production).
  *
  * Scale design (round-2 rework): listing rows are NEVER materialized on
  * the driver.
  *  - `ls` runs the paginated `listStatusIterator` INSIDE an executor
  *    task and streams rows straight into the task's output iterator —
  *    a 10⁹-entry directory flows through in constant memory.
  *  - `find` pages only the top-level CHILD PATHS (strings, ~tens of
  *    bytes each — bounded by one directory's fan-out, not the subtree
  *    size) on the driver, then each executor task streams the recursive
  *    `listFiles` RemoteIterator of its own subtree. Parallelism =
  *    top-level fan-out; a skewed mega-subtree can be split further by
  *    re-applying the same expansion one level down.
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

  private def stream(it: RemoteIterator[_ <: FileStatus]): Iterator[Row] =
    new Iterator[Row] {
      def hasNext: Boolean = it.hasNext
      def next(): Row = toRow(it.next())
    }

  /** Non-recursive listing of one directory (hh ls): the paginated
    * iterator runs on an executor and streams; the driver sees no rows.
    */
  def ls(spark: SparkSession, dir: String): DataFrame = {
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val rdd = spark.sparkContext.parallelize(Seq(dir), 1).mapPartitions { dirs =>
      dirs.flatMap { d =>
        val p = new Path(d)
        stream(p.getFileSystem(conf.value).listStatusIterator(p))
      }
    }
    spark.createDataFrame(rdd, listingSchema)
  }

  /** Recursive file listing (hh find). Driver holds only top-level child
    * path STRINGS; each task streams its subtree's RemoteIterator.
    */
  def find(spark: SparkSession, dir: String): DataFrame = {
    val sc = spark.sparkContext
    val conf = new SerializableConfiguration(sc.hadoopConfiguration)
    val root = new Path(dir)
    val fs = root.getFileSystem(sc.hadoopConfiguration)
    val topIt = fs.listStatusIterator(root)
    val top = Iterator.continually(topIt).takeWhile(_.hasNext)
      .map(_.next().getPath.toUri.getPath).toIndexedSeq
    if (top.isEmpty) return spark.createDataFrame(
      sc.emptyRDD[Row], listingSchema)
    val rdd = sc.parallelize(top, math.min(top.size, sc.defaultParallelism))
      .mapPartitions { paths =>
        paths.flatMap { d =>
          val p = new Path(d)
          val pfs = p.getFileSystem(conf.value)
          val st = pfs.getFileStatus(p)
          if (st.isDirectory) stream(pfs.listFiles(p, true))
          else Iterator.single(toRow(st))
        }
      }
    spark.createDataFrame(rdd, listingSchema)
  }
}
