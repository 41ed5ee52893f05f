package graft

import java.nio.file.Files
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Chmod
import graft.sources.FsOps

/** fs layer (SURVEY.md §2h): du totals against java.io truth, and the
  * hh metadata mutations (mkdir/mv/rm/chmod) through the Hadoop
  * FileSystem API — test-only per the contract (no `queries` surface).
  */
class FsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("WARN")

  test("fs_du matches java.io file lengths") {
    val rows = SparkEntry.queries("fs_du")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val files = new java.io.File(sf).listFiles().filter(_.isFile)
    for (f <- files)
      assert(rows(f.getName) === f.length(), s"size mismatch for ${f.getName}")
    assert(rows("<TOTAL>") === files.map(_.length()).sum)
  }

  test("fs_ls lists exactly the table files") {
    val names = SparkEntry.queries("fs_ls")(spark, sf).collect().map(_.getString(0))
    assert(names.toSeq === names.toSeq.sorted)
    assert(names.contains("lineitem.parquet") && names.length === 10)
  }

  test("hh metadata ops: mkdirs / rename / setPermission(chmod) / delete") {
    val scratch = Files.createTempDirectory("graft_fs_meta").toString
    val fs = new Path(scratch).getFileSystem(spark.sparkContext.hadoopConfiguration)

    val dirA = new Path(s"$scratch/a/b/c")
    assert(fs.mkdirs(dirA))
    assert(fs.exists(dirA))

    // touch + rename (hh mv)
    val f1 = new Path(s"$scratch/a/file1")
    fs.create(f1).close()
    val f2 = new Path(s"$scratch/a/b/file2")
    assert(fs.rename(f1, f2))
    assert(!fs.exists(f1) && fs.exists(f2))

    // chmod via the symbolic parser: 644 then g+w,o-r → 664 → 660
    fs.setPermission(f2, new FsPermission(Integer.parseInt("644", 8).toShort))
    val current = fs.getFileStatus(f2).getPermission.toShort.toInt & 0xFFF
    val next = Chmod.applyExpr("g+w,o-r", current).toOption.get
    fs.setPermission(f2, new FsPermission(next.toShort))
    assert((fs.getFileStatus(f2).getPermission.toShort.toInt & 0xFFF) ===
      Integer.parseInt("660", 8))

    // rm -r (hh rm)
    assert(fs.delete(new Path(s"$scratch/a"), true))
    assert(!fs.exists(new Path(s"$scratch/a")))
    assert(FsOps.ls(spark, scratch).count() === 0)
  }

  override def afterAll(): Unit = spark.stop()
}
