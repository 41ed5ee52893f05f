package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Glob
import graft.sources.FsOps

/** Reference-surface fs operators (SURVEY.md §2h): the `hh` layer over
  * the local filesystem (same Hadoop FileSystem API as hdfs://).
  *
  * Oracle note: the `glob()` DuckDB table function needs a literal path,
  * so fs_ls/fs_find_glob hardcode the t2 directory (the driver verifies
  * at sf0.01 per TESTDATA.md); the Spark side still lists the sfDir it
  * was handed, so bench runs list sf0.1 — file NAMES are identical
  * across tiers, which is what these queries emit.
  */
object FsQueries {
  type Q = (SparkSession, String) => DataFrame

  private val t2Dir = "/root/testdata/sf0.01"
  private val parquetGlobRegex = Glob.toRegex("*.parquet")

  val queries: Map[String, Q] = Map(
    "fs_ls" -> ((s, d) =>
      FsOps.ls(s, d)
        .filter(!col("is_dir"))
        .select("name")
        .orderBy("name")),

    "fs_find_glob" -> ((s, d) =>
      FsOps.find(s, d)
        .filter(col("name").rlike(parquetGlobRegex))
        .select("name")
        .orderBy("name")),

    "fs_du" -> ((s, d) =>
      // hh du: subtree rollup per top-level entry + grand total. DuckDB
      // can't see file sizes → oracle omitted; asserted in FsSpec
      // against java.io.File lengths.
      FsOps.find(s, d)
        .withColumn("entry", element_at(split(col("path"), "/"), -1))
        .rollup("entry")
        .agg(sum(col("length")).as("bytes"), count(lit(1)).as("n_files"))
        .withColumn("entry", coalesce(col("entry"), lit("<TOTAL>")))
        .orderBy("entry")),

    "fs_cat_text" -> { (s, d) =>
      // hh cat: byte/line-stream read. Round-trips documents.text
      // through a plain-text export; the oracle cross-checks the
      // line/char totals straight off the documents table.
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_cat_text_${d.hashCode.toHexString}"
      documents(s, d).select("text").write.mode("overwrite").text(tmp)
      s.read.text(tmp)
        .agg(count(lit(1)).as("n_lines"),
          sum(length(col("value"))).as("total_chars"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "fs_ls" ->
      s"""SELECT list_extract(string_split(file, '/'), -1) AS name
        |FROM glob('$t2Dir/*') ORDER BY name""".stripMargin,

    "fs_find_glob" ->
      s"""SELECT name FROM (
        |  SELECT list_extract(string_split(file, '/'), -1) AS name
        |  FROM glob('$t2Dir/**')) t
        |WHERE regexp_matches(name, '$parquetGlobRegex')
        |ORDER BY name""".stripMargin,

    "fs_cat_text" ->
      "SELECT count(*) AS n_lines, CAST(sum(n_chars) AS BIGINT) AS total_chars FROM documents"
  )
}
