package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Glob
import graft.sources.FsOps

/** Reference-surface fs operators (SURVEY.md §2h): the `hh` layer over
  * the local filesystem (same Hadoop FileSystem API as hdfs://).
  *
  * Oracle note: the DuckDB `glob()`/`read_blob()` table functions need a
  * literal path, so these oracles carry the `GRAFT_SF_DIR` placeholder,
  * which Verify substitutes with the sfDir it was actually handed when
  * it dumps oracle_sql.json — the oracle always inspects the same tier
  * the Spark side listed (round-1 hardcoded sf0.01; silently wrong if
  * the driver ever verified elsewhere).
  */
object FsQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Replaced with the runtime sfDir by Verify when dumping oracle SQL. */
  val SfDirToken = "GRAFT_SF_DIR"
  /** Replaced by Verify with the process user/primary group (java.nio
    * probe) — DuckDB cannot stat() ownership, but the owner of files
    * THIS process plants is an environment fact Verify can inject, the
    * same way it injects the sfDir path.
    */
  val FsUserToken = "GRAFT_FS_USER"
  val FsGroupToken = "GRAFT_FS_GROUP"
  private val parquetGlobRegex = Glob.toRegex("*.parquet")

  /** The fs_ls_long fixture: (name, content, octal mode, expected perm
    * string). Modes cover the render paths Hadoop's FsPermission can
    * actually carry — rw/r-x/write-only-owner/read-only plus both
    * sticky-bit renderings (t with other-execute, T without); setuid/
    * setgid are stripped by FsPermission.toShort, so planting them
    * would witness nothing (permString's unit tests cover those chars
    * on literal modes in FsSpec).
    */
  private val lsLongFixture: Seq[(String, String, Int, String)] = Seq(
    ("lsl_a.txt", "alpha", Integer.parseInt("644", 8), "-rw-r--r--"),
    ("lsl_b.bin", "bb",    Integer.parseInt("755", 8), "-rwxr-xr-x"),
    ("lsl_c.dat", "",      Integer.parseInt("600", 8), "-rw-------"),
    ("lsl_d.log", "dddd",  Integer.parseInt("444", 8), "-r--r--r--"),
    ("lsl_e.tmp", "eee",   Integer.parseInt("1644", 8), "-rw-r--r-T"),
    ("lsl_f.sh",  "f",     Integer.parseInt("1755", 8), "-rwxr-xr-t"))

  /** Plants the fs_ls_long fixture once per (app, tier): files with
    * DECLARED names, contents, and modes, created and chmod'd through
    * the same Hadoop FileSystem API the listing reads back — so the
    * oracle can be a pure known-construction VALUES emission (fn_url
    * precedent) and the hash gate proves the whole create → stat →
    * render chain reproduces the declaration. _SUCCESS-guarded like
    * Relational's layouts; the lock serializes concurrent consumers in
    * one JVM.
    */
  /** The fs_audit_perms fixture: DECLARED modes spanning every audit
    * rule — world-writable (666 / 777 / sticky-1777), group-writable
    * (664), and two clean files (644, 400). Hadoop's FsPermission
    * strips setuid/setgid (the fs_ls_long note), so the audit covers
    * exactly the permission bits the FileSystem API can carry; the
    * expected finding is declared alongside the mode, making the
    * oracle a known-construction VALUES emission.
    */
  private val auditFixture: Seq[(String, String, Int, String, String)] = Seq(
    ("ap_a.txt", "readme",   Integer.parseInt("644", 8),  "-rw-r--r--", "none"),
    ("ap_b.dat", "shared",   Integer.parseInt("666", 8),  "-rw-rw-rw-", "world_writable"),
    ("ap_c.sh",  "runme",    Integer.parseInt("777", 8),  "-rwxrwxrwx", "world_writable"),
    ("ap_d.dat", "teamfile", Integer.parseInt("664", 8),  "-rw-rw-r--", "group_writable"),
    ("ap_e.key", "secret",   Integer.parseInt("400", 8),  "-r--------", "none"),
    ("ap_f.tmp", "scratch",  Integer.parseInt("1777", 8), "-rwxrwxrwt", "world_writable"))

  private val plantLock = new Object

  /** lsLongDir's planter shape for the audit fixture (declared modes,
    * chmod'd through the same FileSystem API the listing reads back).
    */
  private def auditDir(s: SparkSession, d: String): String = plantLock.synchronized {
    val dir = scratch(s, "audit", d)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(root, "_SUCCESS"))) {
      fs.mkdirs(root)
      auditFixture.foreach { case (name, content, mode, _, _) =>
        val p = new org.apache.hadoop.fs.Path(root, name)
        val out = fs.create(p, true)
        out.write(content.getBytes("UTF-8"))
        out.close()
        fs.setPermission(p,
          new org.apache.hadoop.fs.permission.FsPermission(mode.toShort))
      }
      fs.create(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), true).close()
    }
    dir
  }

  def lsLongDir(s: SparkSession, d: String): String = plantLock.synchronized {
    val dir = scratch(s, "lsl", d)
    val conf = s.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(new org.apache.hadoop.fs.Path(root, "_SUCCESS"))) {
      fs.mkdirs(root)
      lsLongFixture.foreach { case (name, content, mode, _) =>
        val p = new org.apache.hadoop.fs.Path(root, name)
        val out = fs.create(p, true)
        out.write(content.getBytes("UTF-8"))
        out.close()
        fs.setPermission(p,
          new org.apache.hadoop.fs.permission.FsPermission(mode.toShort))
      }
      fs.create(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), true).close()
    }
    dir
  }

  /** Renders the ls -l permission string (nine rwx chars) from a %04o
    * octal mode column, including the POSIX special bits carried by
    * digit 1: setuid(4)/setgid(2) map the user/group execute slot to
    * s (execute set) or S (not), sticky(1) maps the other slot to t/T.
    * Pure column arithmetic — executor-side, codegen'd. Note Hadoop's
    * FsPermission models only the sticky bit (toShort strips
    * setuid/setgid), so through the FileSystem API digit 1 is 0 or 1;
    * the full mapping is still rendered so any richer mode source
    * (or direct octal input) formats correctly. Unit-tested on literal
    * modes in FsSpec.
    */
  def permString(octal: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val triples = array(
      Seq("---", "--x", "-w-", "-wx", "r--", "r-x", "rw-", "rwx").map(lit): _*)
    val special = substring(octal, 1, 1).cast("int")
    // One rwx triple, with the execute slot overridden when the
    // corresponding special bit is set in digit 1.
    def tri(pos: Int, bit: Int, ch: String) = {
      val digit = substring(octal, pos, 1).cast("int")
      val base = element_at(triples, digit + 1)
      when(special.bitwiseAND(lit(bit)) =!= 0,
        concat(substring(base, 1, 2),
          when(digit % 2 === 1, lit(ch)).otherwise(lit(ch.toUpperCase))))
        .otherwise(base)
    }
    concat(tri(2, 4, "s"), tri(3, 2, "s"), tri(4, 1, "t"))
  }

  /** The fs_sync_plan fixture: a source estate and a stale mirror.
    * Declared so the plan is a known construction: sp_a only in src
    * (→ copy), sp_b present both with different length (→ update),
    * sp_c identical (→ keep), sp_d only in dst (→ delete), sp_e an
    * empty file identical on both sides (→ keep; pins the zero-byte
    * path the binaryFile source silently drops elsewhere).
    */
  private val syncSrcFixture: Seq[(String, String)] = Seq(
    ("sp_a.dat", "alpha"), ("sp_b.dat", "bravo!"),
    ("sp_c.dat", "charlie"), ("sp_e.dat", ""))
  private val syncDstFixture: Seq[(String, String)] = Seq(
    ("sp_b.dat", "bravo"), ("sp_c.dat", "charlie"),
    ("sp_d.dat", "delta"), ("sp_e.dat", ""))

  /** fs_put's client-side fixture: printable-ASCII contents whose hex
    * renderings the oracle re-digests (md5-of-hex, the fs_distcp rule),
    * plus a zero-byte file pinning the binaryFile empty-file path on
    * the UPLOAD direction too.
    */
  private val putFixture: Seq[(String, String)] = Seq(
    ("up_a.dat", "alpha"), ("up_b.dat", "bravo-bravo"),
    ("up_c.dat", "delta-42\n"), ("up_e.dat", ""))

  private def plantDir(s: SparkSession, tag: String, d: String,
      files: Seq[(String, String)]): String = plantLock.synchronized {
    val dir = scratch(s, tag, d)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(root, "_SUCCESS"))) {
      fs.mkdirs(root)
      files.foreach { case (name, content) =>
        val out = fs.create(new org.apache.hadoop.fs.Path(root, name), true)
        out.write(content.getBytes("UTF-8"))
        out.close()
      }
      fs.create(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), true).close()
    }
    dir
  }

  /** The fs_du_quota fixture: a three-subtree estate with DECLARED
    * per-subtree quotas — the HDFS ContentSummary surface (`hh du`
    * carries quota/spaceQuota alongside the byte rollup; VERDICT r10
    * gap 3). Local filesystems have no quota store, so the quotas are
    * fixture declarations (the tier-plan known-construction pattern):
    * a file-count (namespace) quota and a byte (space) quota per
    * subtree, -1 = unset, spanning all breach classes — qd_logs
    * within both, qd_tmp breaching SPACE (61 B > 48), qd_data at its
    * exact namespace limit (full, not breached) with space unset.
    */
  private val duQuotaFiles: Seq[(String, String)] = Seq(
    ("qd_logs/app.log", "level=INFO boot"),
    ("qd_logs/gc.log", "pause 3ms"),
    ("qd_tmp/stage0.tmp", "intermediate shuffle spill block"),
    ("qd_tmp/stage1.tmp", "second spill, pushes over quota"),
    ("qd_data/part-0.dat", "the durable bytes"))
  private val duQuotas: Seq[(String, Long, Long)] = Seq(
    ("qd_logs", 10L, 4096L), ("qd_tmp", 8L, 48L), ("qd_data", 1L, -1L))

  private def duQuotaOracle: String = {
    val frows = duQuotaFiles.map { case (n, c) =>
      s"('${n.split('/').head}', ${c.getBytes("UTF-8").length})"
    }
    val qrows = duQuotas.map { case (e, nq, sq) =>
      s"('$e', CAST($nq AS BIGINT), CAST($sq AS BIGINT))"
    }
    s"""WITH f(entry, length) AS (VALUES ${frows.mkString(", ")}),
       |q(entry, ns_quota, space_quota) AS (VALUES ${qrows.mkString(", ")}),
       |r AS (SELECT entry, count(*) AS n_files, CAST(sum(length) AS BIGINT)
       |  AS bytes FROM f GROUP BY entry)
       |SELECT r.entry, r.n_files, r.bytes, q.ns_quota, q.space_quota,
       |  CASE WHEN q.ns_quota >= 0 THEN q.ns_quota - r.n_files END
       |    AS ns_remaining,
       |  CASE WHEN q.space_quota >= 0 THEN q.space_quota - r.bytes END
       |    AS space_remaining,
       |  CASE WHEN q.ns_quota >= 0 AND r.n_files > q.ns_quota THEN 'ns'
       |       WHEN q.space_quota >= 0 AND r.bytes > q.space_quota
       |         THEN 'space'
       |       ELSE 'none' END AS breach
       |FROM r JOIN q USING (entry) ORDER BY entry""".stripMargin
  }

  /** The fs_tier_plan fixture: files with DECLARED mtimes so the
    * age-based tier decision is a known construction (the fs_ls_long
    * oracle pattern — stat() data is only oracle-able for a planted
    * declaration). Ages span the three bands relative to the NEWEST
    * file: 0 d and 3 d (hot, < 7), 20 d (warm, < 30), 60 d and 400 d
    * (cold); tp_e is an empty cold file (pins the zero-byte path).
    * Base instant is arbitrary-but-fixed (2025-01-01 UTC): the tier
    * rule reads ages off the listing's own max mtime, never the
    * wall clock, so the plan is rerun-stable forever.
    */
  private val tierDayMs = 86400000L
  private val tierBaseMs = 1735689600000L
  private val tierFixture: Seq[(String, String, Long)] = Seq(
    ("tp_a.dat", "fresh hourly drop", tierBaseMs + 400 * tierDayMs),
    ("tp_b.dat", "this week's batch", tierBaseMs + 397 * tierDayMs),
    ("tp_c.dat", "last sprint's features", tierBaseMs + 380 * tierDayMs),
    ("tp_d.dat", "quarterly snapshot", tierBaseMs + 340 * tierDayMs),
    ("tp_e.dat", "", tierBaseMs))

  /** plantDir variant that also stamps each file's declared mtime. */
  private def plantDirTimes(s: SparkSession, tag: String, d: String,
      files: Seq[(String, String, Long)]): String = plantLock.synchronized {
    val dir = scratch(s, tag, d)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(root, "_SUCCESS"))) {
      fs.mkdirs(root)
      files.foreach { case (name, content, mtime) =>
        val p = new org.apache.hadoop.fs.Path(root, name)
        val out = fs.create(p, true)
        out.write(content.getBytes("UTF-8"))
        out.close()
        fs.setTimes(p, mtime, -1)
      }
      fs.create(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), true).close()
    }
    dir
  }

  /** Oracle generated from the same fixture Seq as the query plants —
    * the corrMatrixOracle can't-drift pattern.
    */
  private def tierPlanOracle: String = {
    val rows = tierFixture.map { case (n, c, m) =>
      s"('$n', ${c.getBytes("UTF-8").length}, CAST($m AS BIGINT))"
    }
    s"""WITH f(name, length, mtime_ms) AS (VALUES ${rows.mkString(", ")}),
       |r AS (SELECT max(mtime_ms) AS ref_ms FROM f)
       |SELECT name, CAST(length AS BIGINT) AS length,
       |  CAST((ref_ms - mtime_ms) // $tierDayMs AS BIGINT) AS age_days,
       |  CASE WHEN (ref_ms - mtime_ms) // $tierDayMs < 7 THEN 'hot'
       |       WHEN (ref_ms - mtime_ms) // $tierDayMs < 30 THEN 'warm'
       |       ELSE 'cold' END AS tier
       |FROM f, r ORDER BY name""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "fs_tier_plan" -> { (s, d) =>
      // Storage-tier planner (`hh`-layer lifecycle management — the
      // hot/warm/cold decision behind HDFS storage policies and
      // S3-class transitions): every file's age decides its tier, and
      // the PLAN is what a mover executes (fs_distcp's shape again).
      // Age is measured against the listing's own newest mtime — the
      // corpus-end clamp, so the plan is a pure function of the
      // estate, never of the wall clock (rerun-stable, oracle-able).
      // At estate scale this is listings-only: executor-streamed
      // FileStatus rows, map-side tier arithmetic, bytes ∝ file
      // count; the 1-row ref instant rides a broadcast.
      val dir = plantDirTimes(s, "tier", d, tierFixture)
      val ls = FsOps.ls(s, dir)
        .filter(!col("is_dir") && col("name").endsWith(".dat"))
      val ref = ls.agg(max(col("mtime_ms")).as("ref_ms"))
      ls.crossJoin(broadcast(ref))
        .withColumn("age_days", expr(s"(ref_ms - mtime_ms) DIV $tierDayMs"))
        .withColumn("tier",
          when(col("age_days") < 7, lit("hot"))
            .when(col("age_days") < 30, lit("warm"))
            .otherwise(lit("cold")))
        .select(col("name"), col("length"), col("age_days"), col("tier"))
        .orderBy("name")
    },

    "fs_audit_perms" -> { (s, d) =>
      // hh-layer permissions audit — the security sweep an estate runs
      // before widening access: flag world-writable files (any actor
      // can corrupt the data; the classic open-/tmp-on-HDFS hazard)
      // and group-writable ones from the executor-streamed listing.
      // Rules are pure column arithmetic on the octal digits — no
      // per-file stat re-fetch, so at estate scale the audit costs one
      // listing stream (bytes ∝ file count, the fs_tier_plan shape).
      // Hadoop's FsPermission strips setuid/setgid (fs_ls_long note),
      // so the rule set covers exactly the bits the FileSystem API
      // carries; the planted fixture declares modes spanning every
      // rule, and the hash gate proves the create → chmod → list →
      // classify chain reproduces the declared findings.
      val o = substring(col("perm_octal"), 4, 1).cast("int")
      val g = substring(col("perm_octal"), 3, 1).cast("int")
      val finding = when(o.bitwiseAND(lit(2)) =!= 0, "world_writable")
        .when(g.bitwiseAND(lit(2)) =!= 0, "group_writable")
        .otherwise("none")
      FsOps.ls(s, auditDir(s, d))
        .filter(!col("is_dir") && col("name") =!= "_SUCCESS")
        .withColumn("perm", concat(lit("-"), permString(col("perm_octal"))))
        .withColumn("finding", finding)
        .withColumn("flagged", col("finding") =!= "none")
        .select("name", "perm", "finding", "flagged")
        .orderBy("name")
    },

    "fs_sync_plan" -> { (s, d) =>
      // The incremental-mirror planner (`hh sync` / rsync-over-estates,
      // the decision layer fs_distcp executes): full-outer join of two
      // executor-streamed listings on basename → copy (missing in
      // dst), update (length differs; the --size-only contract — a
      // digest mode would reuse fs_distcp's content-md5 column at a
      // full read's cost, documented not defaulted), delete (extra in
      // dst), keep. At estate scale both sides are listings, never
      // contents: the plan for a 100 TB mirror shuffles bytes
      // proportional to FILE COUNT, and only the copy/update subset
      // pays data I/O when executed. The oracle recomputes the plan
      // from read_blob lengths over the same planted dirs — the whole
      // list → join → decide chain is hash-gated.
      val src = plantDir(s, "syncsrc", d, syncSrcFixture)
      val dst = plantDir(s, "syncdst", d, syncDstFixture)
      def side(dir: String, p: String) = FsOps.ls(s, dir)
        .filter(!col("is_dir") && col("name").endsWith(".dat"))
        .select(col("name").as(s"${p}_name"), col("length").as(s"${p}_len"))
      side(src, "s").join(side(dst, "d"),
          col("s_name") === col("d_name"), "full_outer")
        .select(
          coalesce(col("s_name"), col("d_name")).as("name"),
          when(col("d_name").isNull, "copy")
            .when(col("s_name").isNull, "delete")
            .when(col("s_len") =!= col("d_len"), "update")
            .otherwise("keep").as("action"),
          col("s_len").as("src_len"), col("d_len").as("dst_len"))
        .orderBy("name")
    },

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

    "fs_ls_long" -> { (s, d) =>
      // hh ls -l: the formatted long listing — `drwxr-xr-x`-style perm
      // string (type char + three rwx triples incl. sticky rendering,
      // see permString), owner, group, size, name. Pure column
      // arithmetic over the DSv2 listing, so it stays executor-side and
      // codegen'd. Type char renders dir/file/symlink from is_dir +
      // is_symlink (the listing schema carries the full HDFS FileStatus
      // type triple since round 11); on LOCAL filesystems the Hadoop
      // API resolves symlinks during listing, so 'l' only ever arrives
      // from HDFS — FsSpec pins that resolution behavior. Lists the PLANTED fixture dir
      // (declared names/contents/modes incl. both sticky renderings),
      // which is what makes a DuckDB oracle possible at all: stat()
      // data isn't glob()-observable, but a known construction is a
      // pure VALUES emission with Verify-injected owner/group — the
      // hash gate then proves the create → chmod → list → render chain
      // reproduces the declaration exactly. FsSpec additionally asserts
      // the same rows against java.nio filesystem truth (independent of
      // the construction) and permString against literal modes.
      FsOps.ls(s, lsLongDir(s, d))
        .filter(!col("is_dir") && col("name") =!= "_SUCCESS")
        .withColumn("perm", concat(
          when(col("is_dir"), lit("d"))
            .when(col("is_symlink"), lit("l")).otherwise(lit("-")),
          permString(col("perm_octal"))))
        .select("perm", "owner", "grp", "length", "name")
        .orderBy("name")
    },

    "fs_du" -> { (s, d) =>
      // hh du: subtree rollup per TOP-LEVEL entry + grand total. The
      // entry is the first path segment under the root (so files nested
      // anywhere in a subtree roll up to that subtree, like du), not the
      // file basename — the two only coincide on flat directories.
      // Sizes cross-checked by the read_blob() oracle (flat tier) and,
      // for a genuinely nested tree, against java.io walks in FsSpec.
      //
      // FsListSource emits scheme-less absolute paths (toUri.getPath),
      // so the stripped prefix must be normalized the same way: qualify
      // `d` through its FileSystem first, else a scheme-qualified
      // (hdfs://nn/data) or relative sfDir shifts every substring and
      // silently mis-assigns all rollups.
      val root = new org.apache.hadoop.fs.Path(d)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .makeQualified(new org.apache.hadoop.fs.Path(d))
        .toUri.getPath.stripSuffix("/")
      FsOps.find(s, d)
        .withColumn("entry", element_at(
          split(expr(s"substring(path, ${root.length + 2})"), "/"), 1))
        .rollup("entry")
        .agg(sum(col("length")).as("bytes"), count(lit(1)).as("n_files"))
        .withColumn("entry", coalesce(col("entry"), lit("<TOTAL>")))
        .orderBy("entry")
    },

    "fs_du_quota" -> { (s, d) =>
      // Quota-aware du — the ContentSummary columns `hh du` carries on
      // HDFS (namespace quota = entry-count cap, space quota = byte
      // cap), closing the last recalled du delta (VERDICT r10 item 9).
      // On HDFS the quotas come from getContentSummary per subtree; a
      // local estate has no quota store, so the fixture DECLARES them
      // (tier-plan pattern) and the query proves the production shape:
      // the byte/count rollup streams off the recursive listing
      // exactly like fs_du (executor-side, bytes ∝ file count), the
      // ≤#subtrees-row quota table attaches by broadcast join, and
      // remaining/breach are pure column arithmetic — no per-file
      // stat re-fetch at any estate size.
      import s.implicits._
      val dir = plantDir(s, "duquota", d, duQuotaFiles)
      val root = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .makeQualified(new org.apache.hadoop.fs.Path(dir))
        .toUri.getPath.stripSuffix("/")
      val quotas = duQuotas.toDF("entry", "ns_quota", "space_quota")
      FsOps.find(s, dir)
        .filter(!col("is_dir") && col("name") =!= "_SUCCESS")
        .withColumn("entry", element_at(
          split(expr(s"substring(path, ${root.length + 2})"), "/"), 1))
        .groupBy("entry")
        .agg(count(lit(1)).as("n_files"), sum(col("length")).as("bytes"))
        .join(broadcast(quotas), "entry")
        .withColumn("ns_remaining",
          when(col("ns_quota") >= 0, col("ns_quota") - col("n_files")))
        .withColumn("space_remaining",
          when(col("space_quota") >= 0, col("space_quota") - col("bytes")))
        .withColumn("breach",
          when(col("ns_quota") >= 0 && col("n_files") > col("ns_quota"),
            lit("ns"))
            .when(col("space_quota") >= 0 && col("bytes") > col("space_quota"),
              lit("space"))
            .otherwise(lit("none")))
        .orderBy("entry")
    },

    "fs_cat_text" -> { (s, d) =>
      // hh cat: byte/line-stream read. Round-trips documents.text
      // through a plain-text export; the oracle cross-checks the
      // line/char totals straight off the documents table.
      val tmp = scratch(s, "cat_text", d)
      documents(s, d).select("text").write.mode("overwrite").text(tmp)
      s.read.text(tmp)
        .agg(count(lit(1)).as("n_lines"),
          sum(length(col("value"))).as("total_chars"))
    },

    "fs_small_files" -> { (s, d) =>
      // Small-files audit — the report that decides WHERE fs_compact is
      // worth running: per size class, file count, byte totals, extrema,
      // and the file count a 128 MiB-target rewrite would leave. Pure
      // aggregation over the executor-streamed DSv2 listing — at estate
      // scale this audits a namespace of 10^8 files without the driver
      // ever holding the list.
      val targetBytes = 134217728.0 // 128 MiB
      val threshBytes = 262144L     // 256 KiB: "small" cutoff
      FsOps.find(s, d).filter(!col("is_dir"))
        .withColumn("cls",
          when(col("length") < threshBytes, "small").otherwise("ok"))
        .groupBy("cls")
        .agg(count(lit(1)).as("n_files"), sum(col("length")).as("bytes"),
          min(col("length")).as("min_bytes"), max(col("length")).as("max_bytes"))
        .withColumn("files_after_compaction",
          ceil(col("bytes").cast("double") / targetBytes).cast("long"))
        .orderBy("cls")
    },

    "fs_compact" -> { (s, d) =>
      // Small-files compaction — the standing maintenance op of any
      // 100 TB parquet estate: read a fragmented layout, rewrite at the
      // target file count, prove zero row loss. Seeds an 8-file layout
      // (round-robin repartition fills all 8 at every sf tier), compacts
      // to 2, and emits (files in/out, rows, distinct keys) with the
      // file counts taken from the actual directory listings.
      val tmp = scratch(s, "compact", d)
      documents(s, d).select("doc_id", "lang", "n_chars")
        .repartition(8).write.mode("overwrite").parquet(s"$tmp/in")
      s.read.parquet(s"$tmp/in")
        .repartition(2).write.mode("overwrite").parquet(s"$tmp/out")
      def nParquet(dir: String): Long = FsOps.ls(s, dir)
        .filter(col("name").rlike("^part-.*\\.parquet$")).count()
      s.read.parquet(s"$tmp/out")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"))
        .withColumn("n_files_in", lit(nParquet(s"$tmp/in")))
        .withColumn("n_files_out", lit(nParquet(s"$tmp/out")))
        .select("n_files_in", "n_files_out", "n_rows", "n_docs")
    },

    "fs_put" -> { (s, d) =>
      // hh put — the UPLOAD direction fs_distcp's get/copy leaves out
      // (VERDICT r9 item 7): client-side files pushed INTO the estate.
      // Same machinery reversed: parallelize the client FILE LIST, one
      // executor task per file streaming bytes through Hadoop
      // FileSystem I/O — no driver materialization, aggregate-bandwidth
      // uploads at any file count. The client side is a planted
      // known-construction fixture (the fs_sync_plan oracle pattern:
      // scratch paths carry the applicationId, so the oracle can't
      // list them — but the fixture is DECLARED, and the hash gate
      // proves the plant → upload → list → digest chain reproduces the
      // declaration byte-for-byte, zero-byte upload included).
      val srcDir = plantDir(s, "putsrc", d, putFixture)
      val dst = scratch(s, "putdst", d)
      import s.implicits._
      val hconf = new org.apache.spark.util.SerializableConfiguration(
        s.sparkContext.hadoopConfiguration)
      FsOps.ls(s, srcDir)
        .filter(!col("is_dir") && col("name").endsWith(".dat"))
        .select("path").as[String]
        .foreachPartition { (it: Iterator[String]) =>
          val c = hconf.value
          it.foreach { p =>
            val src = new org.apache.hadoop.fs.Path(p)
            val out = new org.apache.hadoop.fs.Path(dst, src.getName)
            org.apache.hadoop.fs.FileUtil.copy(
              src.getFileSystem(c), src, out.getFileSystem(c), out,
              false /* deleteSource */, true /* overwrite */, c)
          }
        }
      val glob = new org.apache.hadoop.fs.Path(s"$dst/*.dat")
      val got = glob.getFileSystem(s.sparkContext.hadoopConfiguration)
        .globStatus(glob)
      require(got != null && got.nonEmpty,
        s"fs_put: upload produced no .dat files in $dst")
      // Manifest from the LISTING, digests from the binaryFile re-read;
      // zero-byte files take md5("") — the fs_distcp digest rule.
      val uploaded = FsOps.ls(s, dst)
        .filter(!col("is_dir") && col("name").endsWith(".dat"))
        .select(col("name"), col("length"))
      val digests = s.read.format("binaryFile").load(s"$dst/*.dat")
        .select(element_at(split(col("path"), "/"), -1).as("name"),
          md5(hex(col("content"))).as("bin_md5"))
      uploaded.join(digests, Seq("name"), "left")
        .select(col("name"), col("length"),
          coalesce(col("bin_md5"), md5(lit(""))).as("content_md5"))
        .orderBy("name")
    },

    "fs_distcp" -> { (s, d) =>
      // hh get/put at estate scale == distcp: parallelize the FILE LIST
      // (not the bytes) and stream each file's copy through Hadoop
      // FileSystem I/O inside an executor task — one task per file, no
      // driver materialization, no shuffle; 100 TB copies at aggregate
      // disk/network bandwidth exactly like the real DistCp. The gate
      // then reads the COPIES back through the distributed binaryFile
      // source and emits a full-content digest per file, while the
      // oracle computes the same digest from the SOURCE files — any
      // dropped or corrupted byte anywhere in the copy fails the hash
      // compare. (Digest is md5 over the hex rendering: DuckDB's md5
      // can't take a raw BLOB, and hex equality across the two engines
      // is already pinned by fs_cat_binary.)
      val dst = scratch(s, "distcp", d)
      import s.implicits._
      val hconf = new org.apache.spark.util.SerializableConfiguration(
        s.sparkContext.hadoopConfiguration)
      // Recursive find, not one-level ls: table-shaped layouts keep
      // their part files one level down (dir/table.parquet/part-*), and
      // a copy tool that silently skips them "passes" on flat dirs
      // only. Copies land flat in dst (part-file names carry a UUID, so
      // no collisions); the driver's flat sf tiers make the gate output
      // identical to the source listing the oracle digests.
      val srcFiles = FsOps.find(s, d)
        .filter(!col("is_dir") && col("name").rlike(parquetGlobRegex))
      // Flat copy requires unique basenames — with a collision the
      // second copy would silently overwrite the first, losing a file
      // with no gate signal (nested layouts have no oracle). Fail loud
      // instead; a relative-path-preserving mode is the production
      // answer when estates genuinely collide.
      val collisions = srcFiles.groupBy("name").count().filter(col("count") > 1).count()
      require(collisions == 0,
        s"fs_distcp: $collisions basename collisions under $d; flat copy would lose files")
      srcFiles.select("path").as[String]
        .foreachPartition { (it: Iterator[String]) =>
          val c = hconf.value
          it.foreach { p =>
            val src = new org.apache.hadoop.fs.Path(p)
            val out = new org.apache.hadoop.fs.Path(dst, src.getName)
            org.apache.hadoop.fs.FileUtil.copy(
              src.getFileSystem(c), src, out.getFileSystem(c), out,
              false /* deleteSource */, true /* overwrite */, c)
          }
        }
      // Same empty-glob guard as fs_cat_binary (binaryFile.load throws a
      // deep AnalysisException out of query construction on an empty
      // match): covers both an empty source dir and a failed copy.
      val dstGlob = new org.apache.hadoop.fs.Path(s"$dst/*.parquet")
      val copiedFiles = dstGlob.getFileSystem(s.sparkContext.hadoopConfiguration)
        .globStatus(dstGlob)
      require(copiedFiles != null && copiedFiles.nonEmpty,
        s"fs_distcp: no *.parquet copied from $d to $dst")
      // Manifest from the LISTING of the copies, digests from the
      // binaryFile re-read: binaryFile silently yields no row for a
      // zero-byte file, and real estates do hold empty part/marker
      // files — a manifest driven by the content scan alone would
      // silently drop them from the gate. Empty files take md5 of the
      // empty string (= md5(hex(<empty content>)), same digest rule).
      val copied = FsOps.ls(s, dst)
        .filter(!col("is_dir") && col("name").rlike(parquetGlobRegex))
        .select(col("name"), col("length"))
      val digests = s.read.format("binaryFile").load(s"$dst/*.parquet")
        .select(element_at(split(col("path"), "/"), -1).as("name"),
          md5(hex(col("content"))).as("bin_md5"))
      copied.join(digests, Seq("name"), "left")
        .select(col("name"), col("length"),
          coalesce(col("bin_md5"), md5(lit(""))).as("content_md5"))
        .orderBy("name")
    },

    "fs_checksum_manifest" -> { (s, d) =>
      // hh checksum — the verify half of every distcp/migration story
      // (round 13): a WHOLE-CONTENT digest manifest of the estate's
      // files, (name, length, content_md5), computed executor-side by
      // the distributed binaryFile source (one task per file, no
      // driver materialization — 100 TB of blobs digests like any
      // other scan; a real estate would persist this table and diff
      // it against the destination's after a copy). Closes
      // fs_cat_binary's documented caveat (its oracle engine couldn't
      // digest blobs, so it compared a 16-byte head): the md5-of-
      // UPPERCASE-HEX form IS oracle-expressible (the fs_put digest
      // rule), so this gate proves full-content integrity end to end.
      val hp = new org.apache.hadoop.fs.Path(s"$d/*.parquet")
      val matches = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .globStatus(hp)
      require(matches != null && matches.nonEmpty,
        s"fs_checksum_manifest: no *.parquet under $d")
      s.read.format("binaryFile").load(s"$d/*.parquet")
        .select(
          element_at(split(col("path"), "/"), -1).as("name"),
          col("length"),
          md5(hex(col("content"))).as("content_md5"))
        .orderBy("name")
    },

    "fs_cat_binary" -> { (s, d) =>
      // hh get/cat for opaque content: the distributed `binaryFile`
      // source streams whole files as (path, length, content) rows —
      // one task per file, no driver materialization; 100 TB of blobs
      // reads like any other scan. Emits a first-16-byte hex digest the
      // oracle recomputes via read_blob (whole-content md5 is not
      // blob-expressible in the oracle engine; full-content equality is
      // covered by length + header in practice for these files).
      //
      // Existence guard: binaryFile.load on an empty glob throws a deep
      // AnalysisException out of query *construction* (round-3's bench
      // tail showed exactly that trace from a transiently-empty dir);
      // check up front so the failure is one clear, caught line instead.
      val hp = new org.apache.hadoop.fs.Path(s"$d/*.parquet")
      val matches = hp.getFileSystem(s.sparkContext.hadoopConfiguration).globStatus(hp)
      require(matches != null && matches.nonEmpty, s"fs_cat_binary: no *.parquet under $d")
      s.read.format("binaryFile").load(s"$d/*.parquet")
        .select(
          element_at(split(col("path"), "/"), -1).as("name"),
          col("length"),
          hex(substring(col("content"), 1, 16)).as("head_hex"))
        .orderBy("name")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "fs_tier_plan" -> tierPlanOracle,

    // Known-construction emission straight from the SAME fixture Seq the
    // query plants — one source of truth; owner/group are Verify-injected
    // environment facts (java.nio probe of the planting process).
    // Known construction (the fs_ls_long pattern): the expected finding
    // is part of the fixture declaration.
    "fs_audit_perms" -> {
      val rows = auditFixture.map { case (name, _, _, perm, finding) =>
        s"('$name', '$perm', '$finding', ${finding != "none"})"
      }.mkString(", ")
      s"SELECT name, perm, finding, flagged FROM (VALUES $rows) " +
        "t(name, perm, finding, flagged) ORDER BY name"
    },

    "fs_ls_long" -> {
      val rows = lsLongFixture.map { case (name, content, _, perm) =>
        s"('$perm', CAST(${content.length} AS BIGINT), '$name')"
      }.mkString(", ")
      s"SELECT perm, '$FsUserToken' AS owner, '$FsGroupToken' AS grp, " +
        s"length, name FROM (VALUES $rows) t(perm, length, name) ORDER BY name"
    },

    "fs_ls" ->
      s"""SELECT list_extract(string_split(file, '/'), -1) AS name
        |FROM glob('$SfDirToken/*') ORDER BY name""".stripMargin,

    "fs_find_glob" ->
      s"""SELECT name FROM (
        |  SELECT list_extract(string_split(file, '/'), -1) AS name
        |  FROM glob('$SfDirToken/**')) t
        |WHERE regexp_matches(name, '$parquetGlobRegex')
        |ORDER BY name""".stripMargin,

    "fs_cat_text" ->
      "SELECT count(*) AS n_lines, CAST(sum(n_chars) AS BIGINT) AS total_chars FROM documents",

    "fs_du" ->
      s"""WITH f AS (
        |  SELECT list_extract(string_split(filename, '/'), -1) AS entry, size
        |  FROM read_blob('$SfDirToken/*'))
        |SELECT entry, bytes, n_files FROM (
        |  SELECT entry, CAST(sum(size) AS BIGINT) AS bytes, count(*) AS n_files
        |  FROM f GROUP BY entry
        |  UNION ALL
        |  SELECT '<TOTAL>', CAST(sum(size) AS BIGINT), count(*) FROM f) t
        |ORDER BY entry""".stripMargin,

    "fs_du_quota" -> duQuotaOracle,

    "fs_compact" ->
      """SELECT CAST(8 AS BIGINT) AS n_files_in, CAST(2 AS BIGINT) AS n_files_out,
        |  count(*) AS n_rows, count(DISTINCT doc_id) AS n_docs
        |FROM documents""".stripMargin,

    "fs_small_files" ->
      s"""WITH f AS (
        |  SELECT CASE WHEN size < 262144 THEN 'small' ELSE 'ok' END AS cls,
        |    size
        |  FROM read_blob('$SfDirToken/**'))
        |SELECT cls, count(*) AS n_files, CAST(sum(size) AS BIGINT) AS bytes,
        |  CAST(min(size) AS BIGINT) AS min_bytes,
        |  CAST(max(size) AS BIGINT) AS max_bytes,
        |  CAST(ceil(CAST(sum(size) AS DOUBLE) / 134217728.0) AS BIGINT)
        |    AS files_after_compaction
        |FROM f GROUP BY cls ORDER BY cls""".stripMargin,

    "fs_cat_binary" ->
      s"""SELECT list_extract(string_split(filename, '/'), -1) AS name,
        |  size AS length, substring(hex(content), 1, 32) AS head_hex
        |FROM read_blob('$SfDirToken/*.parquet') ORDER BY name""".stripMargin,

    // Whole-content digest via md5-of-uppercase-hex — blob md5 is not
    // expressible in the oracle engine, but hex(BLOB) is, and both
    // engines' hex() is uppercase (the fs_put digest rule).
    "fs_checksum_manifest" ->
      s"""SELECT list_extract(string_split(filename, '/'), -1) AS name,
        |  size AS length, md5(hex(content)) AS content_md5
        |FROM read_blob('$SfDirToken/*.parquet') ORDER BY name""".stripMargin,

    // Known-construction oracle (fs_sync_plan precedent): the declared
    // fixture's lengths and md5-of-hex digests, stated independently —
    // hash equality proves the upload byte-lossless end to end.
    "fs_put" ->
      """SELECT name, CAST(length AS BIGINT) AS length, content_md5
        |FROM (VALUES
        |  ('up_a.dat', 5,  md5('616C706861')),
        |  ('up_b.dat', 11, md5('627261766F2D627261766F')),
        |  ('up_c.dat', 9,  md5('64656C74612D34320A')),
        |  ('up_e.dat', 0,  md5(''))) t(name, length, content_md5)
        |ORDER BY name""".stripMargin,

    // Digest of the SOURCE files; the Spark side digests the COPIES —
    // equality proves the distributed copy byte-lossless end to end.
    "fs_distcp" ->
      s"""SELECT list_extract(string_split(filename, '/'), -1) AS name,
        |  size AS length, md5(hex(content)) AS content_md5
        |FROM read_blob('$SfDirToken/*.parquet') ORDER BY name""".stripMargin,

    // Known-construction oracle (fs_ls_long precedent): the plan over
    // the DECLARED fixture — src {a:5, b:6, c:7, e:0} vs dst {b:5,
    // c:7, d:5, e:0} bytes — derived by the same size-only rule the
    // query states; the scratch paths carry the Spark applicationId so
    // DuckDB cannot list them, but the fixture is planted by the same
    // process that lists it, and the hash gate proves the whole
    // plant → list → join → decide chain reproduces this declaration.
    "fs_sync_plan" ->
      """SELECT name, action, CAST(src_len AS BIGINT) AS src_len,
        |  CAST(dst_len AS BIGINT) AS dst_len
        |FROM (VALUES
        |  ('sp_a.dat', 'copy',   5,    NULL),
        |  ('sp_b.dat', 'update', 6,    5),
        |  ('sp_c.dat', 'keep',   7,    7),
        |  ('sp_d.dat', 'delete', NULL, 5),
        |  ('sp_e.dat', 'keep',   0,    0))
        |  t(name, action, src_len, dst_len)
        |ORDER BY name""".stripMargin
  )
}
