package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOfJoin

/** SparkSessionExtensions wiring: functions resolvable from SQL with no
  * manual registration, and the injected optimizer rule pushing filters
  * through the custom as-of join into the parquet scan.
  */
class ExtensionSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new GraftExtensions)
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("WARN")

  test("extension-registered functions resolve from plain SQL") {
    val r = spark.sql(
      "SELECT graft_fingerprint('abc') AS fp, graft_dot(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d")
      .collect().head
    // ((0*31+97)*31+98)*31+99 = 96354 (mod 1e9+7 unchanged)
    assert(r.getLong(0) === ((97L * 31 + 98) * 31 + 99))
    assert(r.getDouble(1) === 2.0)
  }

  test("surfaced bloom pair: no false negatives, measurable selectivity") {
    // graft_bloom_agg/graft_might_contain (Spark's own expressions,
    // injected by GraftExtensions): every inserted key MUST probe true
    // (bloom false negatives are impossible — this is the property
    // dedup_bloom_incremental's exactness rests on), and a disjoint key
    // range must probe mostly false (the prefilter actually filters).
    val r = spark.sql(
      """WITH bl AS (SELECT graft_bloom_agg(xxhash64(CAST(id AS STRING)), 500L, 8000L) AS bf
        |  FROM range(500)),
        |probes AS (SELECT id, graft_might_contain((SELECT bf FROM bl),
        |    xxhash64(CAST(id AS STRING))) AS hit FROM range(2000))
        |SELECT sum(CASE WHEN id < 500 AND hit THEN 1 ELSE 0 END) AS tp,
        |  sum(CASE WHEN id >= 500 AND hit THEN 1 ELSE 0 END) AS fp
        |FROM probes""".stripMargin).collect().head
    assert(r.getLong(0) === 500L, "bloom dropped an inserted key (false negative)")
    assert(r.getLong(1) < 300L, s"bloom passes ${r.getLong(1)}/1500 disjoint keys - no selectivity")
  }

  // NOTE deliberately NOT tested here: the `--conf
  // spark.sql.extensions=graft.GraftExtensions` deployment path. That
  // static conf is only read when the SparkContext is created, and the
  // test JVM's context already exists — a builder-config "test" gets the
  // pre-extended session back and asserts nothing (verified empirically:
  // a fresh session on the existing context does NOT see the functions).
  // The class itself is exercised via .withExtensions in every
  // Verify/Bench/spec session; the conf plumbing is Spark's own.

  test("NGram kernels are bit-identical to the HOF forms they replaced") {
    val sp = spark
    import sp.implicits._
    // Real corpus text + adversarial shapes: short strings, repeated
    // trigrams/shingles, multi-space (empty tokens), exact boundaries.
    val edge = Seq("", "ab", "abc", "aaaa", "x y", "a b c d e",
      "a b c d e f", "a  b c d e f", "w w w w w w w w",
      // non-ASCII: multi-byte BMP chars and astral-plane (surrogate
      // pair) code points — substr/length count code points, the
      // kernel must agree (surrogate-offset fallback path)
      "héllo wörld", "日本語のテキスト", "a😀b😀c d e f g",
      "😀😁", "😀😁😂😃")
    val docs = Tables.documents(spark, sf).select("text").as[String]
      .collect().take(50).toSeq ++ edge
    val df = docs.toDF("text")
    val tri = df.select(
      call_function("graft_trigrams", col("text")).as("k"),
      array_distinct(transform(sequence(lit(0),
        greatest(length(col("text")) - 3, lit(-1))),
        i => col("text").substr(i + 1, lit(3)))).as("h"),
      length(col("text")).as("len"))
      .collect()
    for (r <- tri) {
      val hof = if (r.getInt(2) < 3) Seq.empty else r.getSeq[String](1)
      assert(r.getSeq[String](0) === hof, s"trigram mismatch at len=${r.getInt(2)}")
    }
    val words = split(col("text"), " ")
    val sh = df.filter(size(words) >= 5).select(
      call_function("graft_shingles", col("text")).as("k"),
      array_distinct(transform(sequence(lit(0), size(words) - 5),
        i => concat_ws(" ", slice(words, i + 1, lit(5))))).as("h"))
      .collect()
    assert(sh.nonEmpty)
    for (r <- sh) assert(r.getSeq[String](0) === r.getSeq[String](1))
    // and <5-word docs yield empty shingle arrays
    val short = df.filter(size(words) < 5)
      .select(call_function("graft_shingles", col("text")).as("k")).collect()
    assert(short.forall(_.getSeq[String](0).isEmpty))
  }

  test("injected rule pushes left-only filters through AsOfJoinNode to the scan") {
    val clicks = Tables.eventsTs(spark, sf).filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("us"))
    val purchases = Tables.eventsTs(spark, sf).filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("us").as("p_us"))
    val df = AsOfJoin(clicks, "user_id", "us", purchases, "p_user", "p_us")
      .filter(col("user_id") < 50)

    val optimized = df.queryExecution.optimizedPlan.toString
    // The Filter must have moved BELOW the join node...
    val joinIdx = optimized.indexOf("AsOfJoinNode")
    val filterIdx = optimized.indexOf("(user_id")
    assert(joinIdx >= 0, s"join node missing:\n$optimized")
    assert(filterIdx > joinIdx,
      s"user_id filter was not pushed below the as-of join:\n$optimized")
    // ...and results match applying the filter after the join.
    val pushed = df.orderBy("event_id").collect().map(_.toString)
    val unpushed = AsOfJoin(clicks, "user_id", "us", purchases, "p_user", "p_us")
      .collect().filter(_.getAs[Long]("user_id") < 50)
      .sortBy(_.getAs[Long]("event_id")).map(_.toString)
    assert(pushed.toSeq === unpushed.toSeq)
  }

  override def afterAll(): Unit = spark.stop()
}
