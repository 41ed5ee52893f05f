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
