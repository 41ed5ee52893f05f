package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** True Structured Streaming forms of the §2j operators. Each builds on
  * an unbounded `readStream` source and is proven equal to its batch
  * form in StreamingSpec (file source → MemorySink, SURVEY.md §5.4).
  *
  * Scale note: all aggregations here are keyed (event_type, user_id,
  * session key), so state partitions across executors; watermarks bound
  * state size — the properties that matter when the stream is 100 TB/day.
  */
object StreamingOps {
  /** Schema of the events table as the file source reads it (ts is raw
    * int64 nanos — same convention as Tables.events).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Unbounded events source over a directory of parquet files. */
  def readEvents(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val r = spark.readStream.schema(eventsSchema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(dir)
      .withColumn("ts_t", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Tumbling 1-hour counts by type with a watermark. */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts_t", watermark)
      .groupBy(window(col("ts_t"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("hour_start"), col("event_type"), col("n"))

  /** Sliding 1-hour/30-minute event counts. */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts_t", watermark)
      .groupBy(window(col("ts_t"), "1 hour", "30 minutes").as("win"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("n"))

  /** Session windows with a 5-minute inactivity gap. */
  def sessionCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts_t", watermark)
      .groupBy(session_window(col("ts_t"), "5 minutes").as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("win.start").as("start_t"),
        col("win.end").as("end_t"), col("n_events"))

  /** Drop duplicate event_ids within the watermark horizon. */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts_t", watermark).dropDuplicates("event_id")

  final case class UserTotal(user_id: Long, n: Long, total: Double)

  /** Explicit keyed state: per-user running totals via
    * flatMapGroupsWithState (update mode emits the refreshed total on
    * every batch that touches the key).
    */
  def runningTotals(events: DataFrame): Dataset[UserTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (n0, t0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var t = t0
          rows.foreach { r => n += 1; t += r._2 }
          state.update((n, t))
          Iterator(UserTotal(user, n, t))
      }
  }

  /** The same running totals on the Spark-4 arbitrary-state API
    * (transformWithState / StatefulProcessor): typed per-key ValueState
    * with explicit lifecycle, TTL hooks, and timer support — the
    * replacement for flatMapGroupsWithState that a long-lived 100 TB/day
    * state pipeline would use (state lives in RocksDB with changelog
    * checkpointing rather than an in-memory HashMap). StreamingSpec
    * asserts its trajectory equals both the legacy form and the batch
    * twin.
    */
  class RunningTotalProcessor
      extends StatefulProcessor[Long, (Long, Double), UserTotal] {
    @transient private var totals: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)]("totals",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaDouble),
        TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[(Long, Double)],
        timers: TimerValues): Iterator[UserTotal] = {
      val (n0, t0) = if (totals.exists()) totals.get() else (0L, 0.0)
      var n = n0; var t = t0
      rows.foreach { r => n += 1; t += r._2 }
      totals.update((n, t))
      Iterator(UserTotal(user, n, t))
    }
  }

  /** transformWithState requires the RocksDB state store; the caller's
    * session must set spark.sql.streaming.stateStore.providerClass to
    * RocksDBStateStoreProvider before starting the query.
    */
  def runningTotalsTws(events: DataFrame): Dataset[UserTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new RunningTotalProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
