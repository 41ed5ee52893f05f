package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Relational core (SURVEY.md §2a/§2b/§2d): scans, projections, filters,
  * aggregations. All built-in Catalyst-optimized operators — predicate
  * pushdown / column pruning / partial aggregation come for free because
  * the plans are declarative (SURVEY.md §4b).
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** TPC-H-Q1-shaped flagship: scan → pushed filter → partial/final hash
    * agg → sort. Money sums via exact DECIMAL(18,4) (order-free), avgs
    * as rounded doubles over exact decimal sums (SURVEY.md §7.1).
    */
  def q1(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-06-30 00:00:00").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q1Oracle: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  ${oSum("l_quantity")} AS sum_qty,
      |  ${oSum("l_extendedprice")} AS sum_base_price,
      |  ${oSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
      |  ${oSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
      |  ${oAvg("l_quantity")} AS avg_qty,
      |  ${oAvg("l_extendedprice")} AS avg_price,
      |  ${oAvg("l_discount")} AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-06-30 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val queries: Map[String, Q] = Map(
    "agg_groupby" -> (q1 _)
  )

  val oracleSql: Map[String, String] = Map(
    "agg_groupby" -> q1Oracle
  )
}
