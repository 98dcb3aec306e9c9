package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational analytics over the TPC-H-ish star schema — the warehouse-side
  * capability surface of the reference (SURVEY.md §2.5 A1–A5, §2.6 J1–J5,
  * §2.7 W1/O1/O2/L1, §2.8 D1–D4), re-expressed as declarative DataFrame
  * plans so Catalyst handles pushdown, partial aggregation and join
  * strategy selection.
  */
object Relational {

  /** A1-analog: per-entity KPI rollup (reference: per-session KPIs,
    * enhanced_kpi_consumer.py:558-612). Grouped hash aggregate with
    * map-side partial aggregation; scales linearly with input.
    */
  def sessionKpis(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"),
        round(avg(col("value")), 4).as("avg_value"),
        min(col("ts")).as("started_at"),
        max(col("ts")).as("ended_at"),
        countDistinct(col("event_type")).as("n_event_types"))

  val sessionKpisSql: String =
    """SELECT user_id,
      |       count(*) AS n_events,
      |       round(sum(value), 2) AS total_value,
      |       round(avg(value), 4) AS avg_value,
      |       min(ts) AS started_at,
      |       max(ts) AS ended_at,
      |       count(DISTINCT event_type) AS n_event_types
      |FROM events GROUP BY user_id""".stripMargin

  /** Q1-style pricing summary (scan + filter + wide hash aggregate).
    * Filter reaches the parquet scan as a pushed predicate.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |       round(avg(l_quantity), 4) AS avg_qty,
      |       round(avg(l_discount), 4) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_session_kpis" -> sessionKpis,
    "q1_pricing_summary" -> pricingSummary)

  val oracles: Map[String, String] = Map(
    "q_session_kpis" -> sessionKpisSql,
    "q1_pricing_summary" -> pricingSummarySql)
}
