package graft.ops

import graft.C
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational batch aggregates over the TPC-H-ish tables — the flagship /
  * bench headline queries. The reference has no batch-relational layer
  * (SURVEY.md §2.8), so these exercise the engine's generic scan→agg→join
  * path that all other operators build on.
  *
  * Determinism: money math in exact DECIMAL, cast to DOUBLE on the final
  * projection only (see [[graft.C]]).
  */
object Tpch {

  private val one = lit(1).cast(DecimalType(18, 2))

  /** Pricing summary (TPC-H Q1 shape): scan-heavy, 4 aggregates per group,
    * 6 groups. Whole plan is scan → partial hash agg → exchange(6 groups) →
    * final agg: the shuffle moves O(groups × partitions) rows no matter the
    * input size, so this scales linearly with data volume.
    */
  def q1PricingSummary(lineitem: DataFrame): DataFrame = {
    val li = lineitem.select(
      col("l_returnflag"), col("l_linestatus"),
      C.dec(col("l_quantity")).as("qty"),
      C.dec(col("l_extendedprice")).as("price"),
      C.dec(col("l_discount")).as("disc"),
      C.dec(col("l_tax")).as("tax"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("qty")).cast("double").as("sum_qty"),
        sum(col("price")).cast("double").as("sum_base_price"),
        sum(col("price") * (one - col("disc"))).cast("double").as("sum_disc_price"),
        sum(col("price") * (one - col("disc")) * (one + col("tax"))).cast("double").as("sum_charge"),
        (sum(col("qty")).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1PricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Revenue by customer nation (Q5 shape): fact table joined to two
    * broadcast dims, grouped by nation. Exercises broadcast-hash-join
    * pipelining — no shuffle on the fact side until the final 25-group agg.
    */
  def revenueByNation(orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame =
    orders
      .select(col("o_custkey"), C.dec(col("o_totalprice")).as("price"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sum(col("price")).cast("double").as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("nation"))

  val revenueByNationSql: String =
    """SELECT n_name AS nation,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin
}
