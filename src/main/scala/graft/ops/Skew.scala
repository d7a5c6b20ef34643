package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: key salting.
  *
  * A hot key (one user with 10⁹ events) lands its entire partition on one
  * task in a plain shuffle join. Salting splits the large side's hot
  * partitions `saltFactor` ways (random-free: salt derives from a stable
  * row attribute so the plan stays deterministic) and replicates the small
  * side across every salt value, so the hot key's work spreads over
  * `saltFactor` tasks. AQE's skew-join handles moderate skew at runtime;
  * explicit salting is for pathological keys known in advance.
  */
object Skew {

  /** Inner equi-join `large ⋈ small` on `key`, with the large side salted
    * `saltFactor` ways by a deterministic hash of `saltBy` (any column that
    * varies within a key — an id, an offset) and the small side replicated
    * once per salt value. Result is row-identical to the unsalted join.
    */
  def saltedJoin(
      large: DataFrame, small: DataFrame, key: String,
      saltBy: Column, saltFactor: Int = 8): DataFrame = {
    val salted = large.withColumn("__salt", pmod(hash(saltBy), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Per-nation event rollup through a SALTED fact⋈dimension join — the
    * salting utility as a first-class oracled operator: events (the large,
    * possibly key-skewed side) join customers 8-way salted on `event_id`,
    * then the nation name rides a broadcast and the rollup aggregates.
    * Row-identical to the plain join by construction (the salt is an
    * equi-join column on BOTH sides), so the oracle runs the unsalted SQL
    * — the hash check proves the rewrite is semantics-preserving, the
    * plan shape (8× small-side fanout, hot key spread over 8 tasks) is
    * the 100 TB insurance. Output: (nation, n_events, total_value).
    */
  def saltedJoinAgg(events: DataFrame, customer: DataFrame,
      nation: DataFrame): DataFrame = {
    val large = events.select(col("user_id").as("custkey"),
      col("event_id"), graft.C.dec(col("value")).as("v"))
    val small = customer.select(col("c_custkey").as("custkey"), col("c_nationkey"))
    saltedJoin(large, small, "custkey", col("event_id"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("v")).cast("double").as("total_value"))
      .orderBy(col("nation"))
  }

  val saltedJoinAggSql: String =
    s"""SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(CAST(sum(CAST(${graft.C.nanNullSql("e.value")} AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_value
      |FROM events e
      |JOIN customer c ON e.user_id = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name ORDER BY nation""".stripMargin
}
