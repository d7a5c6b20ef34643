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
}
