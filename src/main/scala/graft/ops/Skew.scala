package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helpers.
  *
  * A shuffle join on a key with a hot value sends that whole key to
  * one reducer; at 100 TB a single hot key (null-heavy FK, default id,
  * celebrity user) stalls the stage no matter how many executors
  * exist. AQE's runtime skew-join split handles the sort-merge case
  * when statistics surface it; [[saltedJoin]] is the deterministic
  * plan-level fix for when the skew is known up front — salt the fact
  * side into `r` sub-keys and replicate the dim side `r` ways, so the
  * hot key spreads over `r` reducers. Cost: dim side grows by `r`
  * (keep it the small side), every fact row gains one int column.
  */
object Skew {

  /** Inner-join `fact` to `dim` on `key`, spreading each fact key over
    * `r` reducers. The salt is derived from `saltFrom` (any
    * well-distributed fact column, e.g. a row id) so it is
    * deterministic — no `rand()`, so the plan stays reproducible and
    * retry-safe. `dim` MUST be unique per key (it is replicated, not
    * aggregated).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFrom: Column, r: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(saltFrom, lit(r)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(r - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
