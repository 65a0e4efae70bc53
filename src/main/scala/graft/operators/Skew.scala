package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY §7.5.6: "salting documented for
  * skewed keys — hot products").
  *
  * AQE's skew-join splitting handles most runtime skew transparently
  * (enabled in the bench/verify sessions); these helpers cover the two
  * cases AQE does not:
  *   - a single-key aggregation where one key dominates (AQE can't split
  *     a hash-aggregate group): [[saltedAgg]] two-phase aggregation;
  *   - a broadcast-infeasible join against a table with a handful of hot
  *     keys: [[saltedJoinKeys]] replicates the small side per salt.
  *
  * Salting is mechanical: results are EXACTLY those of the unsalted plan
  * (asserted by SkewSpec), only the shuffle key space changes — hot key h
  * becomes (h, 0..salt-1), spreading its rows over `salt` reducers.
  */
object Skew {

  /** Deterministic pseudo-random salt column in [0, salt). Derived from
    * xxhash64 of the whole row's key list so re-runs are stable. */
  def saltCol(salt: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salt)).cast("int")

  /** Two-phase (salted) sum-count aggregation: groupBy(key, salt) partial
    * → groupBy(key) final. Plans two small shuffles instead of one
    * skewed one; exact for algebraic aggregates (sum/count here). */
  def saltedAgg(df: DataFrame, key: String, valueCol: String,
      salt: Int = 16): DataFrame =
    df.withColumn("_salt", saltCol(salt, monotonically_increasing_id()))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial_sum"),
        count(lit(1)).as("_partial_cnt"))
      .groupBy(col(key))
      .agg(sum("_partial_sum").as(s"sum_$valueCol"),
        sum("_partial_cnt").as("cnt"))

  /** Salted equi-join: the big (skewed) side gets a random salt in
    * [0, salt); the small side is replicated once per salt value via an
    * explode — the join key becomes (key, salt), splitting each hot key's
    * rows across `salt` tasks. Exact join semantics (inner). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      saltCol(salt, monotonically_increasing_id()))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1)).cast("array<int>")))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
