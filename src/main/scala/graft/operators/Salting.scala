package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew escape hatch (SURVEY.md §7.6): when one join key carries a
  * disproportionate share of rows, AQE's skew-join split handles the
  * shuffle-partition side automatically (demonstrated in SkewSpec), but a
  * *deliberate* rewrite is still the tool when the skew is known up front
  * or the join isn't a sort-merge AQE can split.
  */
object Salting {

  /** Salted inner equi-join, row-identical to
    * `big.join(small, Seq(key))`:
    * the big (skewed) side gets a deterministic salt in [0, buckets)
    * derived from `saltFrom` (any high-cardinality column — NOT rand(),
    * which breaks retry determinism); the small side is replicated
    * `buckets` times; joining on (key, salt) splits each hot key across
    * `buckets` tasks. The small side grows by the factor, which is why
    * buckets stays single-digit-to-tens, not thousands.
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
      saltFrom: Column, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val salted = big.withColumn("__salt", pmod(hash(saltFrom), lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    // shuffle_hash pins the shuffle path: if the small side fit a
    // broadcast there would be no skew to salt in the first place, and
    // letting fixture-size inputs auto-broadcast would make the salting
    // (and any test built on it) vacuous.
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "__salt"))
      .drop("__salt")
  }
}
