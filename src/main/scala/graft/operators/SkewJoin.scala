package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. A hot key (one user producing 10% of
  * a 100 TB event stream) turns a hash join into a single straggler
  * reducer; salting shards each key into `saltFactor` sub-keys — the big
  * side gets a uniform pseudo-random salt per row, the small side is
  * exploded across all salts — so the hot key's rows spread over
  * `saltFactor` reducers. Results are identical to the plain join.
  *
  * (Spark's AQE skew-join handles sort-merge skew adaptively at runtime;
  * this utility is the explicit-plan variant for pipelines that need
  * deterministic sharding, e.g. when AQE is disabled or the skew is known
  * up front.)
  */
object SkewJoin {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 16, joinType: String = "inner"): DataFrame = {
    // right/full outer joins are rejected: the small side is exploded
    // saltFactor×, so each of its unmatched keys would surface saltFactor
    // null-extended rows instead of one — not identical to the plain join
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "cross", "left", "leftouter", "leftsemi", "leftanti")
      .contains(normalized),
      s"saltedJoin supports inner/left-ish joins only, got: $joinType")
    val saltCol = "__graft_salt"
    // uniform deterministic-enough salt per large-side row; any
    // distribution works — correctness never depends on salt values
    val l = large.withColumn(saltCol,
      pmod(hash(col(key), monotonically_increasing_id()), lit(saltFactor)))
    val s = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(s, l(key) === s(key) && l(saltCol) === s(saltCol), joinType)
      .drop(s(key)).drop(l(saltCol)).drop(s(saltCol))
  }
}
