package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join utility: salt the skewed (big) side into `salts`
  * sub-keys and replicate the small side once per salt, so one hot key's
  * rows spread over `salts` reducers instead of one straggler.
  *
  * This is the manual fallback for when AQE's runtime skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`) can't engage — e.g. aggregation
  * directly on a skewed key, or a deliberately co-partitioned pipeline.
  * Semantics are exactly the plain inner equi-join (q_join_salted is
  * oracle-checked against the unsalted SQL).
  */
object Skew {
  /** Inner equi-join `big.key == small.key` with an `salts`-way salt.
    * The salt is random per big-side row — any value in [0, salts) is
    * correct, so nondeterminism here never changes results. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", (rand(42) * salts).cast("int"))
    val replicatedSmall = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicatedSmall,
        saltedBig("_salt") === replicatedSmall("_salt") &&
          big(bigKey) === small(smallKey))
      .drop("_salt")
  }
}
