package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join primitives. AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin`) covers most runtime skew; explicit
  * salting is for *structurally* hot keys known in advance (a null-heavy
  * foreign key, a head-heavy power-law key) where one reducer would
  * otherwise receive a large fraction of the table every run.
  */
object Skew {

  /** Salted inner equi-join: the big (skewed) side gets a deterministic
    * salt in [0, salts); the small side is replicated `salts` times; the
    * shuffle keys on (key, salt), splitting each hot key across `salts`
    * reducers. Result set is exactly the plain join's (the salt is
    * internal), at the cost of replicating the smaller side `salts`×.
    *
    * The salt derives from xxhash64 over the big side's whole row — spread
    * is uniform, no RNG, and the same input always salts the same way
    * (deterministic re-runs, no lineage-recompute hazards).
    *
    * Prefer plain join + AQE unless the hot keys are stable and extreme;
    * at 100 TB this is the fallback for the keys AQE cannot split further
    * (a single key larger than one executor's share).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keyCols: Seq[String],
      salts: Int = 8): DataFrame = {
    require(salts > 0, "salts must be positive")
    val bigSalted = big.withColumn(
      "_salt", pmod(xxhash64(big.columns.map(col): _*), lit(salts)).cast("int"))
    val smallRepl = small.withColumn(
      "_salt", explode(sequence(lit(0), lit(salts - 1))))
    bigSalted.join(smallRepl, keyCols :+ "_salt").drop("_salt")
  }
}
