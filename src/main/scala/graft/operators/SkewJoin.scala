package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins (SURVEY scale checklist): explode the
  * small side `salt`-ways, scatter the big side's hot keys across salt
  * buckets, join on (key, salt). AQE's skew-join handles most cases at
  * runtime; explicit salting is the deterministic fallback for pathological
  * keys (one user with 10% of all events).
  */
object SkewJoin {

  /** Salted inner equi-join big⋈small on `key`. The small side is
    * replicated salt× (broadcast anyway); the big side adds a random salt
    * column, splitting each hot key into `salt` independent join groups.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
                 seed: Long = 42L): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id() + lit(seed)), lit(salt)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
