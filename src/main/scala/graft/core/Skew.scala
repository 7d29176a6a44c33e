package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §5).
  *
  * AQE's skew-join handling covers sort-merge joins after the fact;
  * salting is the declarative up-front form for joins whose key
  * distribution is known-skewed (a hot customer, a boilerplate dedup
  * bucket): spread each hot key over `salts` sub-partitions on the big
  * side and replicate the matching rows of the small side `salts`
  * times. The join stays an equi-join on (key, salt) — no shuffle is
  * larger than before, but no single reducer owns a hot key alone. */
object Skew {

  /** Equi-join `big ⋈ small` on `keys`, salted `salts` ways.
    *
    * The big side's salt is derived deterministically from a hash of
    * all its columns (not a random number — reruns and retries must
    * route rows identically); the small side is exploded ×salts.
    * Result columns = join keys ++ big's other columns ++ small's
    * other columns, exactly like `big.join(small, keys)`. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    require(salts > 0)
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)).cast("int"))
    val smallSalted = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    bigSalted.join(smallSalted, keys :+ "_salt").drop("_salt")
  }
}
