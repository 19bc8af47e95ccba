package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB joins (SCALING.md "Joins").
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when one join key dominates so heavily that a
  * single task would still own it (e.g. a null-like sentinel key or one
  * hot customer). The transformation is the standard one:
  *
  *   - the SKEWED (large) side gets a uniform random-ish salt in
  *     [0, saltFactor) — here derived deterministically by hashing the
  *     whole row's monotonically varying companion column is NOT assumed;
  *     callers pass the salt source column (any high-cardinality column)
  *     so results stay reproducible;
  *   - the SMALL(er) side is replicated saltFactor times via
  *     `explode(sequence(...))`;
  *   - the join key becomes (key, salt), spreading each hot key over
  *     saltFactor tasks.
  *
  * Equivalence with the unsalted join is exact for inner equi-joins (each
  * left row meets each right row exactly once: at its own salt).
  */
object SkewTools {

  /** Inner equi-join of `large` (skewed) with `small`, salted into
    * `saltFactor` sub-keys per join key. `saltSource` must be a
    * deterministic column of `large` (any column; uniformity, not
    * randomness, is what matters). */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
                      saltFactor: Int, saltSource: Column): DataFrame = {
    val salted = large.withColumn("__salt", pmod(xxhash64(saltSource), lit(saltFactor)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
