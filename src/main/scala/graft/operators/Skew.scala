package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key joins.
  *
  * AQE's skew-join split (on in GraftSession) handles most skew at runtime;
  * salting is the plan-level tool for the pathological case — one key
  * carrying a large fraction of a 100 TB fact table, where even a split
  * partition overwhelms its executor. The fact side spreads each hot key
  * over `n` salt buckets; the dimension side replicates each row `n` times.
  * Shuffle volume: facts unchanged, dims × n (dims are the small side). */
object Skew {

  /** Inner equi-join `facts.key == dims.key` with an `n`-way salt.
    * Deterministic: the fact-side salt is hashed from the whole fact row,
    * so results are reproducible run to run (unlike rand()-based salting)
    * while still spreading uniformly. */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String, n: Int): DataFrame = {
    require(n > 0, "salt fan-out must be positive")
    val saltedFacts = facts.withColumn("_salt",
      pmod(hash(struct(facts.columns.map(col): _*)), lit(n)))
    val saltedDims = dims.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1))))
    saltedFacts.join(saltedDims, Seq(key, "_salt")).drop("_salt")
  }
}
