package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Skew-handling utilities for hot keys (SURVEY.md "optimize for
  * scale": salting + AQE are the two levers; AQE's skew-join handles
  * sort-merge joins automatically, these helpers cover aggregations and
  * broadcast-averse shapes AQE can't split).
  *
  * Salting is two-phase: spread the hot key over `salts` sub-keys with
  * a deterministic per-row salt, aggregate partially per (key, salt),
  * then merge the partials per key. The salt derives from
  * [[PortableHash]] of a row id — stable under retries, like all graft
  * randomness.
  */
object Skew {

  /** Deterministic salt column in [0, salts). */
  def saltCol(idCol: Column, salts: Int, seed: Int = 0): Column =
    (PortableHash.detHash(idCol, seed) % salts).cast("int")

  /** Two-phase salted aggregation: count/sum-shaped aggregates over a
    * skewed key. `partial` defines per-(key,salt) aggregates; `merge`
    * combines the partial columns per key. Both phases are ordinary
    * hash aggregations — the first spreads a hot key over `salts`
    * reducers.
    */
  def saltedAgg(df: DataFrame, keyCol: String, idCol: String, salts: Int)(
      partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df.withColumn("__salt__", saltCol(col(idCol), salts))
      .groupBy(col(keyCol), col("__salt__"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(keyCol))
      .agg(merge.head, merge.tail: _*)

  /** Salted broadcast-side explosion for joining a skewed fact against
    * a small dimension when AQE can't help (e.g. the dim must shuffle):
    * the fact side gets a deterministic salt, the dim side is exploded
    * across all salt values, and the join key becomes (key, salt).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, idCol: String,
      salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt__", saltCol(col(idCol), salts))
    val explodedDim = dim
      .withColumn("__salt__", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt__", col("__salt__").cast("int"))
    saltedFact.join(explodedDim, Seq(key, "__salt__")).drop("__salt__")
  }
}
