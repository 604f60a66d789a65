package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** The reference's "exchange layer": shard/sample shuffling, weighted
  * prefix mixture, repetition (reference sdata/datapipeline.py:424-472,
  * sdata/custom_datapipes.py:177-281 — SURVEY.md §2.5).
  *
  * The reference uses bounded in-memory buffers because it streams one
  * sample at a time; those buffers are an artifact of single-pass
  * iteration, not of the logical semantics. Here every operation is a
  * deterministic function of (row key, seed):
  *  - replayable under task retries (the reference's global-RNG approach
  *    is not),
  *  - oracle-checkable bit-for-bit,
  *  - and at 100 TB a hash-order shuffle is one exchange, with no buffer
  *    that silently drops data (custom_datapipes.py:257-268 can).
  */
object Sampling {

  /** Deterministic total ordering that behaves like a uniform shuffle:
    * order by a seeded hash of the key columns (replaces the bounded
    * Shuffler buffers X1/X2, reference datapipeline.py:424-444,508-509).
    *
    * At scale: a single range-partitioned sort exchange; for
    * training-style output where only *decorrelation* matters, prefer
    * [[shuffleWithinPartitions]] which avoids the global exchange.
    */
  def detShuffle(df: DataFrame, keyCols: Seq[String], seed: Int): DataFrame =
    df.orderBy(PortableHash.detHash(concat_ws("", keyCols.map(col): _*), seed))

  /** Shuffle with no global exchange: repartition by key-hash then sort
    * within partitions — the 100 TB-scale analogue of the reference's
    * buffered shuffle (decorrelated, not globally ordered).
    */
  def shuffleWithinPartitions(df: DataFrame, keyCols: Seq[String], seed: Int,
      numPartitions: Int): DataFrame = {
    val h = PortableHash.detHash(concat_ws("", keyCols.map(col): _*), seed)
    df.repartition(numPartitions, h)
      .sortWithinPartitions(h)
  }

  /** Deterministic Bernoulli sample: keep rows whose seeded key-hash
    * falls below `fraction` (the hash-threshold equivalent of
    * `df.sample`, but replayable and oracle-checkable).
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double, seed: Int): DataFrame =
    df.filter(PortableHash.detUniform(col(keyCol), seed) < fraction)

  /** Weighted mixture across dataset prefixes
    * (reference `PrefixResampler`, custom_datapipes.py:177-281): the
    * logical semantics is "output mixes prefixes with probabilities p".
    *
    * Matching is PREFIX matching, as in the reference
    * (custom_datapipes.py:248 `key.startswith(x)`): a config like
    * {"s3://web": 0.7, "s3://books": 0.3} buckets every shard URL under
    * the prefix it starts with. A row matching more than one prefix is
    * an error (the reference raises on non-unique matches,
    * custom_datapipes.py:249-253); rows matching none are dropped, like
    * URLs that never enter any reference buffer.
    *
    * Exact-count variant: rank rows within each prefix by seeded hash
    * and keep the top `round(p_i * total)` — a deterministic stratified
    * draw. Probabilities are normalized like the reference
    * (custom_datapipes.py:211-212). Unlike the reference's bounded FIFO
    * buffers, nothing is silently dropped on overflow.
    *
    * At scale this is one window over a hash-partitioned exchange on
    * the matched prefix — no skew risk beyond prefix cardinality itself
    * (salt the rank window if a single prefix dominates).
    */
  def prefixMixture(df: DataFrame, prefixCol: String, idCol: String,
      probs: Map[String, Double], total: Long, seed: Int): DataFrame = {
    val z = probs.values.sum
    require(z > 0, "prefix probabilities must sum > 0")
    val norm = probs.view.mapValues(_ / z).toMap
    val keys = norm.keys.toSeq.sorted
    val nMatch = keys.map(p => when(col(prefixCol).startsWith(p), 1).otherwise(0))
      .reduce(_ + _)
    val matched = keys.foldLeft(lit(null).cast("string")) { (acc, p) =>
      when(col(prefixCol).startsWith(p), lit(p)).otherwise(acc)
    }
    val target = norm.foldLeft(lit(0L)) { case (acc, (p, f)) =>
      when(col("__mix_prefix__") === p, lit(math.round(f * total))).otherwise(acc)
    }
    val w = Window.partitionBy(col("__mix_prefix__"))
      .orderBy(PortableHash.detHash(col(idCol), seed), col(idCol))
    df.withColumn("__mix_prefix__",
        when(nMatch > 1, raise_error(concat(
          lit("prefixMixture: value matches multiple prefixes: "), col(prefixCol))))
          .otherwise(matched))
      .filter(col("__mix_prefix__").isNotNull)
      .withColumn("__mix_rank__", row_number().over(w))
      .filter(col("__mix_rank__") <= target)
      .drop("__mix_rank__", "__mix_prefix__")
  }

  /** Finite repeat of a dataset (reference `.cycle(count)`,
    * datapipeline.py:472): a union of n self-copies with an epoch tag.
    * Infinite cycling is the training loop's concern, not the engine's.
    */
  def repeatCycle(df: DataFrame, n: Int, epochCol: String = "epoch"): DataFrame = {
    require(n >= 1)
    (0 until n).map(e => df.withColumn(epochCol, lit(e)))
      .reduce(_ unionAll _)
  }
}
