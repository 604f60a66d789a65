package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Seeded pseudo-random permutation (PRP) of `[0, n)` — shuffle as
  * arithmetic, not data movement.
  *
  * The reference shuffles by materializing order (buffer + RNG:
  * reference sdata/custom_datapipes.py:108-141 seeds process-global RNGs;
  * webdataset's shuffle buffers samples). That couples "random order" to
  * "moving the data". A bijection `p = F_seed(i)` decouples them: any
  * consumer can compute WHERE a row lands (epoch shard, split bucket,
  * read order) from its rank alone — zero payload shuffle, stable under
  * task retry, reproducible by an external oracle.
  *
  * Construction: balanced Feistel network over the smallest even number
  * of bits covering `n`, cycle-walking out-of-domain values back into
  * `[0, n)` (Black & Rogaway, "Ciphers with Arbitrary Finite Domains",
  * CT-RSA 2002 — the standard small-domain PRP recipe). Each round key
  * is [[PortableHash.detHashJvm]] of `"<R>:pfe:<seed>:<round>"`, so the
  * whole permutation is engine-portable: DuckDB reproduces it with a
  * recursive CTE over the same md5 arithmetic ([[duckPermuteCte]]).
  *
  * Walk termination is guaranteed: the Feistel network is a bijection on
  * `[0, 2^2k)`, so the orbit of a start point `i < n` must return to `i`,
  * and therefore passes through some value `< n`. Expected walk length is
  * `2^2k / n < 4` applications.
  *
  * Scale: the kernel is a per-row O(1) loop over at most a few Feistel
  * passes with no allocation beyond the hash input string — the same
  * justified-UDF tier as the FastText kernels (NOTES_r1 measurements).
  * Ranks are ids-only state: at 100 TB you compute `row_number` over the
  * key column once (ids exchange, never payload) or persist ranks as a
  * corpus artifact; every epoch/split/shard decision thereafter is pure
  * arithmetic on that rank.
  */
object Permute {

  /** Feistel rounds. 4 is the standard Luby–Rackoff strong-PRP count. */
  val Rounds = 4

  /** Half-width in bits: the domain is `2^(2k)`, the smallest even bit
    * count covering `n`. Matches the oracle's
    * `(length(printf('%b', n-1)) + 1) // 2`.
    */
  def halfBits(n: Long): Int = {
    require(n >= 1, s"permutation domain must be non-empty, got n=$n")
    val b = java.lang.Long.toBinaryString(n - 1).length // bitlen; "0" -> 1
    (b + 1) / 2
  }

  /** The permuted position of `i` in the seeded permutation of `[0, n)`. */
  def permuteJvm(i: Long, n: Long, seed: Int): Long = {
    require(i >= 0 && i < n, s"index $i outside domain [0, $n)")
    val k = halfBits(n)
    val mask = (1L << k) - 1
    var x = i
    do {
      var l = x >> k
      var r = x & mask
      var rd = 0
      while (rd < Rounds) {
        val f = PortableHash.detHashJvm(s"$r:pfe:$seed:$rd") & mask
        val nr = l ^ f
        l = r
        r = nr
        rd += 1
      }
      x = (l << k) | r
    } while (x >= n)
    x
  }

  /** Column form over (rank, n) — `n` as a column so the corpus size can
    * come from a broadcast 1-row count frame instead of a driver scalar.
    */
  def permuteUdf(seed: Int): UserDefinedFunction =
    udf((i: Long, n: Long) => permuteJvm(i, n, seed))

  /** DuckDB CTE fragments reproducing [[permuteJvm]] over a ranked input.
    *
    * Emits (to be embedded in a `WITH RECURSIVE` preamble):
    * {{{
    *   <name>_n  AS (SELECT count(*) AS n, half-bit count k FROM <src>),
    *   <name>_rk AS (SELECT <id>, rank i FROM <src>),
    *   <name>_fe AS (the Feistel/cycle-walk state machine),
    *   <name>    AS (SELECT <id>, p FROM terminal states)
    * }}}
    * The caller's query then joins `<name>` for the permuted position `p`
    * of each `<id>`.
    */
  def duckPermuteCte(name: String, srcSql: String, idExpr: String, seed: Int): String = {
    val h = PortableHash.duckHashSql(
      s"(x & ((1::BIGINT << k) - 1))::VARCHAR || ':pfe:$seed:' || rd::VARCHAR")
    s"""${name}_n AS (
       |  SELECT count(*)::BIGINT AS n,
       |         ((length(printf('%b', count(*) - 1)) + 1) // 2)::BIGINT AS k
       |  FROM ($srcSql)),
       |${name}_rk AS (
       |  SELECT $idExpr AS id,
       |         row_number() OVER (ORDER BY $idExpr) - 1 AS i
       |  FROM ($srcSql)),
       |${name}_fe(id, x, rd) AS (
       |  SELECT id, i::BIGINT, 0 FROM ${name}_rk
       |  UNION ALL
       |  SELECT id,
    CASE WHEN rd < $Rounds
         THEN ((x & ((1::BIGINT << k) - 1)) << k) |
              xor(x >> k, $h & ((1::BIGINT << k) - 1))
         ELSE x END,
       |    CASE WHEN rd < $Rounds THEN rd + 1 ELSE 0 END
       |  FROM ${name}_fe, ${name}_n
       |  WHERE rd < $Rounds OR x >= n),
       |$name AS (
       |  SELECT id, x AS p FROM ${name}_fe, ${name}_n
       |  WHERE rd = $Rounds AND x < n)""".stripMargin
  }
}
