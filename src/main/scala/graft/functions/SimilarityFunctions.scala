package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths:
  *  - brute-force cosine top-k: exact, one pass over the data, no
  *    shuffle beyond the final top-k — the correct baseline when fused
  *    into codegen (dot product via zip_with/aggregate, no UDF);
  *  - LSH (random-hyperplane) bucketing: sub-linear candidate search at
  *    100 TB — vectors are bucketed by sign pattern once (cheap,
  *    shuffle-free), probes only scan their own bucket. An IVF variant
  *    is the same topology with learned centroids instead of random
  *    planes.
  *
  * Hyperplanes are derived deterministically from [[PortableHash]] on
  * the driver and embedded as literals — no model state to store, and
  * the oracle can reproduce the exact same planes.
  */
object SimilarityFunctions {

  /** Sequential-order dot product of two equal-length double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity computed in double precision with sequential
    * summation — the exact same op order the oracle uses.
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = castDouble(a)
    val bd = castDouble(b)
    Portable.pround(dot(ad, bd) / (norm(ad) * norm(bd)), 6)
  }

  private def castDouble(a: Column): Column = a.cast("array<double>")

  /** Deterministic pseudo-random hyperplanes: component i of plane j is
    * uniform in [-1, 1), derived from md5("plane:j:i") — reproducible
    * anywhere, no stored model.
    */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (j, i) =>
      PortableHash.detHashJvm(s"plane:$j:$i") / 2147483648.0 - 1.0
    }

  /** Scale-adaptive plane count: enough sign bits that the EXPECTED
    * bucket size stays near `targetBucket` (planes ~ log2(n/target)), so
    * within-bucket pair work is O(target²) per bucket instead of
    * quadratic in n when the plane count is pinned. Integer-exact
    * (bit-length, no floating log2) so the oracle reproduces it:
    * p = bitlength(ceil(n/target) - 1), clamped to [lo, hi].
    *
    * Guarantee: whenever the `hi` clamp is not binding, p satisfies
    * 2^p ≥ n/targetBucket, so the expected bucket size n/2^p is at most
    * `targetBucket` — per-bucket pair work stays O(targetBucket²)
    * regardless of n. The default `hi` is [[MaxPlanes]], the Long
    * sign-pattern representation bound, which binds only past
    * n ≈ targetBucket·2^62 ≈ 3·10²⁰ vectors — i.e. the DEFAULT is
    * scale-safe; pass a smaller `hi` only to deliberately trade bucket
    * growth for fewer projections.
    */
  val PlanesLo = 4

  /** Hard representation ceiling, not a tuning knob: bucket ids pack
    * one sign bit per plane into a 64-bit long (`1L << j`), so 62
    * planes is the widest bucket id that stays positive. The oracle's
    * masked rendering width ([[maskedLshBucketSql]]) follows this same
    * constant, so engine and oracle can never disagree on the ceiling.
    */
  val MaxPlanes = 62
  val TargetBucket = 64L

  def adaptivePlanes(n: Long, targetBucket: Long = TargetBucket,
      lo: Int = PlanesLo, hi: Int = MaxPlanes): Int = {
    // overflow-safe ceil-div (n + target - 1 wraps near Long.MaxValue)
    val m = n / targetBucket + (if (n % targetBucket > 0) 1L else 0L)
    val bits =
      if (m <= 1L) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(m - 1L)
    math.min(hi, math.max(lo, bits))
  }

  /** Random-hyperplane LSH bucket id from `nPlanes` sign bits. */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int): Column = {
    val v = castDouble(vec)
    hyperplanes(nPlanes, dim).zipWithIndex.map { case (plane, j) =>
      val proj = dot(v, array(plane.toIndexedSeq.map(lit): _*))
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Brute-force top-k by cosine against one probe vector: score all,
    * take k. The order-by is (score desc, id) — total and deterministic.
    */
  def topKByCosine(df: DataFrame, vecCol: String, idCol: String,
      probe: Column, k: Int): DataFrame =
    df.withColumn("score", cosine(col(vecCol), probe))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** IVF-style partitioning: `k` centroids are the vectors with the
    * smallest seeded id-hash (deterministic "random" pick — at real
    * scale these would be k-means centroids; the topology is identical:
    * assign every vector to its nearest centroid cell, search only the
    * probe's cell).
    *
    * The k centroids are collected to the driver (k rows — they are the
    * model, not the data) and embedded in a [[graft.plans.NearestCentroid]]
    * codegen expression, so assignment is a per-row scalar projection:
    * zero row expansion, zero shuffle. The vector table is scanned once.
    */
  /** The k deterministic centroids (driver-resident model state). */
  def ivfCentroids(df: org.apache.spark.sql.DataFrame, vecCol: String,
      idCol: String, k: Int, seed: Int): Seq[(Long, Array[Float])] =
    df.orderBy(PortableHash.detHash(col(idCol), seed), col(idCol))
      .limit(k)
      .select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .toSeq

  def ivfAssign(df: org.apache.spark.sql.DataFrame, vecCol: String,
      idCol: String, k: Int, seed: Int): org.apache.spark.sql.DataFrame =
    df.withColumn("centroid_id", graft.plans.NearestCentroid.nearest(
      col(vecCol), ivfCentroids(df, vecCol, idCol, k, seed)))

  // ---- DuckDB-dialect renderings (oracle side) -------------------------

  def dotSql(ea: String, eb: String): String =
    s"list_sum(list_transform(list_zip($ea, $eb), p -> p[1] * p[2]))::DOUBLE"

  def cosineSql(ea: String, eb: String): String = {
    val (a, b) = (s"($ea)::DOUBLE[]", s"($eb)::DOUBLE[]")
    Portable.proundSql(
      s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))", 6)
  }

  /** Squared-L2 distance between two DOUBLE[] expressions in exact
    * integer micro-units: the raw double sum rounds ONCE to 1e-6 and is
    * carried as a BIGINT — same single-rounding discipline as
    * [[graft.plans.PqNearestSub]], so argmins and ADC sums are
    * bit-portable with no float-summation-order hazard.
    */
  def sqDistUmSql(a: String, b: String): String =
    s"CAST(floor(list_sum(list_transform(list_zip($a, $b), " +
      s"q -> (q[1] - q[2]) * (q[1] - q[2])))::DOUBLE * 1000000 + 0.5) AS BIGINT)"

  /** SQL list literal for one hyperplane. */
  private def planeSql(plane: Array[Double]): String =
    plane.mkString("[", ", ", "]::DOUBLE[]")

  def lshBucketSql(e: String, nPlanes: Int, dim: Int): String = {
    val v = s"($e)::DOUBLE[]"
    hyperplanes(nPlanes, dim).zipWithIndex.map { case (plane, j) =>
      val proj = dotSql(v, planeSql(plane))
      s"(CASE WHEN $proj > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** [[adaptivePlanes]] in DuckDB SQL — same integer bit-length formula
    * (`format('{:b}', …)` is the binary rendering), same clamps.
    * Yields a one-row relation `(p)`.
    */
  def adaptivePlanesSql(table: String, targetBucket: Long = TargetBucket,
      lo: Int = PlanesLo, hi: Int = MaxPlanes): String =
    s"""SELECT least($hi, greatest($lo,
       | CASE WHEN m <= 1 THEN 0 ELSE length(format('{:b}', m - 1)) END)) AS p
       |FROM (SELECT (count(*) + ${targetBucket - 1}) // $targetBucket AS m
       |      FROM $table)""".stripMargin

  /** Bucket under a RUNTIME plane count `pExpr` (≤ `maxPlanes`): the
    * full `maxPlanes`-bit bucket masked to its low p bits — identical to
    * computing with p planes, since bit j comes from plane j. With
    * `maxPlanes` defaulting to [[MaxPlanes]], the static SQL covers any
    * plane count [[adaptivePlanes]] can produce.
    */
  def maskedLshBucketSql(e: String, pExpr: String, dim: Int,
      maxPlanes: Int = MaxPlanes): String =
    s"(${lshBucketSql(e, maxPlanes, dim)} & ((1::BIGINT << $pExpr) - 1))"

  /** Per-plane projections of a probe vector as a `(j, proj)` relation —
    * the margin input of multi-probe LSH's probing sequence. One UNION
    * ALL branch per plane of `fromTable`.`eCol`; same dot-product
    * rendering as [[lshBucketSql]], so signs and margins agree with the
    * engine kernel bit-for-bit.
    */
  def probeMarginsSql(eCol: String, fromTable: String, dim: Int,
      maxPlanes: Int = MaxPlanes): String = {
    val v = s"($eCol)::DOUBLE[]"
    hyperplanes(maxPlanes, dim).zipWithIndex.map { case (plane, j) =>
      s"SELECT $j AS j, ${dotSql(v, planeSql(plane))} AS proj FROM $fromTable"
    }.mkString("(", " UNION ALL ", ")")
  }
}
