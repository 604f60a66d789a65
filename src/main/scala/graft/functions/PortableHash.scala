package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives.
  *
  * The reference pipeline derives all randomness from process-global RNG
  * seeds (reference sdata/custom_datapipes.py:108-141 `SeedSetter`;
  * sdata/sample_mappers.py:171-172 random crop). That is not stable under
  * Spark task retries, and not reproducible by an external oracle. Our
  * engine-wide rule (SURVEY.md §7.4): every "random" decision is a pure
  * function of (row key, seed).
  *
  * We use the first 8 hex digits of md5 — a primitive both Spark and
  * DuckDB evaluate identically — so sampling/shuffle/dedup operators are
  * oracle-checkable bit-for-bit:
  *   Spark : conv(substring(md5(cast(x as binary)),1,8),16,10)
  *   DuckDB: ('0x' || substr(md5(x),1,8))::BIGINT
  *
  * All of these are codegen'd built-ins (no UDFs), so they stay inside
  * whole-stage codegen at any scale.
  */
object PortableHash {

  /** 32-bit uniform hash of a column's string form, as a Long in [0, 2^32). */
  def detHash(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 8), 16, 10).cast("long")

  /** Seeded variant: mixes an integer seed into the key. */
  def detHash(c: Column, seed: Int): Column =
    detHash(concat(c.cast("string"), lit(":" + seed)))

  /** Deterministic uniform double in [0, 1) from (key, seed) — the
    * replacement for `rand(seed)` wherever the result must be replayable
    * per-row under retries and checkable by the DuckDB oracle.
    */
  def detUniform(c: Column, seed: Int): Column =
    detHash(c, seed) / lit(4294967296.0)

  /** Thread-local MD5 instances: `MessageDigest.getInstance` costs ~µs
    * per call (provider lookup + allocation), which dominates kernels
    * doing millions of hashes; `digest()` resets the instance so reuse
    * is safe.
    */
  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** JVM-side evaluation of [[detHash]] — same first-4-bytes-of-md5
    * value, for hot kernels (FastText) and driver-side derived constants
    * (LSH hyperplanes).
    */
  def detHashJvm(s: String): Long = {
    val d = md5Local.get().digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Raw 16-byte md5 of a string's UTF-8 form (thread-local instance) —
    * the digest [[graft.functions.BlockDigestSet]] packs into its
    * 128-bit membership keys.
    */
  def md5BytesJvm(s: String): Array[Byte] =
    md5Local.get().digest(s.getBytes("UTF-8"))

  /** Full lowercase-hex md5 (thread-local instance). */
  def md5HexJvm(s: String): String = {
    val sb = new java.lang.StringBuilder(32)
    md5Local.get().digest(s.getBytes("UTF-8")).foreach { b =>
      sb.append(Character.forDigit((b >> 4) & 0xf, 16))
      sb.append(Character.forDigit(b & 0xf, 16))
    }
    sb.toString
  }

  /** SQL fragment (DuckDB dialect) equivalent to [[detHash]](col). */
  def duckHashSql(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 8))::BIGINT)"

  /** SQL fragment (DuckDB dialect) equivalent to [[detHash]](col, seed). */
  def duckHashSql(expr: String, seed: Int): String =
    duckHashSql(s"($expr || ':$seed')")

  /** SQL fragment (DuckDB dialect) equivalent to [[detUniform]]. */
  def duckUniformSql(expr: String, seed: Int): String =
    s"(${duckHashSql(expr, seed)} / 4294967296.0)"
}
