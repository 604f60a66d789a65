package graft.sources.wdstar

import org.apache.spark.sql.sources._

/** Evaluates pushed-down V2 filters against the two string columns the
  * wds-tar source can act on BEFORE any IO:
  *
  *  - `__url__` predicates prune the shard list at planning time — a
  *    filtered-out tar never becomes an InputPartition and is never
  *    opened. At 100 TB this is the partition-pruning dual: date- or
  *    source-encoded shard paths make `url like 'web-2024%'` skip
  *    whole datasets.
  *  - `__key__` predicates skip sample ASSEMBLY inside the reader — a
  *    non-matching stem's members stream past without a single payload
  *    byte being buffered (tars can't seek, so bytes still flow, but
  *    nothing allocates and no row materializes).
  *
  * Pushdown here is advisory (the parquet pattern): Spark re-applies
  * every filter post-scan, so a predicate shape we mis-handle can cost
  * performance, never correctness.
  */
object ShardFilters {

  /** Is `f` a shape we can evaluate against a plain string value of
    * `col` (and referencing no other column)?
    */
  def supported(f: Filter, col: String): Boolean = f match {
    case EqualTo(a, _: String) => a == col
    case In(a, vs) => a == col && vs != null && vs.forall(_.isInstanceOf[String])
    case StringStartsWith(a, _) => a == col
    case StringEndsWith(a, _) => a == col
    case StringContains(a, _) => a == col
    case GreaterThan(a, _: String) => a == col
    case GreaterThanOrEqual(a, _: String) => a == col
    case LessThan(a, _: String) => a == col
    case LessThanOrEqual(a, _: String) => a == col
    case And(l, r) => supported(l, col) && supported(r, col)
    case Or(l, r) => supported(l, col) && supported(r, col)
    case Not(c) => supported(c, col)
    case _ => false
  }

  /** Unsigned UTF-8 byte comparison — Spark's string ordering
    * (UTF8String compares UTF-8 bytes, not UTF-16 chars: the two orders
    * disagree on supplementary-plane characters, and pruning must never
    * drop a row Spark's own re-applied residual filter would keep).
    */
  private def utf8Cmp(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Evaluate a [[supported]] filter against the value. */
  def eval(f: Filter, v: String): Boolean = f match {
    case EqualTo(_, x: String) => v == x
    case In(_, vs) => vs.exists(x => x.asInstanceOf[String] == v)
    case StringStartsWith(_, p) => v.startsWith(p)
    case StringEndsWith(_, s) => v.endsWith(s)
    case StringContains(_, s) => v.contains(s)
    case GreaterThan(_, x: String) => utf8Cmp(v, x) > 0
    case GreaterThanOrEqual(_, x: String) => utf8Cmp(v, x) >= 0
    case LessThan(_, x: String) => utf8Cmp(v, x) < 0
    case LessThanOrEqual(_, x: String) => utf8Cmp(v, x) <= 0
    case And(l, r) => eval(l, v) && eval(r, v)
    case Or(l, r) => eval(l, v) || eval(r, v)
    case Not(c) => !eval(c, v)
    case other => throw new IllegalStateException(s"unsupported filter $other")
  }
}
