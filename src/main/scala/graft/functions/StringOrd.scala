package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Order-preserving 64-bit surrogate of a string: its first 8 UTF-8
  * bytes packed big-endian as an unsigned value, sign-flipped into the
  * signed Long domain. For any two strings, UTF-8 byte order (the
  * order Spark's string min/max stats and UnsafeRow comparisons use)
  * is preserved: `a <= b  ⇒  ord64(a) <= ord64(b)` — strings sharing
  * their first 8 bytes collide, which is exactly the tolerance a
  * CLUSTERING key has (a z-order cell holds near neighbors anyway; a
  * total order was never required).
  *
  * This is what makes string columns first-class clustering
  * dimensions: a declared `zorder` layout or `OPTIMIZE ... ZORDER`
  * over (host, timestamp)-shaped pairs scales `ord64(host)` into its
  * 16-bit lane exactly as it would a numeric column. The expression is
  * a native codegen'd scalar (no UDF boundary), and [[StringOrd
  * .ord64Of]] is its bit-twin for driver-side stats scaling and SQL
  * (`graft_ord64`).
  *
  * Reference behavior: the reference has no clustering layouts at all
  * (directory-of-tars, custom_datapipes.py); this extends the
  * engine-side z-order capability to the string dimensions — domain,
  * language, shard prefix — a curation pipeline actually filters by.
  */
case class StringOrd64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  def computeOrd(s: UTF8String): Long =
    StringOrd.ord64OfBytes(s.getBytes)

  override def nullSafeEval(input: Any): Any =
    computeOrd(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stringOrd64", this,
      classOf[StringOrd64].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.computeOrd($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): StringOrd64 = copy(child = newChild)
}

object StringOrd {

  /** Column-API entry point. */
  def ord64(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(StringOrd64(Bridge.expression(c)))
  }

  /** Driver-side bit-twin of the expression (stats scaling, SQL). */
  def ord64Of(s: String): Long = ord64OfBytes(s.getBytes("UTF-8"))

  /** Longest common CHAR prefix of two strings, never ending inside a
    * surrogate pair (a split pair is not a valid UTF-8 sequence to
    * strip). Because every value between two strings in UTF-8 byte
    * order shares their common prefix, stripping THIS prefix from any
    * value in [a, b] is order-preserving — the fix for ord64's
    * first-8-bytes degeneration on URL/domain-shaped columns where
    * every value starts `https://www.`.
    */
  def commonPrefix(a: String, b: String): String = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    if (i > 0 && Character.isHighSurrogate(a.charAt(i - 1))) i -= 1
    a.substring(0, i)
  }

  /** ord64 of the string AFTER `prefix` — the clustering surrogate for
    * common-prefix domains. Positions hand Spark's substr CODE-POINT
    * counts (UTF8String semantics), while the driver twin strips by
    * Java chars; both see the same suffix because `prefix` is
    * surrogate-aligned.
    */
  def ord64After(c: Column, prefix: String): Column =
    if (prefix.isEmpty) ord64(c)
    else ord64(c.substr(
      org.apache.spark.sql.functions.lit(
        prefix.codePointCount(0, prefix.length) + 1),
      org.apache.spark.sql.functions.lit(Int.MaxValue)))

  /** Driver-side bit-twin of [[ord64After]] (stats scaling). */
  def ord64OfAfter(s: String, prefix: String): Long =
    ord64Of(if (s.length >= prefix.length) s.substring(prefix.length) else "")

  private[functions] def ord64OfBytes(b: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (if (i < b.length) b(i) & 0xFFL else 0L)
      i += 1
    }
    // unsigned big-endian order ↔ signed Long order
    v ^ java.lang.Long.MIN_VALUE
  }
}
