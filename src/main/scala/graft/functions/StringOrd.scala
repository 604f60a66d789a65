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
