package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable bounded-memory quantile sketch (per-group), the
  * `TypedImperativeAggregate` pattern: each group carries a weighted
  * item buffer of at most ~2×`capacity` entries; partial aggregates
  * merge associatively by buffer concatenation; over-full buffers
  * compact by pair-coalescing adjacent sorted items (KLL-style level
  * compaction, but with DETERMINISTIC alternating survivor choice
  * instead of a random coin).
  *
  * Determinism contract: in the EXACT regime (≤ 2×capacity values per
  * group — the oracle-checked gate regime) no compaction happens and the
  * result is identical on every run. In the compaction regime every
  * individual compaction and every phase-state merge is deterministic
  * and merge-order-insensitive (see [[merge]]), but Spark feeds final
  * aggregation in shuffle-fetch order, so WHICH intermediate merges
  * cross the compaction threshold can differ run-to-run: results are
  * replayable under task retry and stay within the KLL rank-error
  * envelope, but are not guaranteed bit-identical across full re-runs.
  *
  * Accuracy contract:
  *  - while a group holds ≤ 2×capacity values, NO compaction happens and
  *    quantiles are EXACT — bit-equal to DuckDB's `quantile_cont`
  *    (same rank definition: h = p·(W−1), linear interpolation);
  *  - beyond that, each compaction halves the buffer and adds ≤ 1 rank
  *    of error per surviving item per level: rank error is
  *    O((n/capacity)·log(n/capacity)), the KLL envelope with a
  *    deterministic-bias constant.
  *
  * Scale design: the buffer is O(capacity) per group regardless of group
  * size — 100× more rows per group costs compaction passes, not memory;
  * partial (map-side) aggregation works because merge is
  * concatenate-then-maybe-compact; no sort or shuffle beyond the one
  * hash exchange any groupBy pays. This is the sketch family
  * (t-digest/KLL/GK) production engines ship for per-group percentiles
  * where q16's exact two-pass selection would need a pass per
  * percentile set.
  */
final class QSketch(val capacity: Int) extends Serializable {
  private var vals = new Array[Double](64)
  private var wts = new Array[Long](64)
  private var n = 0
  private var sorted = true
  // per-weight-class compaction phase (the deterministic coin): each
  // compaction of class w flips its phase, so consecutive compactions
  // keep opposite pair members and their rank biases telescope — the
  // standard derandomized-KLL compactor schedule.
  private val phases = scala.collection.mutable.LongMap.empty[Long]

  def isEmpty: Boolean = n == 0
  def size: Int = n
  def totalWeight: Long = { var w = 0L; var i = 0; while (i < n) { w += wts(i); i += 1 }; w }

  private def ensure(extra: Int): Unit =
    if (n + extra > vals.length) {
      val cap = math.max(vals.length * 2, n + extra)
      vals = java.util.Arrays.copyOf(vals, cap)
      wts = java.util.Arrays.copyOf(wts, cap)
    }

  def add(v: Double): Unit = {
    ensure(1)
    vals(n) = v; wts(n) = 1L; n += 1; sorted = false
    if (n > 2 * capacity) compact()
  }

  /** Raw weighted append (deserialization path — the serialized buffer
    * was already within bounds, so no compaction check).
    */
  private[plans] def addWeighted(v: Double, w: Long): Unit = {
    ensure(1)
    vals(n) = v; wts(n) = w; n += 1; sorted = false
  }

  def merge(o: QSketch): QSketch = {
    ensure(o.n)
    System.arraycopy(o.vals, 0, vals, n, o.n)
    System.arraycopy(o.wts, 0, wts, n, o.n)
    n += o.n; sorted = false
    // combine the two compaction-phase histories ORDER-INSENSITIVELY:
    // XOR is each class's total compaction count mod 2 across both
    // branches, the same bit either merge order produces — discarding
    // the other side's phases would silently reset its schedule and
    // break the telescoping-bias invariant across shipped partials
    o.phases.foreach { case (w, p) =>
      phases.update(w, phases.getOrElse(w, 0L) ^ p)
    }
    if (n > 2 * capacity) compact()
    this
  }

  private def sortItems(): Unit = if (!sorted) {
    val idx = Array.range(0, n).sortBy(vals(_))
    val nv = new Array[Double](vals.length); val nw = new Array[Long](wts.length)
    var i = 0
    while (i < n) { nv(i) = vals(idx(i)); nw(i) = wts(idx(i)); i += 1 }
    vals = nv; wts = nw; sorted = true
  }

  /** Shrink the buffer to ≤ capacity by KLL-style level compaction in
    * flat form: weights are the levels (1, 2, 4, …), and each pass
    * pair-coalesces, in value order, only the SMALLEST weight class with
    * ≥ 2 members — so an item of weight w is only ever merged with a
    * same-weight neighbor, the invariant that gives the KLL error
    * envelope (merging across weight classes is what made the naive
    * halve-everything scheme drift). Each pass keeps one member of every
    * adjacent same-class pair — which member is the class's phase bit,
    * flipped on every compaction of that class, so consecutive
    * compactions bias opposite directions and telescope (the
    * derandomized-KLL compactor schedule; replays identically under
    * task retry). Dropping one member of a sorted pair keeps the array
    * value-sorted.
    */
  private def compact(): Unit = {
    sortItems()
    while (n > capacity) {
      var target = Long.MaxValue
      var i = 0
      // smallest weight that appears at least twice
      val seen = scala.collection.mutable.LongMap.empty[Int]
      while (i < n) {
        val c = seen.getOrElse(wts(i), 0) + 1
        seen.update(wts(i), c)
        if (c >= 2 && wts(i) < target) target = wts(i)
        i += 1
      }
      if (target == Long.MaxValue) return // nothing mergeable
      val phase = phases.getOrElse(target, 0L)
      phases.update(target, phase ^ 1L)
      val drop = new Array[Boolean](n)
      var pending = -1
      i = 0
      while (i < n) {
        if (wts(i) == target) {
          if (pending < 0) pending = i
          else {
            val surv = if (phase == 0L) pending else i
            val gone = if (phase == 0L) i else pending
            wts(surv) = target * 2L
            drop(gone) = true
            pending = -1
          }
        }
        i += 1
      }
      var out = 0
      i = 0
      while (i < n) {
        if (!drop(i)) { vals(out) = vals(i); wts(out) = wts(i); out += 1 }
        i += 1
      }
      if (out == n) return
      n = out
    }
  }

  /** Weighted quantile with `quantile_cont` semantics: over the expanded
    * multiset (item i repeated weight_i times), rank h = p·(W−1), linear
    * interpolation between the floor(h)-th and (floor(h)+1)-th values.
    * Exact (DuckDB-bit-equal) when all weights are 1.
    */
  def quantile(p: Double): Double = {
    require(n > 0, "quantile of empty sketch")
    sortItems()
    val w = totalWeight
    val h = p * (w - 1)
    val lo = math.floor(h).toLong
    val frac = h - lo
    val vLo = valueAtRank(lo)
    if (frac == 0.0) vLo
    else vLo + frac * (valueAtRank(math.min(lo + 1, w - 1)) - vLo)
  }

  private def valueAtRank(r: Long): Double = {
    var cum = 0L
    var i = 0
    while (i < n) {
      cum += wts(i)
      if (r < cum) return vals(i)
      i += 1
    }
    vals(n - 1)
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(capacity); out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(vals(i)); out.writeLong(wts(i)); i += 1 }
    // phase bits travel with the buffer so a shipped partial keeps the
    // same compaction schedule it would have had locally
    out.writeInt(phases.size)
    phases.foreach { case (w, p) => out.writeLong(w); out.writeLong(p) }
    out.flush(); bos.toByteArray
  }

  private[plans] def setPhase(w: Long, p: Long): Unit = phases.update(w, p)
}

object QSketch {
  def deserialize(bytes: Array[Byte]): QSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new QSketch(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val v = in.readDouble(); val w = in.readLong()
      s.addWeighted(v, w)
      i += 1
    }
    val np = in.readInt()
    i = 0
    while (i < np) { s.setPhase(in.readLong(), in.readLong()); i += 1 }
    s
  }
}

/** The Catalyst aggregate function wrapping [[QSketch]]. Returns
  * `array<double>` — one quantile per requested probability.
  */
case class QuantileSketchAgg(
    child: Expression,
    probs: Seq[Double],
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketch] with UnaryLike[Expression] {

  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    "probabilities must be in [0, 1]")
  require(capacity >= 16, "capacity too small to be meaningful")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "quantile_sketch"

  override def createAggregationBuffer(): QSketch = new QSketch(capacity)

  override def update(buffer: QSketch, input: InternalRow): QSketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Number].doubleValue())
    buffer
  }

  override def merge(buffer: QSketch, other: QSketch): QSketch = buffer.merge(other)

  override def eval(buffer: QSketch): Any =
    if (buffer.isEmpty) null
    else new GenericArrayData(probs.map(buffer.quantile).toArray)

  override def serialize(buffer: QSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): QSketch = QSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
}

object QuantileSketch {

  /** Column-API entry point: per-group quantiles of `c` at `probs`,
    * O(capacity) state per group. Exact while the group holds at most
    * 2×capacity values (the regime the DuckDB oracle checks); bounded
    * rank error beyond.
    */
  def quantiles(c: Column, probs: Seq[Double], capacity: Int = 4096): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(
      QuantileSketchAgg(Bridge.expression(c.cast("double")), probs, capacity)
        .toAggregateExpression())
  }
}
