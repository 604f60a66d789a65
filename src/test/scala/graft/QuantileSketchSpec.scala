package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{QSketch, QuantileSketch}

/** The mergeable per-group quantile sketch: exactness below capacity,
  * merge associativity, deterministic bounded error under compaction,
  * and the Spark partial-aggregation path.
  */
class QuantileSketchSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  /** quantile_cont reference on raw data (same rank definition). */
  private def exactQ(sorted: IndexedSeq[Double], p: Double): Double = {
    val h = p * (sorted.length - 1)
    val lo = math.floor(h).toInt
    val frac = h - lo
    if (frac == 0.0) sorted(lo)
    else sorted(lo) + frac * (sorted(math.min(lo + 1, sorted.length - 1)) - sorted(lo))
  }

  /** Deterministic pseudo-random doubles. */
  private def data(n: Int, seed: Int): IndexedSeq[Double] =
    (0 until n).map(i =>
      graft.functions.PortableHash.detHashJvm(s"$seed:$i") / 4294967296.0 * 1000.0)

  private val probs = Seq(0.25, 0.5, 0.75, 0.95)

  test("exact below 2x capacity, for every merge shape") {
    val xs = data(5000, 1)
    val sorted = xs.sorted
    // single sketch
    val one = new QSketch(4096)
    xs.foreach(one.add)
    // 4-way splits merged in two different association orders
    val chunks = xs.grouped(1250).toIndexedSeq.map { c =>
      val s = new QSketch(4096); c.foreach(s.add); s
    }
    def fresh(i: Int) = { val s = new QSketch(4096); xs.slice(i * 1250, (i + 1) * 1250).foreach(s.add); s }
    val leftFold = fresh(0).merge(fresh(1)).merge(fresh(2)).merge(fresh(3))
    val pairWise = fresh(0).merge(fresh(1)).merge(fresh(2).merge(fresh(3)))
    for (p <- probs) {
      val want = exactQ(sorted, p)
      assert(one.quantile(p) == want, s"single p=$p")
      assert(leftFold.quantile(p) == want, s"leftFold p=$p")
      assert(pairWise.quantile(p) == want, s"pairWise p=$p")
    }
    assert(chunks.map(_.size).sum == 5000)
  }

  test("serialization round-trips the buffer exactly") {
    val s = new QSketch(64)
    data(1000, 2).foreach(s.add) // forces compaction (weights > 1)
    val back = graft.plans.QSketch.deserialize(s.serialize())
    for (p <- probs) assert(back.quantile(p) == s.quantile(p))
    assert(back.totalWeight == s.totalWeight && back.size == s.size)
  }

  test("compaction keeps rank error bounded and deterministic") {
    val n = 100000
    val xs = data(n, 3)
    val sorted = xs.sorted
    val cap = 256
    val s1 = new QSketch(cap); xs.foreach(s1.add)
    val s2 = new QSketch(cap); xs.foreach(s2.add)
    for (p <- probs) {
      // deterministic: two identical builds answer identically
      assert(s1.quantile(p) == s2.quantile(p))
      // rank of the estimate within 2% of the target rank (KLL envelope
      // for n/cap ≈ 390 is far tighter; 2% leaves determinism headroom)
      val est = s1.quantile(p)
      val rank = sorted.count(_ <= est).toDouble
      assert(math.abs(rank / n - p) < 0.02, s"p=$p est=$est rank=${rank / n}")
    }
    // total weight is conserved through every compaction
    assert(s1.totalWeight == n)
  }

  test("merge carries compaction-phase state and is order-insensitive") {
    // drive both inputs past compaction so each arrives with non-trivial
    // phase history; a merge that discarded the other side's phases (or
    // depended on merge order) diverges between AB and BA
    val cap = 64
    def mk(seed: Int) = { val s = new QSketch(cap); data(2000, seed).foreach(s.add); s }
    val ab = mk(10).merge(mk(11))
    val ba = mk(11).merge(mk(10))
    for (p <- probs)
      assert(ab.quantile(p) == ba.quantile(p), s"merge must commute at p=$p")
    assert(ab.totalWeight == ba.totalWeight)
    // and a shipped partial (serialize → deserialize) merges identically
    val viaWire = graft.plans.QSketch.deserialize(mk(10).serialize()).merge(mk(11))
    for (p <- probs) assert(viaWire.quantile(p) == ab.quantile(p))
  }

  test("Spark partial aggregation (32 partitions) equals the exact quantiles") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val xs = data(6000, 4)
    val sorted = xs.sorted
    val df = xs.toDF("v").repartition(32)
    val got = df.agg(QuantileSketch.quantiles(col("v"), probs).as("qs"))
      .select(posexplode(col("qs")))
      .collect().map(r => r.getDouble(1))
    for ((p, i) <- probs.zipWithIndex)
      assert(got(i) == exactQ(sorted, p), s"p=$p")
  }

  test("grouped aggregation: per-group buffers are independent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = (0 until 3000).map(i => (i % 3, data(1, i).head))
    val byG = rows.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted.toIndexedSeq }
    val got = rows.toDF("g", "v").repartition(16)
      .groupBy($"g")
      .agg(QuantileSketch.quantiles(col("v"), Seq(0.5)).as("qs"))
      .select($"g", element_at($"qs", 1).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for ((g, vs) <- byG) assert(got(g) == exactQ(vs, 0.5), s"group $g")
  }
}
