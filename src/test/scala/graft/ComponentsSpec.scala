package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DedupFunctions

/** Hybrid connected components: the driver union-find path and the
  * distributed pointer-doubling path must produce identical labels.
  */
class ComponentsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  // chain 1-2-3-4-5, triangle 10-11-12 (+ redundant edge), isolated pair 20-21
  private def edges = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("a", "b")
  }

  private val expected = Map(
    1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
    10L -> 10L, 11L -> 10L, 12L -> 10L,
    20L -> 20L, 21L -> 20L)

  private def labelsOf(limit: Long): Map[Long, Long] =
    DedupFunctions.connectedComponents(edges, "a", "b", driverEdgeLimit = limit)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("driver union-find labels every node with its component minimum") {
    assert(labelsOf(Long.MaxValue) == expected)
  }

  test("distributed doubling loop agrees with the driver path exactly") {
    assert(labelsOf(0L) == expected)
  }

  test("long chain converges in O(log n) rounds (under the 50-round cap)") {
    import spark.implicits._
    // a 400-node path: unit propagation would need ~400 rounds and trip
    // the cap; pointer doubling must finish well inside it
    val chain = (0L until 399L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = DedupFunctions.connectedComponents(chain, "a", "b",
      driverEdgeLimit = 0L).collect()
    assert(labels.forall(_.getLong(1) == 0L))
  }

  test("quality-aware survivor: exactly one per cluster, and it is the argmax") {
    val out = graft.queries.DedupQueries.queries("q9d_cluster_best_survivor")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, rows) =>
      val survivors = rows.filter(_.getAs[Boolean]("survivor"))
      assert(survivors.length == 1, s"cluster $cid: ${survivors.length} survivors")
      val best = rows.map(_.getAs[Double]("quality")).max
      assert(survivors.head.getAs[Double]("quality") == best,
        s"cluster $cid survivor is not the quality argmax")
    }
  }

  test("duplicate-block excision keeps first occurrence, rewrites in order") {
    import spark.implicits._
    // doc 1: blocks [a b] [c d]; doc 2 repeats [c d] then adds [e f];
    // doc 3 repeats its own first block within itself; doc 4 is all
    // boilerplate; doc 5 is empty
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "c d e f"),
      (3L, "g h g h"),
      (4L, "a b c d"),
      (5L, "   ")).toDF("doc_id", "text")
    val out = DedupFunctions.exciseDuplicateBlocks(docs, "doc_id", "text", 2)
      .orderBy($"doc_id")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))).toMap
    assert(out(1L) == ((2L, 2L, "a b c d", 4L)))
    assert(out(2L) == ((2L, 1L, "e f", 2L)))     // [c d] excised
    assert(out(3L) == ((2L, 1L, "g h", 2L)))     // self-repeat excised
    assert(out(4L) == ((2L, 0L, "", 0L)))        // pure boilerplate
    assert(out(5L) == ((0L, 0L, "", 0L)))        // token-less stays total
    // a short tail block is its own unit, not merged into the last full one
    val tail = DedupFunctions.exciseDuplicateBlocks(
      Seq((1L, "a b c"), (2L, "x y c")).toDF("doc_id", "text"), "doc_id", "text", 2)
      .orderBy($"doc_id").collect()
    assert(tail(0).getString(3) == "a b c")
    assert(tail(1).getString(3) == "x y")        // tail [c] excised
  }
}
