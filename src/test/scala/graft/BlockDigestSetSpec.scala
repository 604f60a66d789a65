package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BlockDigestSet, DedupFunctions}

/** The broadcast banned-block membership model: exactness at a set size
  * (1e5) that would have broken the literal-array plan it replaced, and
  * end-to-end excision equivalence through the digest path.
  */
class BlockDigestSetSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("exact membership at 100k entries — every member hits, every non-member misses") {
    val members = (0 until 100000).map(i => s"member block $i with payload ${i * 7}")
    val set = BlockDigestSet.fromStrings(members)
    assert(set.size == 100000)
    // all members present (bloom can't produce a false NEGATIVE, and
    // the exact tier confirms)
    assert(members.forall(set.contains))
    // non-members always rejected: the exact tier catches every bloom
    // false positive, so the verdict is exact, not probabilistic
    val nonMembers = (0 until 100000).map(i => s"absent block $i with payload ${i * 7}")
    assert(!nonMembers.exists(set.contains))
  }

  test("duplicate inputs collapse; empty set rejects everything") {
    val set = BlockDigestSet.fromStrings(Seq("a", "b", "a", "b", "a"))
    assert(set.size == 2)
    assert(set.contains("a") && set.contains("b") && !set.contains("c"))
    val empty = BlockDigestSet.fromStrings(Nil)
    assert(empty.size == 0 && !empty.contains("anything"))
  }

  test("fromFrame builds the same set as fromStrings (digests computed on executors)") {
    import spark.implicits._
    val blocks = (0 until 5000).map(i => s"frame block $i")
    val viaFrame = BlockDigestSet.fromFrame(blocks.toDF("block"), "block")
    assert(viaFrame.size == 5000)
    assert(blocks.forall(viaFrame.contains))
    assert(!viaFrame.contains("frame block 5000"))
  }

  test("excision through a 100k-entry digest set equals literal-set semantics") {
    import spark.implicits._
    // a large banned set containing two blocks that actually occur
    val noise = (0 until 100000).map(i => s"noise entry $i never occurs")
    val banned = noise ++ Seq("c d", "g h")
    val docs = Seq(
      (1L, "a b c d e f g h"), // blocks (bt=2): "a b","c d","e f","g h"
      (2L, "c d c d"),         // only banned blocks -> empty
      (3L, "x y z w")          // untouched
    ).toDF("doc_id", "text")
    val out = DedupFunctions
      .exciseAgainstBlockSet(docs, "doc_id", "text", 2, banned)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 4L, 2L, "a b e f"),
      (2L, 2L, 0L, ""),
      (3L, 2L, 2L, "x y z w")))
  }
}
