package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ShardExpand, ShardListing}

/** Property-based coverage for the pure listing layer (SURVEY.md §5.2):
  * brace expansion, key/extension derivation, meta-path round-trips.
  */
class ShardExpandSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val r = org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, prop)
    assert(r.passed, r.status.toString)
  }

  private val width = Gen.choose(1, 7)
  private val loHi = for {
    w <- width
    max = math.min(math.pow(10, w.toDouble).toLong - 1, 5000L)
    lo <- Gen.choose(0L, max)
    hi <- Gen.choose(lo, max)
  } yield (w, lo, hi)

  test("expansion length and padding invariants") {
    check(Prop.forAll(loHi) { case (w, lo, hi) =>
      val pat = s"ds-{%0${w}d..%0${w}d}.tar".format(lo, hi)
      val out = ShardExpand.expand(pat)
      out.length == (hi - lo + 1) &&
        out.head == s"ds-%0${w}d.tar".format(lo) &&
        out.last == s"ds-%0${w}d.tar".format(hi) &&
        out.forall(p => p.startsWith("ds-") && p.endsWith(".tar")) &&
        out.distinct.length == out.length
    })
  }

  test("sample key / extension round-trip") {
    val stem = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(19))
    val ext = Gen.oneOf("jpg", "json", "txt", "seg.png", "cls")
    check(Prop.forAll(stem, ext) { (s, e) =>
      val path = s"dir/sub/$s.$e"
      ShardExpand.sampleKey(path) == s && ShardExpand.memberExtension(path) == e
    })
  }

  test("meta path derivation round-trips through refKey") {
    val shard = "/data/ds/shard-0042.tar"
    val metaPath = ShardListing.metaShardPath(shard, "meta")
    assert(metaPath == "/data/ds_meta/shard-0042_meta.tar")
    assert(ShardExpand.refKey(metaPath, "meta") == "/data/ds_meta/shard-0042")
    assert(ShardListing.semiFilterByMeta(Seq(shard), Seq(metaPath), "meta") == Seq(shard))
    assert(ShardListing.semiFilterByMeta(
      Seq(shard, "/data/ds/shard-0043.tar"), Seq(metaPath), "meta") == Seq(shard))
  }

  test("expandAll passes plain urls through") {
    assert(ShardExpand.expandAll(Seq("/a/b.tar", "x-{00..01}.tar")) ==
      Seq("/a/b.tar", "x-00.tar", "x-01.tar"))
  }
}
