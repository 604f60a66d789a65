package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}

/** Compact, broadcast-able EXACT membership structure over a (possibly
  * large) set of text blocks — the production form of a banned-block
  * list for streaming decontamination
  * ([[DedupFunctions.exciseAgainstBlockSet]]).
  *
  * Two tiers, both keyed by the block's 128-bit md5 digest:
  *
  *  1. a Bloom bitmap (~12 bits/entry, k=6 double-hashed probes ⇒
  *     ~0.3% FP) answers the overwhelmingly common "clean block" case
  *     with k cache-local bit tests and no comparison against the set;
  *  2. a sorted packed `Array[Long]` of (hi, lo) digest pairs gives the
  *     EXACT verdict for Bloom hits by binary search — so a Bloom false
  *     positive can never excise a clean block, and the scrub's output
  *     is bit-identical to a literal-set membership test (modulo md5
  *     collision, the engine-wide digest-as-identity convention — see
  *     [[DedupFunctions.exciseDuplicateBlocks]]'s production note).
  *
  * Memory: 16 bytes/entry exact tier + 1.5 bytes/entry Bloom — a
  * 10-million-block banned set is ~175 MB as ONE broadcast value
  * (torrent-distributed once per executor), vs the literal-array form
  * this replaces, which serialized the full block TEXT into every task's
  * plan and scanned it linearly per block. Probe cost: O(k) bit tests
  * for clean blocks, O(log n) long-compares for hits.
  *
  * Reference anchor: the reference scrubs stream samples against
  * driver-shipped constant sets (sdata/custom_datapipes.py `SimpleKeyFilter`
  * and filter lists); this is that discipline at banned-set sizes where a
  * literal set stops being shippable.
  */
final class BlockDigestSet private (
    packed: Array[Long], // 2n longs: (hi, lo) pairs sorted by (hi, lo)
    bloomBits: Array[Long],
    bloomK: Int) extends Serializable {

  def size: Int = packed.length / 2

  @inline private def bloomMight(hi: Long, lo: Long): Boolean = {
    val m = bloomBits.length.toLong * 64L
    var i = 0
    while (i < bloomK) {
      // Kirsch–Mitzenmacher double hashing over the two digest halves
      val b = (((hi + i.toLong * lo) & Long.MaxValue) % m).toInt
      if ((bloomBits(b >> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  private def exact(hi: Long, lo: Long): Boolean = {
    var l = 0
    var r = size - 1
    while (l <= r) {
      val mid = (l + r) >>> 1
      val mh = packed(2 * mid); val ml = packed(2 * mid + 1)
      val c = if (mh != hi) java.lang.Long.compare(mh, hi)
              else java.lang.Long.compare(ml, lo)
      if (c == 0) return true
      else if (c < 0) l = mid + 1
      else r = mid - 1
    }
    false
  }

  /** Exact membership of a block string (Bloom fast-reject, then
    * binary-search verify).
    */
  def contains(block: String): Boolean = {
    if (packed.length == 0) return false
    val (hi, lo) = BlockDigestSet.digestPair(block)
    bloomMight(hi, lo) && exact(hi, lo)
  }
}

object BlockDigestSet {

  /** Both md5 halves of a block string, big-endian. */
  def digestPair(s: String): (Long, Long) = {
    val d = PortableHash.md5BytesJvm(s)
    var hi = 0L; var lo = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (d(i) & 0xffL); i += 1 }
    while (i < 16) { lo = (lo << 8) | (d(i) & 0xffL); i += 1 }
    (hi, lo)
  }

  private def fromPairs(pairs: Array[(Long, Long)]): BlockDigestSet = {
    val sorted = pairs.sortWith { case ((ah, al), (bh, bl)) =>
      if (ah != bh) ah < bh else al < bl
    }
    // dedup adjacent (the elected set is distinct, but be total)
    val packed = new scala.collection.mutable.ArrayBuffer[Long](sorted.length * 2)
    var i = 0
    while (i < sorted.length) {
      if (i == 0 || sorted(i) != sorted(i - 1)) {
        packed += sorted(i)._1; packed += sorted(i)._2
      }
      i += 1
    }
    val n = packed.length / 2
    val mBits = math.max(64L, ((n.toLong * 12L + 63L) / 64L) * 64L)
    val bits = new Array[Long]((mBits / 64L).toInt)
    val k = 6
    var j = 0
    while (j < packed.length) {
      val hi = packed(j); val lo = packed(j + 1)
      var h = 0
      while (h < k) {
        val b = (((hi + h.toLong * lo) & Long.MaxValue) % mBits).toInt
        bits(b >> 6) |= 1L << (b & 63)
        h += 1
      }
      j += 2
    }
    new BlockDigestSet(packed.toArray, bits, k)
  }

  /** Driver-local construction from an in-memory block list (tests /
    * small hand sets).
    */
  def fromStrings(blocks: Iterable[String]): BlockDigestSet =
    fromPairs(blocks.iterator.map(digestPair).toArray)

  /** Distributed construction: digests are computed on the EXECUTORS
    * (one mapPartitions over the banned frame), so only 16-byte pairs —
    * never block text — cross to the driver. The driver's peak is the
    * packed digest array it is building anyway.
    */
  def fromFrame(banned: DataFrame, blockCol: String): BlockDigestSet = {
    val s = banned.sparkSession
    import s.implicits._
    val pairs: Dataset[(Long, Long)] = banned
      .select(org.apache.spark.sql.functions.col(blockCol).cast("string"))
      .as[String]
      .mapPartitions(_.map(digestPair))
    fromPairs(pairs.collect())
  }
}
