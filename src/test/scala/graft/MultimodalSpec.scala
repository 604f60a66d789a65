package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.ErrorPolicy
import graft.functions.Multimodal
import graft.operators._
import graft.sources.DummySource

/** Multimodal plumbing, image transform chain, dummy source, and the
  * timeout wrapper.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def media = {
    import spark.implicits._
    val d = Seq(
      (1L, "payload-one", 100, 40),
      (2L, "payload-two-bigger", 300, 200),
      (3L, null.asInstanceOf[String], 64, 64)
    ).toDF("id", "raw", "w", "h")
    Multimodal.withMedia(d, col("raw"), col("w"), col("h"), lit(3), lit(10))
      .withColumn("media", when(col("raw").isNull, lit(null)).otherwise(col("media")))
  }

  test("ImageTransforms strict drops null-media samples (None-drop parity)") {
    val t = ImageTransforms(Seq(ResizeOp(128), CenterCropOp(64)))
    val out = t(media).select("id", "media.width", "media.height").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.map(_._1).toSet == Set(1L, 2L)) // id 3 dropped
    // id1: 100x40 fits 128 → crop to ≤64: 64x40; id2: 300x200 → resize
    // long side to 128 (128x85) → crop 64x64
    val m = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(1L) == ((64, 40)))
    assert(m(2L) == ((64, 64)))
  }

  test("ImageTransforms lenient passes null media through") {
    val t = ImageTransforms(Seq(ResizeOp(128)), strict = false)
    val out = t(media)
    assert(out.count() == 3)
    assert(out.filter(col("media").isNull).count() == 1)
  }

  test("decodePartitioned: one codec per partition, null propagation") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val df = media.repartition(2)
    val out = Multimodal.decodePartitioned[java.security.MessageDigest](
      df, "payload",
      mkCodec = () => java.security.MessageDigest.getInstance("MD5"),
      decode = (md, bytes) => md.digest(bytes).take(4).map(b => (b & 0xff).toDouble))
    val rows = out.select("id", "features").collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Double](1))).toMap
    assert(rows(1L).isDefined && rows(1L).get.length == 4)
    assert(rows(3L).isEmpty) // null payload → null features
  }

  test("DummySource repeats the first sample n times") {
    import spark.implicits._
    val sample = Seq((7L, "x"), (8L, "y")).toDF("k", "v").orderBy("k")
    val out = DummySource.createDummyDataset(sample, 5)
    assert(out.count() == 5)
    assert(out.select("k").distinct().collect().map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("timeout wrapper raises on slow calls, passes fast ones") {
    val slow = ErrorPolicy.withTimeout((_: String) => { Thread.sleep(2000); "late" }, 200)
    intercept[RuntimeException](slow("x"))
    val fast = ErrorPolicy.withTimeout((s: String) => s.toUpperCase, 1000)
    assert(fast("ok") == "OK")
  }
}
