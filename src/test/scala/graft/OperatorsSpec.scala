package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Unit coverage for the mapper/filter/sampling framework semantics
  * (url-exclusion guards, strict policies, determinism).
  */
class OperatorsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import org.apache.spark.sql.Row

  private def df = {
    import spark.implicits._
    Seq(
      (1L, "tar://a/good", Some(300L), 300L, "hello"),
      (2L, "tar://b/excluded", Some(100L), 100L, "world"),
      (3L, "tar://a/good", None, 250L, "null-height"),
      (4L, "tar://c/other", Some(199L), 500L, "small-h")
    ).toDF("id", "__url__", "height", "width", "txt")
  }

  test("curation filters agree with their gate queries on the corpus") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // quality filter ≡ q22's keep set
    val viaFilter = graft.pipeline.OperatorRegistry
      .filter("text_quality_filter", Map("key" -> "text"))(docs)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val viaGate = SparkEntry.queries("q22_quality_score")(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(viaFilter == viaGate)
    // lang filter ≡ q21's en predictions
    val enFilter = graft.pipeline.OperatorRegistry
      .filter("lang_filter", Map("key" -> "text", "lang" -> "en"))(docs)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val enGate = SparkEntry.queries("q21_lang_id")(spark, sf)
      .filter(col("lang_pred") === "en")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(enFilter == enGate)
    // gopher rules ≡ q96's rule-keep set
    val gFilter = graft.pipeline.OperatorRegistry
      .filter("gopher_rules_filter", Map("key" -> "text"))(docs)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val gGate = SparkEntry.queries("q96_gopher_rules")(spark, sf)
      .filter(col("keep"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(gFilter == gGate)
  }

  test("SimpleKeyFilter: missing schema column drops everything") {
    assert(SimpleKeyFilter(Seq("height"))(df).count() == 3)
    assert(SimpleKeyFilter(Seq("no_such_col"))(df).count() == 0)
  }

  test("SimpleSizeFilter min-mode with strict and per-url policy") {
    // strict: null height drops
    assert(SimpleSizeFilter(200, 200)(df).select("id").collect().map(_.getLong(0)).toSet == Set(1L))
    // lenient: null height keeps
    assert(SimpleSizeFilter(200, 200, strict = false)(df)
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // per-url: urls containing "a/" keep on missing metadata
    assert(SimpleSizeFilter(200, 200, strict = true, strictPerUrl = Map("a/" -> false))(df)
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // max mode
    assert(SimpleSizeFilter(200, 200, mode = SizeFilterMode.Max)(df)
      .select("id").collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("filter url-exclusion bypasses the predicate") {
    val f = LambdaFilter(Seq("height"), c => c > 250, excludeKeys = Seq("excluded"))
    // id2 fails height>250 but its url is excluded ⇒ kept
    assert(f(df).select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("mapper url-exclusion preserves original values") {
    val m = LambdaMapper(Seq("txt"), upper, excludeKeys = Seq("excluded"))
    val out = m(df).select("id", "txt").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "HELLO")
    assert(out(2L) == "world") // untouched
  }

  test("CropToSquare is deterministic and within bounds") {
    val d = df.filter(col("height").isNotNull)
    val out1 = CropToSquare(idKey = "id", seed = 42)(d)
      .select("id", "crop_size", "crop_coords_top_left").collect()
    val out2 = CropToSquare(idKey = "id", seed = 42)(d)
      .select("id", "crop_size", "crop_coords_top_left").collect()
    assert(out1.map(_.toString).toSeq == out2.map(_.toString).toSeq)
    out1.foreach { r =>
      val size = r.getLong(1)
      val Seq(top, left) = r.getSeq[Long](2)
      assert(top >= 0 && left >= 0)
    }
    // different seed ⇒ different coords somewhere (high probability)
    val out3 = CropToSquare(idKey = "id", seed = 43)(d)
      .select("crop_coords_top_left").collect().map(_.toString).toSeq
    assert(out3 != out1.map(r => Row(r.get(2)).toString).toSeq)
  }

  test("EinopsRearrange transposes a flat grid") {
    import spark.implicits._
    val d = Seq((1L, (0 until 6).map(_.toDouble).toArray)).toDF("id", "v")
    val out = EinopsRearrange("v", "h w -> w h", Map("h" -> 2, "w" -> 3))(d)
      .select("v").collect().head.getSeq[Double](0)
    // [[0,1,2],[3,4,5]] transposed → [[0,3],[1,4],[2,5]]
    assert(out == Seq(0.0, 3.0, 1.0, 4.0, 2.0, 5.0))
    intercept[IllegalArgumentException](
      EinopsRearrange("v", "h w -> h c", Map("h" -> 2, "w" -> 3)))
  }

  test("prefixMixture draws normalized per-prefix counts deterministically") {
    import spark.implicits._
    val d = (0 until 300).map(i => (i.toLong, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "p")
    val out = Sampling.prefixMixture(d, "p", "id", Map("a" -> 1.0, "b" -> 1.0), total = 100, seed = 1)
    val counts = out.groupBy("p").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 50L, "b" -> 50L)) // c excluded, 50/50 split
    val again = Sampling.prefixMixture(d, "p", "id", Map("a" -> 1.0, "b" -> 1.0), total = 100, seed = 1)
    assert(out.collect().map(_.toString).sorted.toSeq == again.collect().map(_.toString).sorted.toSeq)
  }

  test("hashSample fraction lands near expectation and is replayable") {
    import spark.implicits._
    val d = (0 until 2000).map(_.toLong).toDF("id")
    val s1 = Sampling.hashSample(d, "id", 0.25, seed = 7).count()
    val s2 = Sampling.hashSample(d, "id", 0.25, seed = 7).count()
    assert(s1 == s2)
    assert(math.abs(s1 - 500L) < 100)
  }

  test("asOf direction + tolerance on a numeric time axis (hand-computed)") {
    import spark.implicits._
    // key k: right rows at t = 10, 20; left rows at t = 5, 12, 20, 40
    val left = Seq(("k", 5L, "l5"), ("k", 12L, "l12"),
      ("k", 20L, "l20"), ("k", 40L, "l40")).toDF("key", "t", "tag")
    val right = Seq(("k", 10L, "r10"), ("k", 20L, "r20"))
      .toDF("key", "t", "rtag")
    def run(dir: String, tol: Option[Long]) =
      AsOfJoin.asOf(left, right, Seq("key"), "t", "t", Seq("rtag"),
        direction = dir, toleranceMs = tol)
        .select($"tag", $"asof_rtag").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    // backward: latest right <= t (inclusive at 20)
    assert(run("backward", None) == Map(
      "l5" -> None, "l12" -> Some("r10"), "l20" -> Some("r20"), "l40" -> Some("r20")))
    // backward, tolerance 5: l40's match (gap 20) nulls out
    assert(run("backward", Some(5L)) == Map(
      "l5" -> None, "l12" -> Some("r10"), "l20" -> Some("r20"), "l40" -> None))
    // forward: earliest right >= t (inclusive at 20)
    assert(run("forward", None) == Map(
      "l5" -> Some("r10"), "l12" -> Some("r20"), "l20" -> Some("r20"), "l40" -> None))
    // forward, tolerance 5: l5 (gap 5) stays, l12 (gap 8) nulls out
    assert(run("forward", Some(5L)) == Map(
      "l5" -> Some("r10"), "l12" -> None, "l20" -> Some("r20"), "l40" -> None))
  }
}
