package graft

import java.io.FileOutputStream
import java.nio.file.{Files, Paths}

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._

/** YAML config parity: the reference's example.yaml shape
  * (examples/configs/example.yaml) must build the same pipeline the
  * JSON config path builds.
  */
class YamlConfigSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def png8x4(colorAt: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8) img.setRGB(x, y, colorAt(x, y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  // left-red/right-blue (binary pixels, for the flip/normalize checks)
  private val redBlue: (Int, Int) => Int = (x, _) => if (x < 4) 0xff0000 else 0x0000ff
  // horizontal gray gradient (for interpolation-kernel distinctions —
  // on binary images clamped bicubic collapses onto nearest)
  private val gradient: (Int, Int) => Int = (x, _) => { val g = x * 36; (g << 16) | (g << 8) | g }

  private val dir = {
    val d = Paths.get("target", "yaml-fixtures-" + System.nanoTime()).toAbsolutePath
    for ((sub, colorAt) <- Seq("imgs" -> redBlue, "grad" -> gradient)) {
      Files.createDirectories(d.resolve(sub))
      val out = new TarArchiveOutputStream(
        new FileOutputStream(d.resolve(s"$sub/shard-00.tar").toFile))
      val bytes = png8x4(colorAt)
      val e = new TarArchiveEntry("im1.png")
      e.setSize(bytes.length.toLong)
      out.putArchiveEntry(e); out.write(bytes); out.closeArchiveEntry()
      out.close()
    }
    d
  }

  test("pipeline_config.meta_join: zip drives the zero-shuffle zip join from YAML") {
    val zd = dir.resolve("zipcfg")
    Files.createDirectories(zd)
    Files.createDirectories(Paths.get(zd.toString + "_meta"))
    def tar(path: java.nio.file.Path, members: Seq[(String, String)]): Unit = {
      val out = new TarArchiveOutputStream(new FileOutputStream(path.toFile))
      members.foreach { case (n, c) =>
        val bytes = c.getBytes("UTF-8")
        val e = new TarArchiveEntry(n)
        e.setSize(bytes.length.toLong)
        out.putArchiveEntry(e); out.write(bytes); out.closeArchiveEntry()
      }
      out.close()
    }
    tar(zd.resolve("shard-00.tar"), Seq("a.txt" -> "alpha", "b.txt" -> "beta"))
    tar(Paths.get(zd.toString + "_meta").resolve("shard-00.tar"),
      Seq("a.txt" -> "m-a", "b.txt" -> "m-b"))
    val yaml =
      s"""dataset:
         |  urls:
         |    - "$zd"
         |  meta_urls:
         |    - "${zd}_meta"
         |  extensions:
         |    - "txt"
         |  pipeline_config:
         |    meta_join: zip
         |""".stripMargin
    val loaded = ConfigYaml.parse(yaml)
    assert(loaded.config.metaJoin == "zip")
    val df = GraftPipeline.create(spark, loaded.config)
    val rows = df.collect()
      .map(r => r.getAs[String]("__key__") -> r.getAs[String]("txt_meta")).toMap
    assert(rows == Map("a" -> "m-a", "b" -> "m-b"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.toLowerCase.contains("exchange"), plan)
  }

  test("MiniYaml parses the reference config shape (comments, quotes, nesting)") {
    val doc = MiniYaml.parse(
      """dataset:
        |  urls:
        |    # USER: adapt this path
        |    - "/path/to/data"
        |  pipeline_config:
        |    shardshuffle: 10000
        |    sample_shuffle: 1000 # inline comment
        |  decoders:
        |    - "pil"
        |  postprocessors:
        |    - target: sdata.mappers.TorchVisionImageTransforms
        |      params:
        |        key: 'jpg'
        |        transforms:
        |          - target: torchvision.transforms.Resize
        |            params:
        |              size: 256
        |              interpolation: 3
        |          - target: torchvision.transforms.ToTensor
        |    - target: sdata.mappers.Rescaler
        |loader:
        |  batch_size: 64
        |  num_workers: 6
        |""".stripMargin).asInstanceOf[Map[String, Any]]
    val ds = doc("dataset").asInstanceOf[Map[String, Any]]
    assert(ds("urls") == List("/path/to/data"))
    val pc = ds("pipeline_config").asInstanceOf[Map[String, Any]]
    assert(pc("shardshuffle") == 10000L && pc("sample_shuffle") == 1000L)
    assert(ds("decoders") == List("pil"))
    val posts = ds("postprocessors").asInstanceOf[List[Map[String, Any]]]
    assert(posts.length == 2)
    assert(posts(0)("target") == "sdata.mappers.TorchVisionImageTransforms")
    val transforms = posts(0)("params").asInstanceOf[Map[String, Any]]("transforms")
      .asInstanceOf[List[Map[String, Any]]]
    assert(transforms.map(_("target")) ==
      List("torchvision.transforms.Resize", "torchvision.transforms.ToTensor"))
    assert(transforms(0)("params").asInstanceOf[Map[String, Any]]("size") == 256L)
    assert(doc("loader").asInstanceOf[Map[String, Any]]("batch_size") == 64L)
  }

  test("example.yaml-shaped config builds the same pipeline as the JSON config") {
    val yaml =
      s"""dataset:
         |  urls:
         |    - "${dir.resolve("imgs")}"
         |  extensions:
         |    - "png"
         |  pipeline_config:
         |    shardshuffle: 10000
         |    sample_shuffle: 1000
         |    seed: 11
         |  decoders:
         |    - "torchrgb"
         |  postprocessors:
         |    - target: sdata.mappers.TorchVisionImageTransforms
         |      params:
         |        key: 'png'
         |        transforms:
         |          - target: torchvision.transforms.Resize
         |            params:
         |              size: 2
         |              interpolation: 3
         |          - target: torchvision.transforms.ToTensor
         |loader:
         |  batch_size: 64
         |  num_workers: 6
         |""".stripMargin
    val loaded = ConfigYaml.parse(yaml)
    assert(loaded.batchSize.contains(64))
    assert(loaded.config.shardShuffleSeed.contains(11))
    assert(loaded.config.sampleShuffleSeed.contains(11))
    assert(loaded.config.skipCorrupt) // reference defaults to warn_and_continue

    val json = ConfigJson.parse(
      s"""{
         |  "urls": ["${dir.resolve("imgs")}"],
         |  "extensions": ["png"],
         |  "shardShuffleSeed": 11,
         |  "sampleShuffleSeed": 11,
         |  "skipCorrupt": true,
         |  "decoders": ["torchrgb"],
         |  "postprocessors": [
         |    {"mapper": "image_transforms",
         |     "params": {"key": "png", "resize": "2", "layout": "chw",
         |                "interpolation": "3"}}
         |  ]
         |}""".stripMargin)

    val a = GraftPipeline.create(spark, loaded.config).collect()
    val b = GraftPipeline.create(spark, json).collect()
    assert(a.length == 1 && b.length == 1)
    val (da, db) = (a.head.getAs[org.apache.spark.sql.Row]("png"),
      b.head.getAs[org.apache.spark.sql.Row]("png"))
    assert(da == db, "YAML- and JSON-built pipelines must produce identical rows")
    assert(da.getAs[Int]("width") == 4 && da.getAs[Int]("height") == 2)
  }

  private def tvYaml(transformsYaml: String, sub: String = "imgs"): String =
    s"""dataset:
       |  urls:
       |    - "${dir.resolve(sub)}"
       |  extensions:
       |    - "png"
       |  decoders:
       |    - "torchrgb"
       |  postprocessors:
       |    - target: sdata.mappers.TorchVisionImageTransforms
       |      params:
       |        key: 'png'
       |        transforms:
       |$transformsYaml
       |""".stripMargin

  private def runPixels(yaml: String): (Int, Int, Seq[Float]) = {
    val row = GraftPipeline.create(spark, ConfigYaml.parse(yaml).config)
      .collect().head.getAs[org.apache.spark.sql.Row]("png")
    (row.getAs[Int]("width"), row.getAs[Int]("height"),
      row.getAs[scala.collection.Seq[Float]]("pixels").toSeq)
  }

  test("interpolation mode is honored: bicubic pixels match ImageCodec and differ from nearest") {
    val bicubic = runPixels(tvYaml(
      """          - target: torchvision.transforms.Resize
        |            params:
        |              size: 2
        |              interpolation: 3
        |          - target: torchvision.transforms.ToTensor""".stripMargin, sub = "grad"))
    val nearest = runPixels(tvYaml(
      """          - target: torchvision.transforms.Resize
        |            params:
        |              size: 2
        |              interpolation: 0
        |          - target: torchvision.transforms.ToTensor""".stripMargin, sub = "grad"))
    assert(bicubic._1 == 4 && bicubic._2 == 2)
    assert(bicubic._3 != nearest._3,
      "bicubic must produce different pixels than nearest on this fixture")
    // the YAML path must produce exactly what the codec kernel produces
    val decoded = graft.functions.ImageCodec.decodeAs("torchrgb", png8x4(gradient)).get
    val expect = graft.functions.ImageCodec.resizeShorter(
      decoded, 2, chw = true, graft.functions.ImageCodec.Interp.Bicubic,
      clampHi = 1.0f) // unit-scale spec → unit overshoot ceiling
    assert(bicubic._3 == expect.pixels.toSeq)
  }

  test("unknown transform params fail fast instead of dropping") {
    val e = intercept[Exception](ConfigYaml.parse(tvYaml(
      """          - target: torchvision.transforms.Resize
        |            params:
        |              size: 2
        |              antialias: true""".stripMargin)))
    assert(e.getMessage.contains("antialias"))
    val e2 = intercept[Exception](ConfigYaml.parse(tvYaml(
      """          - target: torchvision.transforms.Resize
        |            params:
        |              size: 2
        |              interpolation: 4""".stripMargin)))
    assert(e2.getMessage.contains("interpolation"))
  }

  test("non-canonical transform order fails fast") {
    val e = intercept[Exception](ConfigYaml.parse(tvYaml(
      """          - target: torchvision.transforms.Normalize
        |            params:
        |              mean:
        |                - 0.5
        |              std:
        |                - 0.5
        |          - target: torchvision.transforms.Resize
        |            params:
        |              size: 2""".stripMargin)))
    assert(e.getMessage.contains("order"))
  }

  test("Normalize / RandomHorizontalFlip / RandomCrop map through the YAML path") {
    // p=1 flip of the red|blue fixture swaps halves; normalize (0.5, 0.5)
    // maps [0,1] to [-1,1]; assertions check both against the raw decode.
    val (w, h, px) = runPixels(tvYaml(
      """          - target: torchvision.transforms.RandomCrop
        |            params:
        |              size: 4
        |          - target: torchvision.transforms.RandomHorizontalFlip
        |            params:
        |              p: 1.0
        |          - target: torchvision.transforms.ToTensor
        |          - target: torchvision.transforms.Normalize
        |            params:
        |              mean:
        |                - 0.5
        |              std:
        |                - 0.5""".stripMargin))
    assert(w == 4 && h == 4)
    assert(px.length == 3 * 4 * 4)
    // every output value is (v - 0.5) / 0.5 of a 0/1 input → ±1
    assert(px.forall(v => v == 1.0f || v == -1.0f))
  }

  test("RandomResizedCrop maps through YAML: fixed output size, deterministic draws") {
    val run1 = runPixels(tvYaml(
      """          - target: torchvision.transforms.RandomResizedCrop
        |            params:
        |              size: 3
        |              scale:
        |                - 0.5
        |                - 1.0
        |          - target: torchvision.transforms.ToTensor""".stripMargin, sub = "grad"))
    val run2 = runPixels(tvYaml(
      """          - target: torchvision.transforms.RandomResizedCrop
        |            params:
        |              size: 3
        |              scale:
        |                - 0.5
        |                - 1.0
        |          - target: torchvision.transforms.ToTensor""".stripMargin, sub = "grad"))
    assert(run1._1 == 3 && run1._2 == 3)
    assert(run1 == run2, "RandomResizedCrop must be replayable")
    // unknown param still fails fast
    val e = intercept[Exception](ConfigYaml.parse(tvYaml(
      """          - target: torchvision.transforms.RandomResizedCrop
        |            params:
        |              size: 3
        |              antialias: true""".stripMargin)))
    assert(e.getMessage.contains("antialias"))
  }

  test("Pad maps through YAML with pixel-exact constant fill") {
    val decoded = graft.functions.ImageCodec.decodeAs("torchrgb", png8x4(gradient)).get
    val (w, h, px) = runPixels(tvYaml(
      """          - target: torchvision.transforms.Pad
        |            params:
        |              padding: 1
        |              fill: 0
        |          - target: torchvision.transforms.ToTensor""".stripMargin, sub = "grad"))
    assert(w == 10 && h == 6)
    assert(px.length == 3 * 10 * 6)
    // border is the fill value; interior shifts by (1,1) and is preserved
    for (x <- 0 until 10) assert(px(0 * 60 + 0 * 10 + x) == 0.0f) // top row, ch 0
    for (y <- 0 until 6) assert(px(0 * 60 + y * 10 + 0) == 0.0f)  // left col, ch 0
    for (y <- 0 until 4; x <- 0 until 8; ch <- 0 until 3)
      assert(px(ch * 60 + (y + 1) * 10 + (x + 1)) == decoded.pixels(ch * 32 + y * 8 + x),
        s"interior pixel ($x,$y,ch$ch) must be preserved")
  }

  test("RandomRotation maps through YAML: exact 90-degree rotation, constant fill outside") {
    val decoded = graft.functions.ImageCodec.decodeAs("torchrgb", png8x4(gradient)).get
    val (w, h, px) = runPixels(tvYaml(
      """          - target: torchvision.transforms.RandomRotation
        |            params:
        |              degrees:
        |                - 90
        |                - 90
        |          - target: torchvision.transforms.ToTensor""".stripMargin, sub = "grad"))
    assert(w == 8 && h == 4)
    // inverse map at exactly 90°: out(x,y) = in(2+y, 5-x) when in range,
    // else fill 0 (center (3.5, 1.5), nearest sampling)
    for (y <- 0 until 4; x <- 0 until 8; ch <- 0 until 3) {
      val (sx, sy) = (2 + y, 5 - x)
      val expect =
        if (sy < 0 || sy >= 4) 0.0f
        else decoded.pixels(ch * 32 + sy * 8 + sx)
      assert(px(ch * 32 + y * 8 + x) == expect, s"rotated pixel ($x,$y,ch$ch)")
    }
  }

  test("ColorJitter maps through YAML: pinned brightness/saturation/hue are pixel-exact") {
    // brightness pinned to exactly 0.5 → every pixel halves
    val decoded = graft.functions.ImageCodec.decodeAs("torchrgb", png8x4(gradient)).get
    val (_, _, bright) = runPixels(tvYaml(
      """          - target: torchvision.transforms.ColorJitter
        |            params:
        |              brightness:
        |                - 0.5
        |                - 0.5
        |          - target: torchvision.transforms.ToTensor""".stripMargin, sub = "grad"))
    for (i <- decoded.pixels.indices)
      assert(math.abs(bright(i) - decoded.pixels(i) * 0.5f) < 1e-6f)
    // saturation pinned to 0 → every channel collapses to the pixel luma
    val (_, _, gray) = runPixels(tvYaml(
      """          - target: torchvision.transforms.ColorJitter
        |            params:
        |              saturation:
        |                - 0
        |                - 0
        |          - target: torchvision.transforms.ToTensor""".stripMargin))
    // left half is pure red (1,0,0) → luma 0.299 on all three channels
    assert(math.abs(gray(0 * 32 + 0) - 0.299f) < 1e-5f)       // ch 0
    assert(math.abs(gray(1 * 32 + 0) - 0.299f) < 1e-5f)       // ch 1
    // right half is pure blue → luma 0.114
    assert(math.abs(gray(2 * 32 + 7) - 0.114f) < 1e-5f)
    // hue pinned to +1/3 turn → red rotates to green
    val (_, _, hued) = runPixels(tvYaml(
      """          - target: torchvision.transforms.ColorJitter
        |            params:
        |              hue:
        |                - 0.333333333333
        |                - 0.333333333333
        |          - target: torchvision.transforms.ToTensor""".stripMargin))
    assert(math.abs(hued(0 * 32 + 0) - 0.0f) < 1e-5f, "red channel after hue shift")
    assert(math.abs(hued(1 * 32 + 0) - 1.0f) < 1e-5f, "green channel after hue shift")
  }

  test("GaussianBlur maps through YAML: pinned sigma gives exact separable blur") {
    // scalar sigma pins lo == hi → deterministic kernel; kernel_size 3,
    // sigma 1 over the left-red/right-blue image: rows are constant
    // vertically, so only the horizontal pass changes values, and the
    // step edge smears by exactly one kernel tap each side.
    val (w, h, px) = runPixels(tvYaml(
      """          - target: torchvision.transforms.GaussianBlur
        |            params:
        |              kernel_size: 3
        |              sigma: 1.0
        |          - target: torchvision.transforms.ToTensor""".stripMargin))
    assert(w == 8 && h == 4)
    val e = math.exp(-0.5).toFloat
    val sum = 1.0f + 2.0f * e
    val a = e / sum
    val b = 1.0f / sum
    for (y <- 0 until 4) {
      def red(x: Int) = px(0 * 32 + y * 8 + x)
      def blue(x: Int) = px(2 * 32 + y * 8 + x)
      assert(math.abs(red(0) - 1.0f) < 1e-5f, "deep in the red half: unchanged")
      assert(math.abs(red(3) - (a + b)) < 1e-5f, "red edge column keeps a+b")
      assert(math.abs(red(4) - a) < 1e-5f, "first blue column picks up a of red")
      assert(math.abs(red(6)) < 1e-5f)
      assert(math.abs(blue(4) - (a + b)) < 1e-5f, "blue edge column keeps a+b")
      assert(math.abs(blue(3) - a) < 1e-5f)
      assert(math.abs(blue(7) - 1.0f) < 1e-5f, "reflect padding: border not repeated")
    }
    // config validation: missing kernel_size and unknown params fail fast
    val noKs = intercept[RuntimeException](runPixels(tvYaml(
      """          - target: torchvision.transforms.GaussianBlur
        |            params:
        |              sigma: 1.0""".stripMargin)))
    assert(noKs.getMessage.contains("kernel_size"))
    val badParam = intercept[RuntimeException](runPixels(tvYaml(
      """          - target: torchvision.transforms.GaussianBlur
        |            params:
        |              kernel_size: 3
        |              radius: 2""".stripMargin)))
    assert(badParam.getMessage.contains("radius"))
  }

  test("namespaced interpolation: Resize's kernel is honored alongside RandomResizedCrop") {
    // before namespacing, RandomResizedCrop's default (bilinear) silently
    // overrode Resize's bicubic for the whole chain; now each op keeps its
    // own kernel, so changing only Resize's code must change the output
    def chain(resizeInterp: Int) = tvYaml(
      s"""          - target: torchvision.transforms.RandomResizedCrop
         |            params:
         |              size: 4
         |              scale:
         |                - 1.0
         |                - 1.0
         |              ratio:
         |                - 1.0
         |                - 1.0
         |          - target: torchvision.transforms.Resize
         |            params:
         |              size: 2
         |              interpolation: $resizeInterp
         |          - target: torchvision.transforms.ToTensor""".stripMargin, sub = "grad")
    val bicubic = runPixels(chain(3))
    val nearest = runPixels(chain(0))
    assert(bicubic._3 != nearest._3,
      "Resize interpolation must take effect in a chain containing RandomResizedCrop")
  }

  test("same-rank and duplicate transforms fail fast instead of silently reordering") {
    // Resize listed before RandomResizedCrop cannot execute in config
    // order (the chain applies rrc first) → parse error
    val e = intercept[Exception](ConfigYaml.parse(tvYaml(
      """          - target: torchvision.transforms.Resize
        |            params:
        |              size: 2
        |          - target: torchvision.transforms.RandomResizedCrop
        |            params:
        |              size: 3""".stripMargin)))
    assert(e.getMessage.contains("order"))
    // CenterCrop then RandomCrop executes random_crop first → error
    val e2 = intercept[Exception](ConfigYaml.parse(tvYaml(
      """          - target: torchvision.transforms.CenterCrop
        |            params:
        |              size: 3
        |          - target: torchvision.transforms.RandomCrop
        |            params:
        |              size: 2""".stripMargin)))
    assert(e2.getMessage.contains("order"))
    // the same transform twice would collapse into one param → error
    val e3 = intercept[Exception](ConfigYaml.parse(tvYaml(
      """          - target: torchvision.transforms.Resize
        |            params:
        |              size: 4
        |          - target: torchvision.transforms.Resize
        |            params:
        |              size: 2""".stripMargin)))
    assert(e3.getMessage.contains("order"))
  }

  test("registered user ImageOp runs in-chain from YAML (torchvision escape hatch)") {
    // rank 95: after ToTensor (90), before Normalize (100)
    graft.operators.ImageTransforms.registerConfigOp("Invert", rank = 95)(
      (params, ctx) =>
        YamlConfigSpec.InvertOp(params.get("hi").map(_.toFloat).getOrElse(ctx.clampHi)))
    val (w, h, px) = runPixels(tvYaml(
      """          - target: torchvision.transforms.Resize
        |            params:
        |              size: 2
        |          - target: torchvision.transforms.ToTensor
        |          - target: my.ops.Invert""".stripMargin, sub = "grad"))
    val decoded = graft.functions.ImageCodec.decodeAs("torchrgb", png8x4(gradient)).get
    val resized = graft.functions.ImageCodec.resizeShorter(
      decoded, 2, chw = true, graft.functions.ImageCodec.Interp.Nearest, clampHi = 1.0f)
    assert(w == 4 && h == 2)
    assert(px == resized.pixels.map(v => 1.0f - v).toSeq,
      "user op must run at its registered chain position with the chain's clamp context")
    // explicit params reach the factory
    val (_, _, px2) = runPixels(tvYaml(
      """          - target: torchvision.transforms.Resize
        |            params:
        |              size: 2
        |          - target: torchvision.transforms.ToTensor
        |          - target: my.ops.Invert
        |            params:
        |              hi: 2.0""".stripMargin, sub = "grad"))
    assert(px2 == resized.pixels.map(v => 2.0f - v).toSeq)
    // chain-order validation extends to user ops: Invert (95) cannot
    // precede Resize (10)
    val e = intercept[Exception](ConfigYaml.parse(tvYaml(
      """          - target: my.ops.Invert
        |          - target: torchvision.transforms.Resize
        |            params:
        |              size: 2""".stripMargin)))
    assert(e.getMessage.contains("order"))
    // unregistered names still fail fast
    val e2 = intercept[Exception](ConfigYaml.parse(tvYaml(
      """          - target: torchvision.transforms.ElasticTransform
        |            params:
        |              alpha: 50.0""".stripMargin)))
    assert(e2.getMessage.contains("unsupported torchvision transform"))
  }

  test("RandomAffine maps through YAML: pinned scale is pixel-exact, 90-degree equals rotation") {
    // scale pinned to [2,2], everything else identity: output pixel (x,y)
    // pulls from (cx + (x-cx)/2, cy + (y-cy)/2) — exact with nearest
    val (w, h, px) = runPixels(tvYaml(
      """          - target: torchvision.transforms.RandomAffine
        |            params:
        |              degrees: 0
        |              scale:
        |                - 2.0
        |                - 2.0
        |          - target: torchvision.transforms.ToTensor""".stripMargin, sub = "grad"))
    assert(w == 8 && h == 4)
    val decoded = graft.functions.ImageCodec.decodeAs("torchrgb", png8x4(gradient)).get
    val (cx, cy) = ((8 - 1) / 2.0, (4 - 1) / 2.0)
    def src(x: Int, y: Int) =
      (math.round(cx + (x - cx) / 2.0).toInt, math.round(cy + (y - cy) / 2.0).toInt)
    val expect = for (ch <- 0 until 3; y <- 0 until 4; x <- 0 until 8) yield {
      val (sx, sy) = src(x, y)
      decoded.pixels(ch * 4 * 8 + sy * 8 + sx)
    }
    assert(px == expect, "pinned 2x zoom must be exact")
    // degrees pinned to [90,90] with no translate/scale/shear must equal
    // RandomRotation's 90-degree output (same inverse mapping)
    val affine90 = runPixels(tvYaml(
      """          - target: torchvision.transforms.RandomAffine
        |            params:
        |              degrees:
        |                - 90
        |                - 90
        |          - target: torchvision.transforms.ToTensor""".stripMargin, sub = "grad"))
    val rot90 = runPixels(tvYaml(
      """          - target: torchvision.transforms.RandomRotation
        |            params:
        |              degrees:
        |                - 90
        |                - 90
        |          - target: torchvision.transforms.ToTensor""".stripMargin, sub = "grad"))
    assert(affine90 == rot90, "affine(90) must match rotation(90)")
    // unknown param still fails fast
    val e = intercept[Exception](ConfigYaml.parse(tvYaml(
      """          - target: torchvision.transforms.RandomAffine
        |            params:
        |              degrees: 10
        |              center:
        |                - 0
        |                - 0""".stripMargin)))
    assert(e.getMessage.contains("center"))
  }

  test("unknown decoder spec strings fail at config load, not executor-side") {
    val e = intercept[Exception](ConfigYaml.parse(
      s"""dataset:
         |  urls:
         |    - "/a"
         |  extensions:
         |    - "png"
         |  decoders:
         |    - "torchwat"
         |""".stripMargin))
    assert(e.getMessage.contains("unknown decoder spec"), e.getMessage)
  }

  test("resample_prefixes without mixture_total fails fast instead of silently emptying") {
    val e = intercept[Exception](ConfigYaml.parse(
      s"""dataset:
         |  urls:
         |    - "/a"
         |    - "/b"
         |  extensions:
         |    - "txt"
         |  pipeline_config:
         |    resample_prefixes: true
         |    prefix_probs:
         |      - 0.7
         |      - 0.3
         |""".stripMargin))
    assert(e.getMessage.contains("mixture_total"))
  }
}

object YamlConfigSpec {
  /** User op for the escape-hatch test: v → hi − v over decoded pixels.
    * Top-level so the UDF closure doesn't capture the suite instance.
    */
  final case class InvertOp(hi: Float) extends graft.operators.ImageOp {
    private val f = org.apache.spark.sql.functions.udf(
      (w: Int, h: Int, c: Int, px: Seq[Float]) =>
        graft.functions.ImageCodec.DecodedImage(w, h, c, px.map(v => hi - v)))
    override def apply(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      f(media.getField("width"), media.getField("height"),
        media.getField("channels"), media.getField("pixels"))
  }
}
