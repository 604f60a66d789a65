package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths}

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-driven spec for the wds-tar DataSource V2: sample assembly,
  * reserved columns, heterogeneous keys, column pruning, overflow map,
  * corrupt-shard skip. Fixture tars are generated under target/.
  */
class WdsTarSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val fixtureDir = {
    val d = Paths.get("target", "wds-fixtures").toAbsolutePath
    Files.createDirectories(d)
    d
  }

  private def writeTar(name: String, members: Seq[(String, Array[Byte])]): String = {
    val f = fixtureDir.resolve(name).toFile
    val out = new TarArchiveOutputStream(new FileOutputStream(f))
    members.foreach { case (path, bytes) =>
      val e = new TarArchiveEntry(path)
      e.setSize(bytes.length.toLong)
      out.putArchiveEntry(e)
      out.write(bytes)
      out.closeArchiveEntry()
    }
    out.close()
    f.getAbsolutePath
  }

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  private lazy val shard1 = writeTar("shard-000000.tar", Seq(
    "sample-a.jpg" -> b("JPGDATA-A"),
    "sample-a.json" -> b("""{"h": 2}"""),
    "sample-a.txt" -> b("caption a"),
    "sample-b.jpg" -> b("JPGDATA-B"),
    "sample-b.txt" -> b("caption b"), // no json — heterogeneous keys
    "sample-c.extra.weird" -> b("overflow me"),
    "sample-c.jpg" -> b("JPGDATA-C")))

  test("assembles consecutive same-stem members into one row per sample") {
    val df = spark.read.format("wds-tar")
      .option("shards", shard1)
      .option("extensions", "jpg,json,txt")
      .load()
    val rows = df.collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("sample-a", "sample-b", "sample-c"))
    val a = rows("sample-a")
    assert(new String(a.getAs[Array[Byte]]("jpg")) == "JPGDATA-A")
    assert(new String(a.getAs[Array[Byte]]("json")) == """{"h": 2}""")
    assert(a.getString(1) == shard1) // __url__
    // missing member ⇒ null column (superset of the reference's
    // key-intersection drop, SURVEY.md §1.1)
    assert(rows("sample-b").getAs[Array[Byte]]("json") == null)
  }

  test("multi-dot member names key on the first dot (reference grouper)") {
    val df = spark.read.format("wds-tar")
      .option("shards", shard1)
      .option("extensions", "jpg,extra.weird")
      .load()
    val c = df.filter("__key__ = 'sample-c'").collect().head
    assert(new String(c.getAs[Array[Byte]]("extra.weird")) == "overflow me")
  }

  test("column pruning keeps only requested columns in the scan") {
    val df = spark.read.format("wds-tar")
      .option("shards", shard1)
      .option("extensions", "jpg,json,txt")
      .load()
      .select("__key__")
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("sample-a", "sample-b", "sample-c"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__key__"))
  }

  test("overflow map captures undeclared extensions") {
    val df = spark.read.format("wds-tar")
      .option("shards", shard1)
      .option("extensions", "jpg")
      .option("overflow", "true")
      .load()
    val c = df.filter("__key__ = 'sample-c'").collect().head
    val m = c.getAs[Map[String, Array[Byte]]]("__overflow__")
    assert(m.keySet == Set("extra.weird"))
    assert(new String(m("extra.weird")) == "overflow me")
  }

  test("overflow contents are projection-independent (declared exts never leak in)") {
    val df = spark.read.format("wds-tar")
      .option("shards", shard1)
      .option("extensions", "jpg")
      .option("overflow", "true")
      .load()
    // prune the declared 'jpg' column out of the projection: the
    // overflow map must still exclude it — pruning must never change
    // column values (ADVICE round 1).
    val c = df.select("__key__", "__overflow__")
      .filter("__key__ = 'sample-c'").collect().head
    val m = c.getAs[Map[String, Array[Byte]]]("__overflow__")
    assert(m.keySet == Set("extra.weird"), s"got ${m.keySet}")
  }

  test("brace expansion in shards option; one partition per shard") {
    writeTar("shard-000001.tar", Seq("z.txt" -> b("zz")))
    val pattern = fixtureDir.resolve("shard-{000000..000001}.tar").toString
    val df = spark.read.format("wds-tar")
      .option("shards", pattern)
      .option("extensions", "txt")
      .load()
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 4) // 3 samples + 1
  }

  test("maxPartitionBytes packs small shards; rows identical to 1:1") {
    val shards = (0 until 6).map { i =>
      writeTar(f"pack-$i%02d.tar", Seq(f"p$i%02d.txt" -> b(s"payload $i")))
    }
    def read(extra: (String, String)*) = {
      val r = spark.read.format("wds-tar")
        .option("shards", shards.mkString(","))
        .option("extensions", "txt")
      extra.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
    }
    def contents(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
      df.collect().map(r =>
        r.getAs[String]("__key__") -> new String(r.getAs[Array[Byte]]("txt")))
        .sortBy(_._1).toSeq

    val oneToOne = read()
    assert(oneToOne.rdd.getNumPartitions == 6)
    // all six fixture tars are byte-identical in size (same name and
    // payload lengths), so a budget of exactly 3 shard-sizes packs 3+3
    val s0 = Files.size(Paths.get(shards.head))
    val packed = read(
      "maxPartitionBytes" -> (3 * s0).toString, "openCostInBytes" -> "0")
    assert(packed.rdd.getNumPartitions == 2)
    assert(contents(packed) == contents(oneToOne))
    // openCost dominates when shards are tiny: with a 4 MiB pad per
    // shard (the default) a 5 MiB budget packs nothing
    val padded = read("maxPartitionBytes" -> (5L * 1024 * 1024).toString)
    assert(padded.rdd.getNumPartitions == 6)
  }

  test("packing composes with pushdown: prune first, then pack; key skip chains") {
    val shards = (0 until 6).map(i => fixtureDir.resolve(f"pack-$i%02d.tar").toString)
    val s0 = Files.size(Paths.get(shards.head))
    val df = spark.read.format("wds-tar")
      .option("shards", shards.mkString(","))
      .option("extensions", "txt")
      .option("maxPartitionBytes", (2 * s0).toString)
      .option("openCostInBytes", "0")
      .load()
    // __url__ pruning drops 3 shards at planning, the survivors pack 2+1
    val pruned = df.filter(org.apache.spark.sql.functions.col("__url__") <=
      fixtureDir.resolve("pack-02.tar").toString)
    assert(pruned.rdd.getNumPartitions == 2)
    assert(pruned.count() == 3)
    // __key__ pushdown evaluates inside the chained reader per sample
    val keyed = df.filter(org.apache.spark.sql.functions.col("__key__") >= "p04")
    assert(keyed.collect().map(_.getAs[String]("__key__")).sorted.toSeq ==
      Seq("p04", "p05"))
  }

  test("truncated member: errorPolicy=skip keeps prior rows, fail propagates") {
    // valid tar, then cut the file mid-way through the LAST member's
    // payload: header parses, the data read hits EOF
    val full = fixtureDir.resolve("trunc-full.tar").toFile
    val out = new TarArchiveOutputStream(new FileOutputStream(full))
    Seq("ok1.txt" -> b("fine"), "ok2.txt" -> b("also fine"),
      "bad.txt" -> b("x" * 4096)).foreach { case (n, bytes) =>
      val e = new TarArchiveEntry(n)
      e.setSize(bytes.length.toLong)
      out.putArchiveEntry(e); out.write(bytes); out.closeArchiveEntry()
    }
    out.close()
    val all = Files.readAllBytes(full.toPath)
    val cut = fixtureDir.resolve("trunc.tar")
    // layout: [hdr ok1|512][data 512][hdr ok2|512][data 512][hdr bad|512]
    // [data 4096...] — cut 1 KiB into bad's 4 KiB payload
    Files.write(cut, all.take(2560 + 1024).toArray)
    def read(policy: String) = spark.read.format("wds-tar")
      .option("shards", cut.toString)
      .option("extensions", "txt")
      .option("errorPolicy", policy)
      .load()
    // pruned projection (payload never read) and full projection must
    // agree on row membership — the truncated sample drops in both
    val keysPruned = read("skip").select("__key__").collect().map(_.getString(0)).sorted
    assert(keysPruned.toSeq == Seq("ok1", "ok2"), "rows before the truncation must survive")
    val keysFull = read("skip").select("__key__", "txt").collect().map(_.getString(0)).sorted
    assert(keysFull.toSeq == keysPruned.toSeq, "row membership must not depend on projection")
    val e = intercept[Exception](read("fail").count())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("failed reading") || m.contains("truncated")),
      e.toString)
  }

  test("corrupt shard: errorPolicy=skip warns and keeps good rows") {
    val corrupt = fixtureDir.resolve("corrupt.tar").toFile
    val fos = new FileOutputStream(corrupt)
    fos.write(b("this is not a tar at all, but long enough to look like one" * 20))
    fos.close()
    val df = spark.read.format("wds-tar")
      .option("shards", s"$shard1,${corrupt.getAbsolutePath}")
      .option("extensions", "jpg")
      .option("errorPolicy", "skip")
      .load()
    assert(df.count() == 3) // corrupt shard contributes nothing
  }

  test("schema inference from the first shard when extensions undeclared") {
    val df = spark.read.format("wds-tar")
      .option("shards", shard1)
      .load()
    // observed extensions of shard1, sorted
    assert(df.columns.toSeq == Seq("__key__", "__url__", "extra.weird", "jpg", "json", "txt"))
    assert(df.count() == 3)
  }

  test("write path: tar round-trip preserves samples and members") {
    import spark.implicits._
    val outDir = fixtureDir.resolve("written").toString
    val src = Seq(
      ("w1", "payload-1".getBytes("UTF-8"), "label-a"),
      ("w2", "payload-2".getBytes("UTF-8"), "label-b"),
      ("w3", null.asInstanceOf[Array[Byte]], "label-c"))
      .toDF("__key__", "jpg", "txt")
    src.repartition(2).write.format("wds-tar")
      .option("path", outDir).mode("overwrite").save()
    val back = spark.read.format("wds-tar")
      .option("path", outDir)
      .option("extensions", "jpg,txt")
      .load()
    val rows = back.collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("w1", "w2", "w3"))
    assert(new String(rows("w1").getAs[Array[Byte]]("jpg")) == "payload-1")
    assert(new String(rows("w3").getAs[Array[Byte]]("txt")) == "label-c")
    assert(rows("w3").getAs[Array[Byte]]("jpg") == null) // null column skipped
    // overwrite truncates previous tars
    src.limit(1).coalesce(1).write.format("wds-tar")
      .option("path", outDir).mode("overwrite").save()
    assert(spark.read.format("wds-tar").option("path", outDir)
      .option("extensions", "jpg,txt").load().count() == 1)
  }

  test("write path: maxSamplesPerShard rolls shards inside one task") {
    import spark.implicits._
    val outDir = fixtureDir.resolve("written-rolled").toString
    val src = (0 until 350)
      .map(i => (f"r$i%04d", s"payload-$i")).toDF("__key__", "txt")
    src.coalesce(1).write.format("wds-tar")
      .option("path", outDir)
      .option("maxSamplesPerShard", "100")
      .option("index", "true")
      .mode("overwrite").save()
    val tars = new java.io.File(outDir).list().filter(_.endsWith(".tar")).sorted
    assert(tars.length == 4, tars.mkString(","))
    // chunk 0 keeps the plain task name; later chunks suffix -c000k
    assert(tars.count(_.contains("-c000")) == 3, tars.mkString(","))
    // every chunk carries its own index sidecar
    assert(new java.io.File(outDir).list().count(_.endsWith(".tar.idx")) == 4)
    // nothing lost, nothing duplicated, content intact
    val back = spark.read.format("wds-tar")
      .option("path", outDir).option("extensions", "txt").load()
    assert(back.count() == 350)
    val r17 = back.where($"__key__" === "r0017").head
    assert(new String(r17.getAs[Array[Byte]]("txt")) == "payload-17")
  }

  test("write path: maxShardBytes rolls on size; meta siblings roll in lockstep") {
    import spark.implicits._
    val outDir = fixtureDir.resolve("written-rolled-bytes").toString
    val big = "x" * 4096
    val src = (0 until 40)
      .map(i => (f"b$i%04d", big + i, i.toString)).toDF("__key__", "txt", "txt_m")
    src.coalesce(1).write.format("wds-tar")
      .option("path", outDir)
      .option("metaSuffixes", "m")
      .option("maxShardBytes", (32 * 1024).toString)
      .mode("overwrite").save()
    val mainTars = new java.io.File(outDir).list().filter(_.endsWith(".tar")).sorted
    assert(mainTars.length > 1, mainTars.mkString(","))
    // each rolled main shard stays near the bound (one sample of slop)
    mainTars.foreach { t =>
      val len = new java.io.File(outDir, t).length()
      assert(len <= 32 * 1024 + 3 * 4096 + 4096,
        s"$t is $len bytes, rolled too late")
    }
    // meta sibling dir rolled to the SAME chunk basenames (zip-join
    // alignment survives rolling by construction)
    val metaTars = new java.io.File(outDir + "_m").list()
      .filter(_.endsWith(".tar")).sorted
    assert(metaTars.toSeq == mainTars.toSeq)
    val back = spark.read.format("wds-tar")
      .option("path", outDir).option("extensions", "txt").load()
    assert(back.count() == 40)
    // the byte bound binds on EVERY destination: a meta sibling whose
    // payloads dominate must trigger the roll even when the main shard
    // stays small
    val outDir2 = fixtureDir.resolve("written-rolled-meta").toString
    val src2 = (0 until 40)
      .map(i => (f"m$i%04d", i.toString, big + i)).toDF("__key__", "txt", "txt_m")
    src2.coalesce(1).write.format("wds-tar")
      .option("path", outDir2)
      .option("metaSuffixes", "m")
      .option("maxShardBytes", (32 * 1024).toString)
      .mode("overwrite").save()
    val metaTars2 = new java.io.File(outDir2 + "_m").list()
      .filter(_.endsWith(".tar"))
    assert(metaTars2.length > 1,
      s"meta-dominated payload never rolled: ${metaTars2.length} shard(s)")
  }

  test("write path: metaSuffixes routes ext_suffix columns to aligned sibling meta shards") {
    import spark.implicits._
    val outDir = fixtureDir.resolve("written-meta").toString
    val src = Seq(
      ("m1", "pay-1", "91"),
      ("m2", "pay-2", "92"),
      ("m3", "pay-3", "93"))
      .toDF("__key__", "txt", "txt_info")
    src.coalesce(1).write.format("wds-tar")
      .option("path", outDir)
      .option("metaSuffixes", "info")
      .mode("overwrite").save()
    // sibling layout: same shard basenames in <dir>_info, unsuffixed
    // member stems — exactly what resolveMetaShards + zip join consume
    val mainTars = new java.io.File(outDir).list().filter(_.endsWith(".tar")).sorted
    val metaTars = new java.io.File(outDir + "_info").list().filter(_.endsWith(".tar")).sorted
    assert(mainTars.nonEmpty && mainTars.toSeq == metaTars.toSeq)
    val back = graft.pipeline.GraftPipeline.create(spark, graft.pipeline.PipelineConfig(
      urls = Seq(outDir),
      extensions = Seq("txt"),
      metaSuffixes = Seq("info"),
      metaJoin = "zip"))
    val rows = back.collect()
      .map(r => r.getAs[String]("__key__") ->
        (r.getAs[String]("txt"), r.getAs[String]("txt_info"))).toMap
    assert(rows == Map(
      "m1" -> (("pay-1", "91")),
      "m2" -> (("pay-2", "92")),
      "m3" -> (("pay-3", "93"))))
  }

  test("__url__ pushdown prunes shards at planning: partition count shrinks") {
    val s2 = writeTar("push-000000.tar", Seq(
      "p1.txt" -> b("one"), "p2.txt" -> b("two")))
    val s3 = writeTar("push-000001.tar", Seq(
      "p3.txt" -> b("three")))
    val df = spark.read.format("wds-tar")
      .option("shards", s"$s2,$s3")
      .option("extensions", "txt")
      .load()
    import org.apache.spark.sql.functions.col
    val pruned = df.filter(col("__url__").endsWith("push-000000.tar"))
    // the filtered-out tar never becomes a partition (never opened)
    assert(pruned.rdd.getNumPartitions == 1)
    assert(df.rdd.getNumPartitions == 2)
    assert(pruned.collect().map(_.getString(0)).sorted.toSeq == Seq("p1", "p2"))
    // explain advertises the pushed predicates
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || pruned.count() == 2)
  }

  test("__key__ pushdown skips sample assembly; results equal post-filter") {
    val s4 = writeTar("keypush-000000.tar", Seq(
      "aaa.txt" -> b("1"), "abb.txt" -> b("2"), "zzz.txt" -> b("3")))
    import org.apache.spark.sql.functions.col
    val df = spark.read.format("wds-tar")
      .option("shards", s4)
      .option("extensions", "txt")
      .load()
    val got = df.filter(col("__key__").startsWith("a"))
      .collect().map(r => r.getString(0) -> new String(r.getAs[Array[Byte]]("txt")))
      .toMap
    assert(got == Map("aaa" -> "1", "abb" -> "2"))
    // range predicate shape too (lexicographic on the stem)
    assert(df.filter(col("__key__") >= "abb").count() == 2)
  }

  test("range pushdown compares UTF-8 bytes, matching Spark's string order") {
    import org.apache.spark.sql.sources.{GreaterThan, LessThan}
    import graft.sources.wdstar.ShardFilters
    // U+10000 (surrogate pair, UTF-8 F0 90 80 80) vs U+E000 (EE 80 80):
    // Java String order says U+10000 < U+E000 (surrogates sort low),
    // Spark's UTF8String byte order says the opposite. Pruning must use
    // Spark's order or rows get dropped that the residual filter keeps.
    val supp = "𐀀" // U+10000
    val bmp = ""
    assert(supp < bmp, "sanity: UTF-16 order disagrees on this pair")
    assert(ShardFilters.eval(GreaterThan("__key__", bmp), supp),
      "UTF-8 byte order: U+10000 > U+E000")
    assert(!ShardFilters.eval(LessThan("__key__", bmp), supp))
  }

  // Real-world shards carry PAX extended headers and >100-char member
  // paths (the ustar name-field limit) — the reference tolerates
  // anything python's tarfile yields (custom_datapipes.py:339-408).
  // commons-compress transparently resolves both PAX (LONGFILE_POSIX)
  // and GNU (LONGFILE_GNU) long-name records; these fixtures prove the
  // whole read path — stem assembly, key derivation, pruning — sees the
  // RESOLVED names, not the 'ustar chunk + @LongLink' raw entries.
  private def writeTarLongMode(name: String, mode: Int,
      members: Seq[(String, Array[Byte])]): String = {
    val f = fixtureDir.resolve(name).toFile
    val out = new TarArchiveOutputStream(new FileOutputStream(f))
    out.setLongFileMode(mode)
    out.setAddPaxHeadersForNonAsciiNames(true)
    members.foreach { case (path, bytes) =>
      val e = new TarArchiveEntry(path)
      e.setSize(bytes.length.toLong)
      out.putArchiveEntry(e)
      out.write(bytes)
      out.closeArchiveEntry()
    }
    out.close()
    f.getAbsolutePath
  }

  private val deepPrefix =
    "very/deep/dataset/layout/with/many/nested/component/directories/" +
      "that/push/the/full/member/path/well/past/the/ustar/limit"

  test("PAX long-name shard: >100-char member paths assemble by resolved stem") {
    val shard = writeTarLongMode("pax-long-000000.tar",
      TarArchiveOutputStream.LONGFILE_POSIX, Seq(
        s"$deepPrefix/sample-000001.txt" -> b("pax one"),
        s"$deepPrefix/sample-000001.cls" -> b("7"),
        s"$deepPrefix/sample-000002.txt" -> b("pax two"),
        s"$deepPrefix/sample-000002.cls" -> b("9")))
    assert((deepPrefix + "/sample-000001.txt").length > 100)
    val df = spark.read.format("wds-tar")
      .option("shards", shard).option("extensions", "txt,cls").load()
    val rows = df.collect().map(r => r.getString(0) -> r).toMap
    // basename stem, directory prefix stripped by sampleKey
    assert(rows.keySet == Set("sample-000001", "sample-000002"))
    assert(new String(rows("sample-000001").getAs[Array[Byte]]("txt")) == "pax one")
    assert(new String(rows("sample-000002").getAs[Array[Byte]]("cls")) == "9")
  }

  test("GNU long-name shard reads identically to PAX") {
    val shard = writeTarLongMode("gnu-long-000000.tar",
      TarArchiveOutputStream.LONGFILE_GNU, Seq(
        s"$deepPrefix/sample-000003.txt" -> b("gnu three"),
        s"$deepPrefix/sample-000003.cls" -> b("3")))
    val df = spark.read.format("wds-tar")
      .option("shards", shard).option("extensions", "txt,cls").load()
    val rows = df.collect()
    assert(rows.length == 1 && rows(0).getString(0) == "sample-000003")
    assert(new String(rows(0).getAs[Array[Byte]]("txt")) == "gnu three")
  }

  test("PAX headers with non-ascii member names resolve to the utf-8 stem") {
    val shard = writeTarLongMode("pax-utf8-000000.tar",
      TarArchiveOutputStream.LONGFILE_POSIX, Seq(
        "sämple-ünïcode.txt" -> b("utf8 name"),
        "sämple-ünïcode.cls" -> b("5")))
    val df = spark.read.format("wds-tar")
      .option("shards", shard).option("extensions", "txt,cls").load()
    val rows = df.collect()
    assert(rows.length == 1 && rows(0).getString(0) == "sämple-ünïcode")
  }

  test("__key__ pushdown operates on PAX-resolved long names") {
    val shard = writeTarLongMode("pax-push-000000.tar",
      TarArchiveOutputStream.LONGFILE_POSIX, Seq(
        s"$deepPrefix/sample-000001.txt" -> b("a"),
        s"$deepPrefix/sample-000005.txt" -> b("b"),
        s"$deepPrefix/sample-000009.txt" -> b("c")))
    val df = spark.read.format("wds-tar")
      .option("shards", shard).option("extensions", "txt").load()
    import org.apache.spark.sql.functions.col
    val got = df.filter(col("__key__") >= "sample-000005").collect().map(_.getString(0))
    assert(got.sorted.toSeq == Seq("sample-000005", "sample-000009"))
  }

  test("member extension derivation and shard keys (pure listing layer)") {
    import graft.sources.ShardExpand._
    assert(expand("ds-{000..002}.tar") ==
      Seq("ds-000.tar", "ds-001.tar", "ds-002.tar"))
    intercept[IllegalArgumentException](expand("ds-{00..002}.tar"))
    intercept[IllegalArgumentException](expand("ds-{005..002}.tar"))
    intercept[IllegalArgumentException](expand("ds-nothing.tar"))
    assert(sampleKey("dir/a/sample-x.jpg") == "sample-x")
    assert(memberExtension("dir/sample-x.seg.png") == "seg.png")
    assert(shardKey("/data/ds/shard-01.tar") == "/data/ds/shard-01")
    assert(refKey("/data/ds_meta/shard-01_meta.tar", "meta") == "/data/ds_meta/shard-01")
  }
}
