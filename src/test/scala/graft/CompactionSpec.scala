package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SourceQueries

/** Pins the compaction arithmetic behind qai: the shattered layout
  * really is 64 files, and the compacted layout is the byte-budget
  * file count (ceil(total / target)), strictly fewer files.
  */
class CompactionSpec extends AnyFunSuite {
  private val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))

  test("compaction repacks 64 shattered files into the byte-budget count") {
    val out = SourceQueries.compactedPath(spark, sf)
    val frag = Integer.toHexString(sf.hashCode)
    val small = parquetFiles(s"target/layout-small-$frag")
    assert(small.length == 64, s"shattered layout has ${small.length} files")
    val expected = math.max(1, math.ceil(
      small.map(_.length).sum.toDouble / SourceQueries.CompactTargetBytes).toInt)
    val compacted = parquetFiles(out)
    assert(compacted.length == expected,
      s"compacted ${compacted.length} files, expected $expected")
    assert(compacted.length < small.length)
    // content survives: same row count both sides
    assert(spark.read.parquet(out).count() ==
      spark.read.parquet(s"target/layout-small-$frag").count())
  }
}
