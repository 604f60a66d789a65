package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Driver-side shard listing (SURVEY.md §2.1 S1/S4/S7 and the
  * metadata-existence semi-filter J4).
  *
  * The reference lists shard files with fsspec per directory and applies
  * an optional sampler predicate (reference sdata/datapipeline.py:277-303);
  * metadata branches derive sibling `_suffix` directories and semi-filter
  * the main list to shards whose metadata exists
  * (reference sdata/datapipeline.py:386-404).
  *
  * Shard lists are small relative to data (1 path per multi-hundred-MB
  * tar: ~100k entries per 100 TB), so listing is driver-resident by
  * design — exactly like Spark's own file-index — and the semi-filter is
  * a driver-side set intersection rather than a distributed join.
  */
object ShardListing {

  /** Recursively list `.tar` files under each url; brace patterns expand
    * without touching the filesystem (reference datapipeline.py:357-366:
    * braceexpand urls are trusted, not listed). `sampler` is the
    * config-instantiable shard predicate (reference tar_sampler,
    * datapipeline.py:322, identity by default).
    */
  def listShards(spark: SparkSession, urls: Seq[String],
      sampler: String => Boolean = _ => true): Seq[String] = {
    val expanded = urls.flatMap { u =>
      if (ShardExpand.isBraceExpand(u)) ShardExpand.expand(u)
      else listDir(spark, u)
    }
    expanded.filter(ShardExpand.tarFilter).filter(sampler)
  }

  private def listDir(spark: SparkSession, url: String): Seq[String] = {
    val path = new Path(url)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.isFile(path)) Seq(url)
    else {
      val it = fs.listFiles(path, /* recursive = */ true)
      val buf = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile) buf += st.getPath.toString
      }
      buf.toSeq.sorted
    }
  }

  /** Metadata directory for a main shard directory and suffix:
    * `/data/imgs` + `meta` → `/data/imgs_meta`
    * (reference datapipeline.py:386-391).
    */
  def metaDir(mainDir: String, suffix: String): String = {
    val trimmed = mainDir.stripSuffix("/")
    s"${trimmed}_$suffix"
  }

  /** Metadata shard path for a main shard path:
    * `/d/shard-000.tar` + `meta` → `/d_meta/shard-000_meta.tar`.
    */
  def metaShardPath(mainShard: String, suffix: String): String = {
    val slash = mainShard.lastIndexOf('/')
    val (dir, base) = (mainShard.substring(0, slash), mainShard.substring(slash + 1))
    val dot = base.lastIndexOf('.')
    val (stem, ext) = (base.substring(0, dot), base.substring(dot))
    s"${metaDir(dir, suffix)}/${stem}_$suffix$ext"
  }

  /** Left-semi filter of main shards by metadata existence (reference
    * `filter_with_meta_set` + set build, datapipeline.py:269-270,400-404):
    * keep main shards whose [[ShardExpand.shardKey]] appears in the
    * metadata listing's [[ShardExpand.refKey]] set.
    */
  def semiFilterByMeta(mainShards: Seq[String], metaShards: Seq[String],
      suffix: String): Seq[String] = {
    val metaKeys = metaShards.map(p => stripMetaDirSuffix(ShardExpand.refKey(p, suffix), suffix)).toSet
    mainShards.filter(p => metaKeys.contains(ShardExpand.shardKey(p)))
  }

  /** Normalizes a meta shard's key back into main-shard key space by
    * removing the `_suffix` from its parent directory name.
    */
  private def stripMetaDirSuffix(key: String, suffix: String): String = {
    val slash = key.lastIndexOf('/')
    if (slash <= 0) key
    else {
      val dir = key.substring(0, slash)
      val rest = key.substring(slash)
      (if (dir.endsWith(s"_$suffix")) dir.dropRight(suffix.length + 1) else dir) + rest
    }
  }
}
