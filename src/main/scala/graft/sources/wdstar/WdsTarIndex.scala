package graft.sources.wdstar

/** Sample-offset index sidecar for wds-tar shards — the random-access
  * half of the format (public precedent: webdataset's "wids" index
  * files serve exactly this role for PyTorch loaders). A shard written
  * with `option("index", "true")` gets a `<shard>.tar.idx` sibling:
  * one line per sample, `<byte offset of the sample's first member
  * header>\t<sample key>`, in write (= tar) order. The sidecar commits
  * atomically with its shard (same tmp + rename-on-commit protocol),
  * so a visible shard either has a correct index or none.
  *
  * Read side ([[WdsTarIndexedReader]]): when `__key__` predicates are
  * pushed and the sidecar exists, the reader filters the index (a few
  * KB) and SEEKS to each surviving sample — a selective read touches
  * only the bytes of matching samples plus the index, and a shard with
  * zero matches is never opened at all. On object storage that is the
  * difference between ranged GETs of the hit set and streaming the
  * whole corpus: the 100 TB "fetch these samples" path. Without
  * pushed key predicates (or without the sidecar) scans stream
  * sequentially exactly as before — the index is an accelerator, never
  * a correctness dependency; offsets are verified against the stem
  * read at the seek target and a mismatch fails loudly (or skips the
  * shard under `errorPolicy=skip`), so a stale hand-edited index can
  * not silently mis-assemble samples.
  */
object WdsTarIndex {

  /** Sidecar path for a shard path. */
  def indexPath(shardPath: String): String = shardPath + ".idx"

  def render(entries: Seq[(Long, String)]): Array[Byte] =
    entries.map { case (off, key) => s"$off\t$key" }
      .mkString("", "\n", if (entries.isEmpty) "" else "\n")
      .getBytes("UTF-8")

  def parse(bytes: Array[Byte]): Seq[(Long, String)] =
    new String(bytes, "UTF-8").split("\n").toSeq
      .filter(_.nonEmpty)
      .map { line =>
        val tab = line.indexOf('\t')
        require(tab > 0, s"wds-tar index: malformed line '$line'")
        (line.substring(0, tab).toLong, line.substring(tab + 1))
      }
}
