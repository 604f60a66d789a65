package graft.sources

/** Brace-range shard expansion and shard-path keying — the pure,
  * driver-side half of the listing layer (SURVEY.md §2.1).
  *
  * Semantics match the reference exactly, including the zero-padding
  * format rules and error cases
  * (reference sdata/custom_datapipes.py:39-66 `_shard_expand`;
  * sdata/datapipeline.py:260-274 key derivation).
  */
object ShardExpand {

  private val BracePattern = """\{(\d+)\.\.(\d+)\}""".r

  /** Expand `ds-{000000..001199}.tar` → 1200 paths.
    *
    * Rules (reference custom_datapipes.py:48-60):
    *  - exactly one `{lo..hi}` group must be present;
    *  - lo <= hi;
    *  - lo and hi must be zero-padded to the same width, and each
    *    expansion is rendered at that width.
    */
  def expand(pattern: String): Seq[String] = {
    val ms = BracePattern.findAllMatchIn(pattern).toList
    ms match {
      case Nil => throw new IllegalArgumentException(
        s"no brace pattern of the form {lo..hi} in: $pattern")
      case m :: Nil =>
        val (loS, hiS) = (m.group(1), m.group(2))
        if (loS.length != hiS.length) throw new IllegalArgumentException(
          s"inconsistent zero-padding in brace pattern: $pattern")
        val (lo, hi) = (loS.toLong, hiS.toLong)
        if (lo > hi) throw new IllegalArgumentException(
          s"empty brace range (lo > hi): $pattern")
        val width = loS.length
        (lo to hi).map { i =>
          pattern.substring(0, m.start) +
            s"%0${width}d".format(i) +
            pattern.substring(m.end)
        }
      case _ => throw new IllegalArgumentException(
        s"multiple brace patterns in: $pattern")
    }
  }

  /** True iff the string contains a valid-looking brace pattern
    * (reference datapipeline.py:357-366 detection step).
    */
  def isBraceExpand(s: String): Boolean = BracePattern.findFirstIn(s).isDefined

  /** flatMap of [[expand]] over a url list, passing non-pattern urls
    * through (reference `CustomShardExpanderIterDataPipe`,
    * custom_datapipes.py:69-105).
    */
  def expandAll(urls: Seq[String]): Seq[String] =
    urls.flatMap(u => if (isBraceExpand(u)) expand(u) else Seq(u))

  /** Keep only `.tar` paths (reference datapipeline.py:207-210). */
  def tarFilter(path: String): Boolean = path.endsWith(".tar")

  /** Shard key for a path: `dirname/stem` — the join key used for
    * shard-level metadata zips (reference `map_to_tuple`,
    * datapipeline.py:260-266).
    */
  def shardKey(path: String): String = stripExtension(path)

  /** Join key for a *metadata* shard path: strips the `_suffix` before
    * the extension (reference `get_ref_key`, datapipeline.py:273-274),
    * so `dir_meta/shard-000_meta.tar` keys as `dir_meta/shard-000`.
    */
  def refKey(path: String, suffix: String): String = {
    val noExt = stripExtension(path)
    if (noExt.endsWith(s"_$suffix")) noExt.dropRight(suffix.length + 1) else noExt
  }

  /** Filename stem of a tar member path — the per-sample group key
    * (reference `grouper`, datapipeline.py:213-216): basename up to the
    * first dot.
    */
  def sampleKey(memberPath: String): String = {
    val base = memberPath.substring(memberPath.lastIndexOf('/') + 1)
    val dot = base.indexOf('.')
    if (dot < 0) base else base.substring(0, dot)
  }

  /** Extension part of a tar member path relative to its sample stem:
    * everything after the first dot of the basename (reference
    * `Dataset2SamplesConverter`, custom_datapipes.py:301-315 — keys are
    * member names with the shared stem + dot stripped).
    */
  def memberExtension(memberPath: String): String = {
    val base = memberPath.substring(memberPath.lastIndexOf('/') + 1)
    val dot = base.indexOf('.')
    if (dot < 0) "" else base.substring(dot + 1)
  }

  private def stripExtension(path: String): String = {
    val slash = path.lastIndexOf('/')
    val dot = path.lastIndexOf('.')
    if (dot > slash) path.substring(0, dot) else path
  }
}
