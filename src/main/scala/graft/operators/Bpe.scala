package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed merge-rule training over a
  * word-frequency table, and a pure-expression (codegen) apply path.
  *
  * The 100 TB shape, and why this scales where a naive port would not:
  * BPE training never touches the corpus after ONE aggregation — the
  * classic algorithm (Sennrich et al. 2016) trains on `(word, count)`
  * pairs, so the corpus collapses to a vocabulary-sized table first
  * (`wordCounts`, one shuffle), and every merge iteration is a small
  * aggregation over that table. Loop state is vocab-sized, never
  * corpus-sized; only the ONE winning pair per iteration reaches the
  * driver. Applying learned merges is a fold of `replace` calls — a
  * single whole-stage-codegen expression with no join, no UDF, no
  * per-row interpreter.
  *
  * Merge semantics are the standard left-to-right non-overlapping scan.
  * Symbol sequences render as strings with a TWO-space separator, so
  * one `replace(' '||repr||' ', ' l  r ', ' lr ')` call merges every
  * non-overlapping occurrence in one pass: each adjacent pair owns its
  * boundary spaces under the double-space convention, which makes plain
  * sequential `replace` agree exactly with the reference algorithm
  * (including the `a a a -> aa a` overlap case — verified in BpeSpec).
  * Symbols never contain whitespace, so the encoding is unambiguous.
  */
object Bpe {

  /** End-of-word marker symbol (the Sennrich convention: makes word
    * boundaries recoverable from the token stream).
    */
  val EndOfWord = "</w>"

  /** Symbol separator inside a representation string. Two spaces — see
    * the class doc for why double, not single.
    */
  val Sep = "  "

  final case class Merge(rank: Int, lhs: String, rhs: String, count: Long)

  /** Word-frequency table from a text column: lowercased whitespace
    * tokens restricted to `wordPattern`, top `vocabLimit` by
    * (count desc, word asc) — the one corpus-sized pass of the whole
    * algorithm. The pattern default keeps the symbol alphabet plain
    * (BPE itself only requires symbols to be whitespace-free).
    */
  def wordCounts(docs: DataFrame, textCol: String, vocabLimit: Int,
      wordPattern: String = "^[a-z]+$"): DataFrame =
    docs.select(explode(graft.functions.TextFunctions.tokens(
        lower(col(textCol)))).as("word"))
      .where(col("word").rlike(wordPattern))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("word")).limit(vocabLimit)

  /** Initial representation of a word: its characters separated by
    * [[Sep]], closed by the [[EndOfWord]] symbol. The empty-string
    * filter matters: Spark's `split` keeps a trailing empty element
    * (limit -1 semantics) that would corrupt the symbol stream.
    */
  def initRepr(word: Column): Column =
    concat(array_join(filter(split(word, ""), c => length(c) > lit(0)), Sep),
      lit(Sep), lit(EndOfWord))

  /** Adjacent symbol pairs of a representation, each rendered as
    * `l + Sep + r`. Empty when the word is already a single symbol
    * (slice of non-positive length is an empty array, so the zip is
    * total — no branch).
    */
  def pairStrings(repr: Column): Column = {
    val a = split(repr, Sep)
    zip_with(
      slice(a, lit(1), size(a) - 1),
      slice(a, lit(2), size(a) - 1),
      (l, r) => concat(l, lit(Sep), r))
  }

  /** One merge application as a Column expression: replace every
    * non-overlapping ` l  r ` with ` lr ` under single-space padding.
    * Plain `replace` (all occurrences, sequential scan) — codegen'd.
    */
  private def applyOne(repr: Column, lhs: String, rhs: String): Column =
    trim(call_function("replace",
      concat(lit(" "), repr, lit(" ")),
      lit(" " + lhs + Sep + rhs + " "),
      lit(" " + lhs + rhs + " ")))

  /** Train `numMerges` merge rules over a `(word, cnt)` table. Each
    * iteration: count adjacent pairs weighted by word frequency, take
    * the (count desc, pair asc) argmax — ONE row to the driver — and
    * fold the merge into the representations. The working table is
    * persisted per round and vocab-sized throughout. Returns the
    * learned merges in rank order plus the final `(word, cnt, repr)`
    * frame (persisted; caller unpersists).
    */
  def train(words: DataFrame, numMerges: Int): (Seq[Merge], DataFrame) = {
    // only the WORD TABLE is cached: iteration i's lineage is i folded
    // replace() calls over that cache — vocab-sized codegen work, far
    // cheaper than a persist/materialize round per iteration. One job
    // per iteration (the argmax), plus one to seed and one to land.
    val base = words.persist()
    base.count()
    var cur = base.withColumn("repr", initRepr(col("word")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    var rank = 1
    while (rank <= numMerges && !exhausted) {
      val best = cur
        .select(explode(pairStrings(col("repr"))).as("pair"), col("cnt"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("n"))
        .orderBy(desc("n"), asc("pair")).limit(1).collect()
      if (best.isEmpty) exhausted = true // every word fully merged
      else {
        val pair = best(0).getString(0)
        val Array(lhs, rhs) = pair.split(Sep, 2)
        merges += Merge(rank, lhs, rhs, best(0).getLong(1))
        cur = cur.withColumn("repr", applyOne(col("repr"), lhs, rhs))
        rank += 1
      }
    }
    val fin = cur.persist()
    fin.count()
    base.unpersist()
    (merges.toSeq, fin)
  }

  /** Tokenize a word column with learned merges: the production apply
    * path — a fold of K `replace` calls into one codegen expression,
    * returning the token array. No join, no UDF; at corpus scale this
    * is a map-only stage. Provably equal to the trainer's final
    * representations (pinned by BpeSpec and the qbc gate).
    */
  def applyMerges(word: Column, merges: Seq[Merge]): Column = {
    val folded = merges.foldLeft(initRepr(word))((r, m) =>
      applyOne(r, m.lhs, m.rhs))
    split(folded, Sep)
  }

  /** Persist learned rules beside the corpus (one parquet of
    * rank/lhs/rhs/count — the tokenizer ships WITH the data, like a
    * tokenizer.json). Rank order is the load-bearing part: merges must
    * replay in training order, so load sorts by rank and save refuses
    * a non-contiguous ranking.
    */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge], path: String): Unit = {
    require(merges.map(_.rank) == (1 to merges.size),
      s"merge ranks must be contiguous from 1, got ${merges.map(_.rank)}")
    import spark.implicits._
    merges.map(m => (m.rank, m.lhs, m.rhs, m.count))
      .toDF("rank", "lhs", "rhs", "count")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Merge] =
    spark.read.parquet(path)
      .select(col("rank"), col("lhs"), col("rhs"), col("count"))
      .collect() // vocabulary-sized model state, not data
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.rank).toSeq
}
