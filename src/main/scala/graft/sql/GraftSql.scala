package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.functions.{FastText, PortableHash}

/** SQL surface of the engine: registers the corpus tables as temp views
  * and the text/similarity kernels as SQL functions, so a user can drive
  * every capability through `spark.sql(...)` instead of the DataFrame
  * API — the same dual-surface contract Spark itself keeps between
  * `Dataset` operators and SQL.
  *
  * The registered UDFs are the [[FastText]] kernels — the same
  * bit-for-bit oracle twins the DataFrame queries use (FastTextSpec),
  * so a SQL user gets identical results to a DataFrame user. Scalar
  * kernels only: registration is per-session and idempotent.
  *
  * At 100 TB the views become catalog tables (the load path is
  * unchanged — see [[Tables.load]]); function registration is identical
  * on a cluster because the kernels are static JVM functions with no
  * driver-resident state.
  */
object GraftSql {

  /** Register every corpus table under `dir` as a temp view named after
    * the table. Re-registration just repoints the view (temp views are
    * lazy plans, not data copies).
    */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { n =>
      Tables.load(spark, dir, n).createOrReplaceTempView(n)
    }

  /** Register the scalar text/similarity kernels as SQL functions. */
  def registerFunctions(spark: SparkSession): Unit = {
    spark.udf.register("graft_token_count",
      (t: String) => FastText.tokensJvm(t).length)
    spark.udf.register("graft_quality_score",
      (t: String) => FastText.qualityScoreJvm(t))
    spark.udf.register("graft_lang_id",
      (t: String) => FastText.langIdJvm(t))
    spark.udf.register("graft_fingerprint",
      (t: String) => FastText.fingerprintJvm(t))
    spark.udf.register("graft_simhash",
      (t: String, bits: Int) => FastText.simhashJvm(t, bits))
    spark.udf.register("graft_det_hash",
      (t: String) => PortableHash.detHashJvm(t))
    spark.udf.register("graft_cosine",
      (a: Seq[Float], b: Seq[Float]) => FastText.cosineJvm(a, b))
    spark.udf.register("graft_pround",
      (x: Double, d: Int) => FastText.proundJvm(x, d))
    spark.udf.register("graft_zorder2",
      (x: Long, y: Long) => graft.functions.ZOrder.zOrder2Jvm(x, y))
    spark.udf.register("graft_hilbert2",
      (x: Long, y: Long) => graft.functions.HilbertCurve.xy2d(16, x, y))
    spark.udf.register("graft_nfc",
      (t: String) => graft.functions.TextFunctions.nfcJvm(t))
    spark.udf.register("graft_html_extract",
      (t: String) => graft.functions.TextFunctions.htmlExtractJvm(t))
    spark.udf.register("graft_url_canonical",
      (u: String) => graft.functions.UrlFunctions.canonicalizeUrlJvm(u))
    spark.udf.register("graft_pii_redact",
      (t: String) => graft.functions.TextFunctions.redactPiiJvm(t))
    spark.udf.register("graft_dedup_lines",
      (t: String) => graft.functions.TextFunctions.dedupLinesJvm(t))
    // binary decode kernels — the multimodal columns reachable from SQL
    // (null for undecodable payloads, same as the Column UDFs)
    spark.udf.register("graft_npy_decode",
      (b: Array[Byte]) =>
        if (b == null) None
        else scala.util.Try(graft.functions.NpyCodec.decodeNpy(b)).toOption)
    spark.udf.register("graft_wav_decode",
      (b: Array[Byte]) =>
        if (b == null) None
        else scala.util.Try(graft.functions.WavCodec.decodeWav(b)).toOption)
    spark.udf.register("graft_y4m_meta",
      (b: Array[Byte]) =>
        if (b == null) None
        else scala.util.Try(graft.functions.VideoCodec.decodeMeta(b)).toOption)
  }

  /** Register a snapshot-table version as a temp view — the manifest-
    * planned read (file list from ONE small JSON, DV masks applied)
    * reachable from `spark.sql`. Re-register to repoint at a different
    * version (time travel for SQL users).
    */
  def registerSnapshot(spark: SparkSession, name: String, table: String,
      version: Option[Long] = None): Unit =
    graft.sources.snapshot.SnapshotLog.read(spark, table, version)
      .createOrReplaceTempView(name)

  /** The snapshot table's file manifest as `<name>` — the Iceberg
    * `table.files` metadata view for SQL users (per-file rows, bytes,
    * DV presence, min/max/nulls for `cols`); metadata-only.
    */
  def registerSnapshotFiles(spark: SparkSession, name: String, table: String,
      cols: Seq[String] = Nil, version: Option[Long] = None): Unit =
    graft.sources.snapshot.SnapshotLog.fileManifest(spark, table, version, cols)
      .createOrReplaceTempView(name)

  /** One-call setup: views + functions. */
  def init(spark: SparkSession, dir: String): Unit = {
    registerTables(spark, dir)
    registerFunctions(spark)
  }

  /** Run a SQL query against the registered surface. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    init(spark, dir)
    spark.sql(query)
  }
}
