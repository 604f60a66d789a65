package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Data-skipping evidence for the curve layouts (driver-side tooling,
  * like Bench): lays lineitem out four ways — LINEAR (round-robin
  * insertion order), PSORT (range-sorted by l_partkey only), ZORDER
  * (Morton curve over partkey×suppkey), HILBERT (continuous curve,
  * same dims) — with small row groups so
  * parquet min/max pruning has granularity at sub-GB scale (at 100 TB
  * the default 128 MiB row group plays this role), then measures ROWS
  * SCANNED (the parquet reader's output rows: what survived row-group
  * and page pruning) for three predicates: a 2-D box, a partkey-only
  * range, and a suppkey-only range.
  *
  * The claim under test (ZOrder scaladoc): a single-dim sort prunes
  * its own dimension and nothing else; the z-layout prunes BOTH
  * dimensions from one copy of the data. All nine (layout, predicate)
  * cells must agree on the aggregate — skipping may never change an
  * answer. Prints one JSON line with rows-scanned per cell and each
  * layout's fraction of the full table.
  *
  * AQE is off in this session only so the executed plan's scan leaves
  * are directly inspectable; the engine itself keeps AQE on.
  */
object LayoutScaleSmoke {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
    val total = li.count()
    val z = graft.functions.ZOrder.zOrder2(col("l_partkey"), col("l_suppkey"))
    val base = "target/layout-smoke"
    def write(df: DataFrame, name: String): String = {
      val p = s"$base/$name"
      df.write.mode("overwrite")
        .option("parquet.block.size", 256 << 10)
        .option("parquet.page.size", 64 << 10)
        .parquet(p)
      p
    }
    val linear = write(li.repartition(16), "linear")
    val psort = write(
      li.repartitionByRange(16, col("l_partkey"))
        .sortWithinPartitions(col("l_partkey")), "psort")
    val zorder = write(
      li.withColumn("__z__", z).repartitionByRange(16, col("__z__"))
        .sortWithinPartitions(col("__z__")).drop("__z__"), "zorder")
    // Hilbert key is a JVM kernel via UDF — evaluated at re-layout
    // (write) time only; scans never run it (HilbertCurve scaladoc)
    val hilbertUdf = udf((x: Long, y: Long) =>
      graft.functions.HilbertCurve.xy2d(16, x, y))
    val hilbert = write(
      li.withColumn("__h__", hilbertUdf(col("l_partkey"), col("l_suppkey")))
        .repartitionByRange(16, col("__h__"))
        .sortWithinPartitions(col("__h__")).drop("__h__"), "hilbert")

    // (answer, rows the parquet reader emitted = post-pruning scan size)
    def measure(path: String, pred: Column): (Long, Long) = {
      val df = spark.read.parquet(path).filter(pred)
        .agg(sum(col("l_quantity").cast("long")).as("q"), count(lit(1)).as("n"))
      val r = df.collect()(0)
      val scanned = df.queryExecution.executedPlan.collectLeaves()
        .collect { case s: FileSourceScanExec => s.metrics("numOutputRows").value }
        .sum
      (r.getLong(0), scanned)
    }

    val preds = Seq(
      "box" -> (col("l_partkey").between(20, 150) && col("l_suppkey").between(1, 8)),
      "part_only" -> col("l_partkey").between(20, 150),
      "supp_only" -> col("l_suppkey").between(1, 8))
    val layouts = Seq("linear" -> linear, "psort" -> psort,
      "zorder" -> zorder, "hilbert" -> hilbert)

    val cells = for ((pn, pred) <- preds) yield {
      val rs = for ((ln, lp) <- layouts) yield (ln, measure(lp, pred))
      val answers = rs.map(_._2._1).distinct
      require(answers.size == 1,
        s"layouts disagree on $pn: ${rs.map(r => r._1 -> r._2._1)}")
      pn -> rs.map { case (ln, (_, b)) => ln -> b }.toMap
    }

    val fields = cells.map { case (pn, m) =>
      // Locale.ROOT: a comma-decimal locale would emit unparseable JSON
      def frac(l: String) = String.format(java.util.Locale.ROOT, "%.4f",
        Double.box(m(l).toDouble / total))
      val names = layouts.map(_._1)
      s""""$pn":{""" +
        (names.map(l => s""""$l":${m(l)}""") ++
          names.map(l => s""""frac_$l":${frac(l)}""")).mkString(",") + "}"
    }.mkString(",")
    println(s"""{"metric":"layout_rows_scanned","sf":"$sfDir","total_rows":$total,$fields}""")
    spark.stop()
  }
}
