package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan contracts for representative gate queries: the
  * properties that make these plans survive a 100× scale-up, asserted
  * against the actual executed plans so a regression (a filter that
  * stops reaching the scan, a broadcast that silently becomes a
  * shuffle, a projection that rereads every column) fails a spec
  * instead of surfacing as a bench cliff.
  */
class PlanContractSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  private def planOf(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect() // let AQE finalize so the string shows the real plan
    // formatted mode prints scan details (PushedFilters, ReadSchema)
    // that the tree toString elides
    df.queryExecution.executedPlan.toString +
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q02: predicates and projection reach the parquet scan") {
    val p = planOf("q02_filter_project")
    assert(p.contains("PushedFilters:"), p.take(800))
    // both scan-level predicates pushed
    assert(p.contains("GreaterThan(l_quantity") && p.contains("EqualTo(l_returnflag"),
      p.take(1200))
    // unused wide columns never leave the scan
    assert(!p.contains("l_comment") && !p.contains("l_shipinstruct"))
  }

  test("q1b: fixed-cardinality dims broadcast, never shuffle") {
    val p = planOf("q1b_local_supplier_volume")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    // nation/region must not be on a shuffle exchange
    assert(!"Exchange hashpartitioning\\((n_nationkey|r_regionkey)".r
      .findFirstIn(p).isDefined, p)
  }

  test("q44: IVF assignment stays a scalar projection (no exchange before the probe join)") {
    val p = planOf("q44_ivf_search")
    // the NearestCentroid expression evaluates in-line; the only join is
    // the broadcast of the 1-row probe cell
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  test("q82: tar pushdown advertises its predicates on the scan") {
    val p = planOf("q82_wds_tar_pushdown")
    assert(p.contains("PushedFilters") || p.contains("wds-tar"), p.take(800))
  }

  test("q85: bucketed join runs with NO shuffle exchange on either side") {
    val p = planOf("q85_bucketed_join")
    assert(p.contains("SortMergeJoin"), p.take(800))
    // the co-location property: neither join side may hash-exchange
    assert(!"Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
      .findFirstIn(p).isDefined, s"join sides shuffled:\n${p.take(2000)}")
  }

  test("q28: sketch aggregate does partial (map-side) aggregation") {
    val p = planOf("q28_quantile_sketch")
    // ObjectHashAggregate with partial_ entries = map-side combine ran;
    // the exchange moves O(groups × capacity) state, not raw rows
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      p.take(800))
    assert(p.contains("partial_quantile_sketch") || p.contains("partial"),
      p.take(1200))
  }

  test("q75: type filter prunes hive partitions at the scan") {
    val p = planOf("q75_partitioned_scan")
    // the filter must land in PartitionFilters (directory pruning), not
    // as a post-scan Filter over all partitions
    assert(p.contains("PartitionFilters: [isnotnull(event_type"), p.take(2000))
  }

  test("q4a: persisted-IVF search prunes index partitions via the probe cell") {
    val p = planOf("q4a_ivf_persisted")
    // the scan over the cell-partitioned index must carry a DYNAMIC
    // partition-pruning expression fed by the broadcast probe join, so a
    // search reads ~1/k of the index directories, not all of them
    assert(p.contains("dynamicpruningexpression(centroid_id"), p.take(2000))
  }

  test("q4b: quantized coarse scan joins only the broadcast probe, no shuffle join") {
    val p = planOf("q4b_quantized_rerank")
    // the scored side must stream past a broadcast 1-row probe; a
    // SortMergeJoin here would shuffle the whole corpus per search
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
    // candidate selection and rerank are top-k limits, not global sorts
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
  }

  /** Hash-exchange count in the FINAL executed plan only (planOf
    * concatenates two renderings and AQE's toString repeats the initial
    * plan — both would double-count shuffles).
    */
  private def hashExchanges(q: String): Int = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    "Exchange hashpartitioning".r.findAllIn(finalPlan).length
  }

  test("q4c: PQ encode+ADC is join-free — zero hash exchanges before the top-k") {
    val p = planOf("q4c_pq_adc")
    // codebooks and the ADC table ride inside scalar expressions; the
    // whole query is scan → project → TakeOrdered
    assert(hashExchanges("q4c_pq_adc") == 0,
      s"PQ scan should not shuffle:\n${p.take(2000)}")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(!p.contains("Join"), p.take(1200))
  }

  test("q4d: IVFPQ search is cell-pruned + broadcast, never a shuffle join") {
    val p = planOf("q4d_ivfpq_search")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
  }

  test("q9l: digest-bucketed layout aggregates with zero hash exchanges") {
    val p = planOf("q9l_bucketed_dedup_layout")
    // the scan's bucket distribution must satisfy the groupBy(fp) —
    // an Exchange here means the layout bought nothing
    assert(hashExchanges("q9l_bucketed_dedup_layout") == 0,
      s"bucketed dedup shuffled:\n${p.take(2000)}")
    assert(p.contains("Bucketed: true"), p.take(2000))
  }

  test("q56: interval self-join co-partitions on the equi key, never a cartesian") {
    val p = planOf("q56_interval_pairs")
    // the range predicate must ride the user_id equi-join as a filter;
    // a range-only plan degenerates to BroadcastNestedLoop/cartesian
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
  }

  test("q9h: LM model is aggregated (map-side combined), never a window over a hot prefix") {
    val p = planOf("q9h_lm_bigram_score")
    // bigram/prefix counts must be AGGREGATIONS (partial combine kills
    // Zipf skew per task); a Window partitioned by w1 would pin every
    // stop-word-prefixed bigram on one reducer at scale
    assert(p.contains("partial_count") || p.contains("partial_sum"), p.take(1500))
    assert(!p.contains("Window"), s"LM counts regressed to a window:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("q9i: upsample rollup is one hash exchange with map-side combine") {
    val p = planOf("q9i_mixture_upsample")
    val exchanges = hashExchanges("q9i_mixture_upsample")
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n${p.take(2000)}")
    assert(p.contains("partial_count") || p.contains("partial_sum"), p.take(1200))
  }

  test("q9e: centroid reduction does partial aggregation after the explode") {
    val p = planOf("q9e_label_centroids")
    // the (label, dim) average must map-side combine (partial_avg) so
    // the exchange carries one cell per (label, dim, partition), not one
    // row per vector element — the property that makes a 100 TB vector
    // reduction one bounded shuffle
    assert(p.contains("partial_avg"), p.take(1200))
    assert(p.contains("Generate posexplode"), p.take(1200))
  }

  test("qa0/qa1: decode scans are partition-per-shard with only the member column read") {
    // one InputPartition per tar (the distribution unit): 4 fixture shards
    val npy = SparkEntry.queries("qa0_npy_decode")(spark, sf)
    val wav = SparkEntry.queries("qa1_wav_decode")(spark, sf)
    val pN = planOf("qa0_npy_decode")
    // the tar scan must not buffer undeclared columns; the npy fixture
    // declares only the npy extension, so the read schema is key + npy
    assert(pN.contains("wds-tar"), pN.take(800))
    assert(npy.collect().length == 1 && wav.collect().length == 1)
  }

  test("q97 and q9c share ONE staged span derivation (cache reuse in both plans)") {
    // both consumers must read TextStaging.spanStats8's InMemoryRelation
    // rather than re-deriving the posting shuffle — the staging contract
    val p97 = planOf("q97_dup_spans")
    val p9c = planOf("q9c_curation_v2")
    assert(p97.contains("InMemoryTableScan") || p97.contains("TableCacheQueryStage"),
      s"q97 no longer reads the staged span stats:\n${p97.take(1200)}")
    assert(p9c.contains("InMemoryTableScan") || p9c.contains("TableCacheQueryStage"),
      s"q9c no longer reads the staged span stats:\n${p9c.take(1200)}")
    // (an InMemoryRelation's toString embeds its one-time build plan,
    // so the posting explode TEXT still appears — the contract is the
    // TableCacheQueryStage leaf, which proves the consumer reads cached
    // rows instead of re-running that build)
  }

  test("q33 reads the staged shingle4 frame (no second md5 kernel pass)") {
    val p = planOf("q33_ngram_jaccard")
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      s"q33 no longer reads the staged shingle frame:\n${p.take(1200)}")
  }

  test("qa9: zip meta join plan has NO join and NO exchange below the aggregate") {
    // the zero-shuffle contract: metadata meets the main table inside
    // the partition reader, so nothing joins or shuffles until the
    // final aggregate's single-partition reduction
    val p = planOf("qa9_zip_meta_join")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("ShuffledHashJoin"),
      s"zip meta join must not join:\n${p.take(1200)}")
    // the only exchange allowed is the final SinglePartition gather for
    // the global aggregate
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 0, s"zip meta join must not hash-shuffle:\n${p.take(1200)}")
  }

  test("qah: both box predicates push to the z-ordered layout scan") {
    // the layout exists so that min/max stats prune in BOTH dims; that
    // only happens if both range predicates reach the parquet reader
    val p = planOf("qah_zorder_skipping")
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(l_partkey,20)") &&
      p.contains("LessThanOrEqual(l_suppkey,8)"),
      s"box predicates not pushed to the z-layout scan:\n${p.take(1500)}")
    // and the layout itself is 8 curve-sorted files (one range exchange
    // at build, zero at read)
    val files = new java.io.File(
      s"target/layout-zorder-${Integer.toHexString(sf.hashCode)}")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 8, s"z-layout file count $files != 8")
  }

  test("qaj: CDC merge resolves by AGGREGATION with map-side partials, never a window") {
    // the scaladoc's scale claim: latest-wins is max_by partial-agg
    // (combinable, skew-splittable); a Window here would pin every
    // version of a hot key on one reducer
    val p = planOf("qaj_cdc_merge")
    assert(!p.contains("Window"), s"CDC merge regressed to a window:\n${p.take(1200)}")
    assert(p.contains("partial"), s"CDC merge lost map-side combine:\n${p.take(1200)}")
  }

  test("qa8: packed scan keeps the wds-tar leaf (packing is planning-only)") {
    val p = planOf("qa8_packed_scan")
    assert(p.contains("wds-tar"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("qay: snapshot pruned read pushes the residual range to the parquet scan") {
    // manifest pruning picks the files; the residual predicate must
    // still reach the row-group level of the files that ARE read, and
    // the read plan must stay exchange-free (scan → aggregate only)
    val p = planOf("qay_snapshot_pruning")
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(l_orderkey") &&
      p.contains("LessThanOrEqual(l_orderkey"),
      s"residual range not pushed to the snapshot scan:\n${p.take(1500)}")
  }

  test("qb2: incremental manifest-diff read plans a plain file scan, no join") {
    val p = planOf("qb2_snapshot_changes")
    assert(!p.contains("Join"), s"readChanges should be a scan:\n${p.take(1200)}")
    assert(p.contains("partial"), s"aggregate lost map-side combine:\n${p.take(1200)}")
  }

  test("qbe: semi-join fetch broadcasts the key batch, never shuffles the table side") {
    // manifest candidacy already cut the scan to 2 files; the residual
    // semi-join must be a broadcast build over the (small) key batch —
    // a SortMergeJoin here would re-shuffle the fetched data for no
    // reason
    val p = planOf("qbe_snapshot_semijoin")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"semi-join not broadcast:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin"), s"table side shuffled:\n${p.take(1500)}")
  }

  test("qbi: HTML extraction is one codegen projection — no UDF, no exchange") {
    val p = planOf("qbi_html_extract")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"extraction left codegen:\n${p.take(1200)}")
    assert(!p.contains("Exchange") || p.contains("rangepartitioning"),
      // only the output orderBy may exchange; the extraction itself is map-only
      s"unexpected exchange in a per-row pass:\n${p.take(1500)}")
  }

  test("qau/qav: rank assignment has no global window anywhere in the plan") {
    // the exact-split and epoch-shard ranks come from the distributed
    // GlobalIndex operator (range exchange + per-partition offsets);
    // a row_number() OVER (ORDER BY ...) would funnel every id through
    // one task at 100 TB
    Seq("qau_exact_split", "qav_epoch_shards").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("Window"), s"$q regressed to a global window:\n${p.take(1500)}")
    }
  }

  test("qbh: block excision elects survivors by aggregation, never a window") {
    val p = planOf("qbh_dup_block_excise")
    // first-occurrence election must be a combiner-friendly min() — a
    // row_number window partitioned by block would pin a Zipf
    // boilerplate block (the footer that appears a billion times at
    // 100 TB) onto one reducer's sort
    assert(p.contains("partial_min") || p.contains("partial_count"),
      s"election lost map-side combine:\n${p.take(1500)}")
    assert(!p.contains("Window"),
      s"excision regressed to a window over the block key:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("qbv: PII redaction is one codegen projection — no UDF, no exchange") {
    val p = planOf("qbv_pii_redact")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"redaction left codegen:\n${p.take(1200)}")
    assert(!p.contains("Exchange") || p.contains("rangepartitioning"),
      // only the output orderBy may exchange; the scrub itself is map-only
      s"unexpected exchange in a per-row pass:\n${p.take(1500)}")
  }

  test("qbw: static-set excision is a stateless projection — the property that lets it stream") {
    // the scrub is segment→probe→rebuild per row against a BROADCAST
    // digest-set: no aggregate, no join, no window, no exchange — which
    // is exactly why the SAME plan runs on a continuous stream with no
    // state store (inspected on the batch twin; the plans are one)
    val d = graft.core.Tables.load(spark, sf, "documents")
    val df = graft.streaming.StreamOps.streamingBlockExcise(
      d, 8, Seq("a b c d e f g h"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window") && !p.contains("Join") &&
      !p.contains("Aggregate") && !p.contains("Exchange"),
      s"stateless scrub grew state:\n${p.take(1500)}")
    assert(!p.contains("BatchEvalPython"), s"python in plan:\n${p.take(1200)}")
    // the banned set must ride the broadcast, NEVER the plan: no block
    // text embedded anywhere in the physical plan string
    assert(!p.contains("a b c d e f g h"),
      s"banned set leaked into the plan as a literal:\n${p.take(1500)}")
  }

  test("qbw: a 100k-block banned set leaves the plan size unchanged (broadcast, not literal)") {
    // the literal-array form this replaced serialized every banned
    // block into the plan — at 1e5 blocks that plan is megabytes and
    // every task re-deserializes it; the broadcast digest-set plan must
    // not grow with the set at all
    val d = graft.core.Tables.load(spark, sf, "documents").limit(50)
    val small = graft.streaming.StreamOps.streamingBlockExcise(d, 8, Seq("zz yy"))
    val big = graft.streaming.StreamOps.streamingBlockExcise(d, 8,
      (0 until 100000).map(i => s"banned block number $i of the large set"))
    val ps = small.queryExecution.executedPlan.toString
    val pb = big.queryExecution.executedPlan.toString
    assert(math.abs(ps.length - pb.length) < 200,
      s"plan grew with the banned set: ${ps.length} -> ${pb.length}")
    assert(!pb.contains("banned block number"),
      "banned entries embedded in the plan")
    big.collect() // and it executes
  }

  test("qbc: BPE apply is a pure codegen projection — no join, no UDF in the plan") {
    // the K learned rules fold into one replace() chain: the only
    // exchange is the final token aggregation, and nothing leaves
    // whole-stage codegen for an interpreter
    val p = planOf("qbc_bpe_apply")
    assert(!p.contains("Join"), s"BPE apply should be map-only:\n${p.take(1200)}")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"BPE apply left codegen:\n${p.take(1200)}")
    assert(p.contains("partial"), s"token aggregation lost map-side combine:\n${p.take(1200)}")
  }

  test("zOrderK and prefix-stripped ord64 are codegen projections, no UDF boundary") {
    // the clustering keys every zorder write computes scan-side: a
    // UDF here would put an interpreter call on EVERY ROW of EVERY
    // re-layout at 100 TB
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 1000).select(
      (col("id") % 100).as("a"), (col("id") % 37).as("b"),
      (col("id") % 11).as("c"), (col("id") % 7).as("d"),
      concat(lit("https://corpus.example/"),
        (col("id") % 5).cast("string")).as("s"))
    for (k <- 2 to 4) {
      val cols = Seq(col("a"), col("b"), col("c"), col("d")).take(k)
      val q = df.select(graft.functions.ZOrder.zOrderK(cols).as("z"))
      q.collect()
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
        s"zOrderK(k=$k) left codegen:\n${p.take(800)}")
      assert(p.contains("*("), s"zOrderK(k=$k) has no codegen stage:\n${p.take(800)}")
    }
    val q2 = df.select(
      graft.functions.StringOrd.ord64After(col("s"), "https://").as("o"))
    q2.collect()
    val p2 = q2.queryExecution.executedPlan.toString
    assert(!p2.contains("BatchEvalPython") && !p2.contains("ScalaUDF"),
      s"ord64After left codegen:\n${p2.take(800)}")
    assert(p2.contains("*("), s"ord64After has no codegen stage:\n${p2.take(800)}")
  }
}
