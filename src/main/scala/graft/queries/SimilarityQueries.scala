package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.FastText
import graft.functions.SimilarityFunctions._
import graft.plans.CosineSim.cosineSim

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force cosine top-k, LSH-bucketed ANN, and blocked near-dup
  * pair mining.
  */
object SimilarityQueries extends QueryPack {

  private val Dim = 64
  // Fixed plane count for the q43 bucket-histogram DIAGNOSTIC only — its
  // output schema is the histogram itself, so the bucket vocabulary must
  // be stable across scale factors. Search/mining queries (q41/q42)
  // derive their plane count from the corpus size instead.
  private val Planes = 4
  private val ProbeId = 0L
  private val IvfK = 16
  private val IvfSeed = 21

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Corpus-adaptive plane count (planes ~ log2(n/targetBucket)): the
    * count() is a metadata-cheap parquet job; the plane count is model
    * state derived on the driver, like the IVF centroids.
    */
  private def planesFor(s: SparkSession, dir: String): Int =
    adaptivePlanes(emb(s, dir).count())

  /** Write-once guard for the q4a persisted IVF index (same staging
    * discipline as DedupQueries.verifiedPairs): the cell-partitioned
    * parquet table is built once per (session, corpus) and every search
    * reads it back with partition pruning.
    */
  private val ivfIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  private def ivfIndexPath(s: SparkSession, dir: String): String =
    ivfIndexCache.computeIfAbsent((s, dir), { _ =>
      val p = s"target/ivf-index-${Integer.toHexString(dir.hashCode)}"
      ivfAssign(emb(s, dir), "embedding", "vec_id", k = IvfK, seed = IvfSeed)
        .write.mode("overwrite").partitionBy("centroid_id").parquet(p)
      p
    })

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-label centroid vectors via posexplode → (label, dim) hash
    // aggregation — the scalable layout for vector reductions: every
    // (label, dimension) cell is an independent aggregate, so a 100 TB
    // embedding table reduces in one shuffle with no single-reducer
    // array fold and no driver-resident vectors (contrast the IVF
    // centroids, which are intentionally tiny model state).
    "q9e_label_centroids" -> ((s, dir) => {
      import s.implicits._
      emb(s, dir)
        .select($"label", posexplode($"embedding").as(Seq("pos", "v")))
        .groupBy($"label", $"pos")
        .agg(graft.functions.Portable.pround(avg($"v".cast("double")), 5).as("centroid"))
        .orderBy($"label", $"pos")
    }),
    // Brute-force cosine top-10 against the vec_id=0 probe vector.
    // The probe row is a 1-row broadcast cross join — no shuffle of the
    // scored side; final top-k is a tree-reduced limit.
    "q40_cosine_topk" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
      val probe = e.filter($"vec_id" === ProbeId)
        .select($"embedding".as("probe_vec"))
      val scored = e.filter($"vec_id" =!= ProbeId)
        .crossJoin(broadcast(probe))
        .select($"vec_id", cosineSim($"embedding", $"probe_vec").as("score"))
      scored.orderBy($"score".desc, $"vec_id").limit(10)
    }),

    // LSH-bucketed ANN: probe only scans its own sign-pattern bucket.
    // Plane count adapts to corpus size (see planesFor) — pinning it
    // would make buckets, and so probe work, grow linearly with n.
    "q41_ann_lsh" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
        .withColumn("bucket", FastText.lshBucketUdf(planesFor(s, dir), Dim)($"embedding"))
      val probe = e.filter($"vec_id" === ProbeId)
        .select($"bucket".as("probe_bucket"), $"embedding".as("probe_vec"))
      e.filter($"vec_id" =!= ProbeId)
        .join(broadcast(probe), $"bucket" === $"probe_bucket")
        .select($"vec_id", $"bucket",
          cosineSim($"embedding", $"probe_vec").as("score"))
        .orderBy($"score".desc, $"vec_id")
        .limit(5)
    }),

    // Embedding near-dup pairs, blocked by LSH bucket. Blocking on the
    // sign-pattern bucket (not a data label) bounds pair work by bucket
    // size; the plane count is DERIVED from the corpus size
    // (planes ~ log2(n/64), adaptivePlanes) so expected bucket size — and
    // with it per-bucket pair cost — stays O(1) as n grows, instead of
    // the quadratic blowup a pinned plane count gives at 100× scale.
    "q42_embedding_neardup" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
        .withColumn("bucket", FastText.lshBucketUdf(planesFor(s, dir), Dim)($"embedding"))
        .select($"bucket", $"vec_id", $"embedding")
      val a = e.select($"bucket", $"vec_id".as("a_id"), $"embedding".as("a_vec"))
      val b = e.select($"bucket", $"vec_id".as("b_id"), $"embedding".as("b_vec"))
      a.join(b, Seq("bucket"))
        .filter($"a_id" < $"b_id")
        .select($"bucket", $"a_id", $"b_id", cosineSim($"a_vec", $"b_vec").as("cos"))
        .filter($"cos" >= 0.3)
        .orderBy($"bucket", $"a_id", $"b_id")
    }),

    // Semantic dedup, SemDeDup-shaped (Abbas et al. 2023, public):
    // cluster the embedding space, then prune near-duplicates WITHIN
    // each cluster — the clustering bounds pairwise work to cell-sized
    // blocks, which is what makes embedding dedup feasible at corpus
    // scale (the all-pairs form is quadratic). Deterministic survivor
    // rule (min-id: a vector is redundant iff an earlier-id vector in
    // its cell is cosine-closer than the threshold) instead of the
    // paper's greedy sequential scan, so both engines express it as a
    // cell-blocked self-join with no ordering dependence. The join
    // moves (cell, id, vec) — never payloads — and shuffles on the
    // cell id, the same skew-bounded shape as the LSH pair mining.
    "qab_semantic_dedup" -> ((s, dir) => {
      import s.implicits._
      val assigned = ivfAssign(emb(s, dir), "embedding", "vec_id",
        k = IvfK, seed = IvfSeed)
        .select($"centroid_id", $"vec_id", $"embedding")
      val x = assigned.select($"centroid_id",
        $"vec_id".as("x_id"), $"embedding".as("x_vec"))
      val y = assigned.select($"centroid_id",
        $"vec_id".as("y_id"), $"embedding".as("y_vec"))
      val redundant = x.join(y, Seq("centroid_id"))
        .filter($"y_id" < $"x_id" && cosineSim($"x_vec", $"y_vec") >= 0.3)
        .select($"x_id".as("vec_id")).distinct()
      assigned.join(redundant, Seq("vec_id"), "left_anti")
        .agg(
          count(lit(1)).as("n_survivors"),
          sum($"vec_id").as("survivor_id_sum"),
          countDistinct($"centroid_id").as("n_cells"))
    }),

    // Feature-hashing text embedding + similarity search — semantic-ish
    // retrieval with NO model: each document embeds as a 16-dim
    // hashing-trick bag-of-words (token → dim by portable hash, ±1 sign
    // hash, the Weinberger et al. 2009 construction), and the probe
    // document's top-5 cosine neighbors come back. Everything stays
    // sparse and integer until the final division: explode → (doc, dim,
    // ±1) → sum, probe dims broadcast (16 rows), dot/norm in one
    // grouped pass — no all-pairs, no dense vectors, no model state.
    "qad_hash_embed_topk" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val sparse = docs
        .select($"doc_id",
          explode(graft.functions.TextFunctions.tokens($"text")).as("tok"))
        .select($"doc_id",
          (graft.functions.PortableHash.detHash($"tok") % 16).as("dim"),
          (graft.functions.PortableHash.detHash($"tok", 7) % 2 * 2 - 1).as("sgn"))
        .groupBy($"doc_id", $"dim").agg(sum($"sgn").as("w"))
      val probe = sparse.filter($"doc_id" === 0L)
        .select($"dim".as("p_dim"), $"w".as("pw"))
      val probeNsq = probe.agg(sum($"pw" * $"pw").as("p_nsq"))
      sparse.filter($"doc_id" =!= 0L)
        .join(broadcast(probe), $"dim" === $"p_dim", "left")
        .groupBy($"doc_id")
        .agg(
          sum($"w" * coalesce($"pw", lit(0L))).as("dot"),
          sum($"w" * $"w").as("nsq"))
        .crossJoin(broadcast(probeNsq))
        .filter($"nsq" > 0)
        .select($"doc_id", graft.functions.Portable.pround(
          $"dot" / (sqrt($"nsq") * sqrt($"p_nsq")), 6).as("cos"))
        .orderBy($"cos".desc, $"doc_id")
        .limit(5)
    }),

    // Prototypicality pruning (the "beyond neural scaling laws" data-
    // pruning shape, Sorscher et al. 2022, public): keep the most
    // prototypical half of each embedding cell, ranked by cosine to the
    // cell's centroid. The rank window partitions by CELL — bounded,
    // cell-sized frames, never a global sort — and the centroid table
    // is broadcast model state (k rows). Micro-unit score sums keep the
    // hash integer-exact across engines.
    "qac_prototype_prune" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val e = emb(s, dir)
      val cents = ivfCentroids(e, "embedding", "vec_id", k = IvfK, seed = IvfSeed)
      val centDf = s.createDataFrame(cents.map { case (id, v) => (id, v.toSeq) })
        .toDF("centroid_id", "centroid_vec")
      val scored = ivfAssign(e, "embedding", "vec_id", k = IvfK, seed = IvfSeed)
        .join(broadcast(centDf), Seq("centroid_id"))
        .select($"centroid_id", $"vec_id",
          cosineSim($"embedding", $"centroid_vec").as("proto"))
      val ranked = scored
        .withColumn("rk", row_number().over(
          Window.partitionBy($"centroid_id").orderBy($"proto".desc, $"vec_id")))
        .withColumn("n", count(lit(1)).over(Window.partitionBy($"centroid_id")))
      ranked.filter($"rk" * 2 <= $"n" + 1) // ceil(n/2) per cell
        .agg(
          count(lit(1)).as("n_kept"),
          sum($"vec_id").as("kept_id_sum"),
          sum(floor($"proto" * 1e6 + 0.5).cast("long")).as("proto_um_sum"),
          countDistinct($"centroid_id").as("n_cells"))
    }),

    // IVF-style ANN: assign every vector to its nearest of k
    // deterministic centroids, then search only the probe's cell.
    "q44_ivf_search" -> ((s, dir) => {
      import s.implicits._
      val assigned = ivfAssign(emb(s, dir), "embedding", "vec_id", k = IvfK, seed = IvfSeed)
      val probeCell = assigned.filter($"vec_id" === ProbeId)
        .select($"centroid_id".as("probe_cell"), $"embedding".as("probe_vec"))
      assigned.filter($"vec_id" =!= ProbeId)
        .join(broadcast(probeCell), $"centroid_id" === $"probe_cell")
        .select($"vec_id", $"centroid_id",
          graft.plans.CosineSim.cosineSim($"embedding", $"probe_vec").as("score"))
        .orderBy($"score".desc, $"vec_id")
        .limit(5)
    }),

    // Persisted IVF index — the index-once / search-many shape: cell
    // assignments are materialized ONCE per (session, corpus) as a
    // cell-PARTITIONED parquet table, and the search joins the (1-row,
    // broadcast) probe cell against it, so dynamic partition pruning
    // reads only the probe's cell directory — at 100 TB a search touches
    // 1/k of the index files instead of re-assigning the whole corpus
    // per query (q44's shape). Same centroids (deterministic seed), same
    // result set, same oracle as q44.
    "q4a_ivf_persisted" -> ((s, dir) => {
      import s.implicits._
      val idx = s.read.parquet(ivfIndexPath(s, dir))
      val probeCell = idx.filter($"vec_id" === ProbeId)
        .select($"centroid_id".as("probe_cell"), $"embedding".as("probe_vec"))
      idx.filter($"vec_id" =!= ProbeId)
        .join(broadcast(probeCell), $"centroid_id" === $"probe_cell")
        .select($"vec_id", $"centroid_id".cast("int").as("centroid_id"),
          graft.plans.CosineSim.cosineSim($"embedding", $"probe_vec").as("score"))
        .orderBy($"score".desc, $"vec_id")
        .limit(5)
    }),

    // Int8 scalar-quantized coarse scan + exact rerank — the memory-
    // bandwidth path for brute-force search at 100 TB: vectors are
    // quantized per-row to int8 (symmetric maxabs scaling, 4× smaller
    // than float32, 8× smaller than the double math), candidates are
    // ranked by INTEGER dot products (exact, order-independent — no
    // float summation-order hazard in the coarse pass), and only the
    // top-20 survivors pay the exact float cosine. At scale the
    // quantized codes are the resident working set and the float
    // vectors page in for the rerank only — the standard SQ8 layout
    // (FAISS IndexScalarQuantizer topology). Quantized cosine needs no
    // scale factors: per-vector scales cancel in the normalized dot.
    "q4b_quantized_rerank" -> ((s, dir) => {
      import s.implicits._
      val qdot = (a: Column, b: Column) =>
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
      val e = emb(s, dir)
        .withColumn("maxabs", greatest(
          array_max(transform($"embedding".cast("array<double>"), x => abs(x))),
          lit(1e-30)))
        .withColumn("qvec", transform($"embedding".cast("array<double>"),
          x => floor(x * 127.0 / $"maxabs" + 0.5).cast("long")))
      val probe = e.filter($"vec_id" === ProbeId)
        .select($"qvec".as("probe_q"), $"embedding".as("probe_vec"))
      e.filter($"vec_id" =!= ProbeId)
        .crossJoin(broadcast(probe))
        .select($"vec_id", $"embedding", $"probe_vec",
          graft.functions.Portable.pround(
            qdot($"qvec", $"probe_q").cast("double") /
              (sqrt(qdot($"qvec", $"qvec").cast("double")) *
                sqrt(qdot($"probe_q", $"probe_q").cast("double"))), 6).as("qscore"))
        .orderBy($"qscore".desc, $"vec_id").limit(20)
        .select($"vec_id", $"qscore",
          cosineSim($"embedding", $"probe_vec").as("score"))
        .orderBy($"score".desc, $"vec_id").limit(5)
    }),

    // Product quantization + ADC scan: 8 subspaces × 16-entry codebooks
    // turn each 64-float vector into 8 small codes (32× smaller than
    // float32); the probe precomputes one 8×16 distance table and every
    // candidate scores with 8 TABLE LOOKUPS instead of 64 float mults —
    // the FAISS IndexPQ topology, and the standard coarse pass when even
    // SQ8 (q4b) is too much resident state at 100 TB. Codebooks are the
    // same seeded deterministic pick as the IVF centroids (k-means in a
    // real index — identical topology); encoding is m fused scalar
    // expressions ([[graft.plans.PqNearestSub]]): one scan, no join, no
    // exchange before the final top-k. ADC distances are exact integer
    // micro-units (each table entry rounds once to 1e-6, the 8-term sum
    // is a long) so ranking is summation-order-independent and
    // bit-portable to the oracle.
    "q4c_pq_adc" -> ((s, dir) => {
      import s.implicits._
      val SubLen = 8
      val M = Dim / SubLen // 8 subspaces
      val e = emb(s, dir)
      val cents = ivfCentroids(e, "embedding", "vec_id", k = IvfK, seed = IvfSeed)
      val books = cents.map(_._2) // code j = position in the seeded pick order
      val probeVec = e.filter($"vec_id" === ProbeId)
        .select($"embedding").collect().head.getSeq[Float](0).toArray
      val adcUm = (0 until M).map { sub =>
        val table = books.map { c =>
          (graft.plans.PqEncode.tableEntry(probeVec, c, sub * SubLen, SubLen) * 1e6)
            .round
        }
        element_at(typedLit(table),
          (graft.plans.PqEncode.code($"embedding", sub * SubLen, SubLen, books) + 1)
            .cast("int"))
      }.reduce(_ + _)
      e.filter($"vec_id" =!= ProbeId)
        .select($"vec_id", adcUm.as("adc_um"))
        .orderBy($"adc_um".asc, $"vec_id")
        .limit(5)
    }),

    // IVF + PQ combined (the FAISS IVFPQ topology): the coarse quantizer
    // prunes the scan to the probe's cell (1/k of the corpus) and ADC
    // codes rank what's left with table lookups — the two compressions
    // compose multiplicatively, which is how a 100 TB vector table
    // serves interactive searches: partition pruning × 32× smaller
    // resident codes. Same centroids as q44, same codebooks as q4c
    // (raw-vector codebooks — a production index encodes residuals, the
    // topology is identical), one scan, one broadcast 1-row join.
    "q4d_ivfpq_search" -> ((s, dir) => {
      import s.implicits._
      val SubLen = 8
      val M = Dim / SubLen
      val e = emb(s, dir)
      val cents = ivfCentroids(e, "embedding", "vec_id", k = IvfK, seed = IvfSeed)
      val books = cents.map(_._2)
      val probeVec = e.filter($"vec_id" === ProbeId)
        .select($"embedding").collect().head.getSeq[Float](0).toArray
      val adcUm = (0 until M).map { sub =>
        val table = books.map { c =>
          (graft.plans.PqEncode.tableEntry(probeVec, c, sub * SubLen, SubLen) * 1e6)
            .round
        }
        element_at(typedLit(table),
          (graft.plans.PqEncode.code($"embedding", sub * SubLen, SubLen, books) + 1)
            .cast("int"))
      }.reduce(_ + _)
      val assigned = ivfAssign(e, "embedding", "vec_id", k = IvfK, seed = IvfSeed)
      val probeCell = assigned.filter($"vec_id" === ProbeId)
        .select($"centroid_id".as("probe_cell"))
      assigned.filter($"vec_id" =!= ProbeId)
        .join(broadcast(probeCell), $"centroid_id" === $"probe_cell")
        .select($"vec_id", $"centroid_id", adcUm.as("adc_um"))
        .orderBy($"adc_um".asc, $"vec_id")
        .limit(5)
    }),

    // IVF cell histogram — partition balance diagnostic.
    "q45_ivf_cells" -> ((s, dir) => {
      import s.implicits._
      ivfAssign(emb(s, dir), "embedding", "vec_id", k = IvfK, seed = IvfSeed)
        .groupBy($"centroid_id")
        .agg(count(lit(1)).as("n"))
        .orderBy($"centroid_id")
    }),

    // IVF with nprobe=2: the probe searches its TWO nearest cells — the
    // standard IVF recall knob. Cell ranking happens driver-side over
    // the k centroid vectors (model state, not data); the scan stays a
    // single cell-pruned pass, no extra shuffle vs nprobe=1.
    "q46_ivf_nprobe" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
      val cents = ivfCentroids(e, "embedding", "vec_id", k = IvfK, seed = IvfSeed)
      val probeVec = e.filter($"vec_id" === ProbeId)
        .select($"embedding").collect().head.getSeq[Float](0).toArray
      val cells = cents
        .map { case (cid, cv) =>
          (cid, graft.functions.FastText.cosineJvm(probeVec.toSeq, cv.toSeq): Double)
        }
        .sortBy { case (cid, score) => (-score, cid) }
        .take(2).map(_._1)
      ivfAssign(e, "embedding", "vec_id", k = IvfK, seed = IvfSeed)
        .filter($"vec_id" =!= ProbeId && $"centroid_id".isin(cells: _*))
        .select($"vec_id", $"centroid_id",
          cosineSim($"embedding", typedLit(probeVec.toSeq)).as("score"))
        .orderBy($"score".desc, $"vec_id")
        .limit(5)
    }),

    // One k-means (Lloyd) refinement iteration over the IVF cells: the
    // per-cell mean vector in long form (cell, dim, mean). posexplode +
    // hash aggregate on (cell, dim) — fully parallel, shuffle volume
    // = dim × rows scalars, no vector ever crosses the wire whole.
    "q47_ivf_refine" -> ((s, dir) => {
      import s.implicits._
      ivfAssign(emb(s, dir), "embedding", "vec_id", k = IvfK, seed = IvfSeed)
        .select($"centroid_id", posexplode($"embedding").as(Seq("pos", "v")))
        .groupBy($"centroid_id", $"pos")
        .agg(graft.functions.Portable.pround(avg($"v"), 6).as("mean_v"),
          count(lit(1)).as("n"))
        .orderBy($"centroid_id", $"pos")
    }),

    // Multi-probe LSH: the probe scans its own sign-pattern bucket PLUS
    // the buckets reached by flipping the two planes with the smallest
    // projection margin — the query-directed probing sequence of
    // multi-probe LSH (Lv et al., VLDB'07): near-boundary planes are the
    // ones most likely to have split true neighbors away, so probing
    // their flips buys recall without adding planes (q41's recall knob
    // is more tables/fewer planes; this one is more probes, zero extra
    // index state). Margin ranking happens driver-side over the probe's
    // p projections (model-sized state); the scan stays one bucket-
    // pruned pass over 3 of 2^p buckets — no shuffle, no row expansion.
    "q48_multiprobe_lsh" -> ((s, dir) => {
      import s.implicits._
      val e0 = emb(s, dir)
      val p = planesFor(s, dir)
      val planes = hyperplanes(p, Dim)
      val probeVec = e0.filter($"vec_id" === ProbeId)
        .select($"embedding").collect().head.getSeq[Float](0).toArray
      // projections in the same sequential-double op order as the
      // bucket kernel, so signs and margins agree with the oracle
      val projs = planes.map { pl =>
        var acc = 0.0; var i = 0
        while (i < pl.length) { acc += probeVec(i) * pl(i); i += 1 }
        acc
      }
      val own = FastText.lshBucketJvm(probeVec.toSeq, planes)
      val flips = projs.zipWithIndex
        .map { case (pr, j) => (math.abs(pr), j) }
        .sorted.take(2).map(_._2)
      val targets = own +: flips.map(j => own ^ (1L << j))
      e0.filter($"vec_id" =!= ProbeId)
        .withColumn("bucket", FastText.lshBucketUdf(p, Dim)($"embedding"))
        .filter($"bucket".isin(targets.toIndexedSeq: _*))
        .select($"vec_id", $"bucket",
          cosineSim($"embedding", typedLit(probeVec.toSeq)).as("score"))
        .orderBy($"score".desc, $"vec_id")
        .limit(5)
    }),

    // ANN quality measurement INSIDE the engine: recall@5 of the
    // bucket-pruned LSH search against the exact brute-force top-5 —
    // the metric that says whether the plane count / probe budget is
    // right for this corpus. Both sides are tiny top-k frames; the
    // intersect is driver-trivial.
    "q49_ann_recall" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
        .withColumn("bucket", FastText.lshBucketUdf(planesFor(s, dir), Dim)($"embedding"))
      val probe = e.filter($"vec_id" === ProbeId)
        .select($"bucket".as("probe_bucket"), $"embedding".as("probe_vec"))
      val scored = e.filter($"vec_id" =!= ProbeId)
        .crossJoin(broadcast(probe))
        .select($"vec_id", $"bucket", $"probe_bucket",
          cosineSim($"embedding", $"probe_vec").as("score"))
      val brute = scored.orderBy($"score".desc, $"vec_id").limit(5).select($"vec_id")
      val lsh = scored.filter($"bucket" === $"probe_bucket")
        .orderBy($"score".desc, $"vec_id").limit(5).select($"vec_id")
      brute.intersect(lsh)
        .agg((count(lit(1)) / 5.0).as("recall_at_5"))
    }),

    // IVF recall measurement — q49's quality gauge pointed at the
    // coarse quantizer: recall@5 of the probe-cell-only search (q44)
    // against exact brute force, the number that tunes k (cells) and
    // nprobe for this corpus. Both sides are tiny top-k frames off one
    // scored scan.
    "q4e_ivf_recall" -> ((s, dir) => {
      import s.implicits._
      val assigned = ivfAssign(emb(s, dir), "embedding", "vec_id", k = IvfK, seed = IvfSeed)
      val probe = assigned.filter($"vec_id" === ProbeId)
        .select($"centroid_id".as("probe_cell"), $"embedding".as("probe_vec"))
      val scored = assigned.filter($"vec_id" =!= ProbeId)
        .crossJoin(broadcast(probe))
        .select($"vec_id", $"centroid_id", $"probe_cell",
          cosineSim($"embedding", $"probe_vec").as("score"))
      val brute = scored.orderBy($"score".desc, $"vec_id").limit(5).select($"vec_id")
      val ivf = scored.filter($"centroid_id" === $"probe_cell")
        .orderBy($"score".desc, $"vec_id").limit(5).select($"vec_id")
      brute.intersect(ivf)
        .agg((count(lit(1)) / 5.0).as("recall_at_5"))
    }),

    // Bucket histogram — LSH partitioning statistics (skew diagnostic).
    "q43_lsh_buckets" -> ((s, dir) => {
      import s.implicits._
      emb(s, dir)
        .withColumn("bucket", FastText.lshBucketUdf(Planes, Dim)($"embedding"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy($"bucket")
    })
  )

  /** Shared oracle CTE replicating ivfCentroids + NearestCentroid
    * assignment: deterministic centroid pick by seeded id-hash, then
    * per-row argmin via the same -cos ASC, centroid_id ASC tie-break.
    */
  private lazy val ivfCteSql: String = {
    val cos = cosineSql("e.embedding", "c.centroid_vec")
    s"""WITH cent AS (
       | SELECT vec_id AS centroid_id, embedding AS centroid_vec FROM embeddings
       | ORDER BY (('0x' || substr(md5(vec_id::VARCHAR || ':$IvfSeed'), 1, 8))::BIGINT), vec_id
       | LIMIT $IvfK),
       |assigned AS (
       | SELECT vec_id, embedding, centroid_id FROM (
       |  SELECT e.vec_id, e.embedding, c.centroid_id,
       |   row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY -($cos) ASC, c.centroid_id ASC) AS rk
       |  FROM embeddings e CROSS JOIN cent c)
       | WHERE rk = 1)""".stripMargin
  }

  override def oracles: Map[String, String] = Map(
    "q9e_label_centroids" ->
      s"""SELECT label, pos, ${graft.functions.Portable.proundSql("avg(v::DOUBLE)", 5)} AS centroid
         |FROM (SELECT label,
         |       unnest(generate_series(0, length(embedding) - 1)) AS pos,
         |       unnest(embedding) AS v
         |      FROM embeddings)
         |GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "q40_cosine_topk" ->
      s"""WITH probe AS (SELECT embedding AS probe_vec FROM embeddings WHERE vec_id = $ProbeId)
         |SELECT vec_id, ${cosineSql("embedding", "probe_vec")} AS score
         |FROM embeddings, probe WHERE vec_id <> $ProbeId
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,
    "q41_ann_lsh" -> {
      // plane count computed from count(embeddings) by the same integer
      // formula as planesFor; bucket = MaxPlanes-bit bucket masked to p.
      val bucket = maskedLshBucketSql("embedding", "pl.p", Dim)
      s"""WITH pl AS (${adaptivePlanesSql("embeddings")}),
         |e AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings, pl),
         |probe AS (SELECT bucket AS probe_bucket, embedding AS probe_vec
         |          FROM e WHERE vec_id = $ProbeId)
         |SELECT vec_id, bucket, ${cosineSql("embedding", "probe_vec")} AS score
         |FROM e, probe WHERE vec_id <> $ProbeId AND bucket = probe_bucket
         |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin
    },
    "q42_embedding_neardup" -> {
      val bucket = maskedLshBucketSql("embedding", "pl.p", Dim)
      s"""WITH pl AS (${adaptivePlanesSql("embeddings")}),
         |e AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings, pl)
         |SELECT bucket, a_id, b_id, cos FROM (
         | SELECT a.bucket AS bucket, a.vec_id AS a_id, b.vec_id AS b_id,
         |  ${cosineSql("a.embedding", "b.embedding")} AS cos
         | FROM e a JOIN e b
         |  ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |WHERE cos >= 0.3
         |ORDER BY bucket, a_id, b_id""".stripMargin
    },
    "qad_hash_embed_topk" -> {
      import graft.functions.{Portable, PortableHash, TextFunctions}
      s"""WITH sparse AS (
         |  SELECT doc_id,
         |         ${PortableHash.duckHashSql("tok")} % 16 AS dim,
         |         ${PortableHash.duckHashSql("tok", 7)} % 2 * 2 - 1 AS sgn
         |  FROM (SELECT doc_id, unnest(${TextFunctions.tokensSql("text")}) AS tok
         |        FROM documents)),
         |agg AS (SELECT doc_id, dim, sum(sgn) AS w FROM sparse GROUP BY 1, 2),
         |probe AS (SELECT dim AS p_dim, w AS pw FROM agg WHERE doc_id = 0),
         |pn AS (SELECT sum(pw * pw) AS p_nsq FROM probe),
         |scored AS (
         |  SELECT a.doc_id,
         |         sum(a.w * COALESCE(p.pw, 0)) AS dot,
         |         sum(a.w * a.w) AS nsq
         |  FROM agg a LEFT JOIN probe p ON a.dim = p.p_dim
         |  WHERE a.doc_id <> 0
         |  GROUP BY a.doc_id)
         |SELECT doc_id, ${Portable.proundSql("dot / (sqrt(nsq) * sqrt(p_nsq))", 6)} AS cos
         |FROM scored, pn WHERE nsq > 0
         |ORDER BY cos DESC, doc_id LIMIT 5""".stripMargin
    },
    "qac_prototype_prune" ->
      s"""$ivfCteSql,
         |scored AS (
         |  SELECT a.centroid_id, a.vec_id,
         |         ${cosineSql("a.embedding", "c.centroid_vec")} AS proto
         |  FROM assigned a JOIN cent c ON a.centroid_id = c.centroid_id),
         |ranked AS (
         |  SELECT centroid_id, vec_id, proto,
         |         row_number() OVER (PARTITION BY centroid_id
         |                            ORDER BY proto DESC, vec_id) AS rk,
         |         count(*) OVER (PARTITION BY centroid_id) AS n
         |  FROM scored)
         |SELECT CAST(count(*) AS BIGINT) AS n_kept,
         |       CAST(sum(vec_id) AS BIGINT) AS kept_id_sum,
         |       CAST(sum(CAST(floor(proto * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS proto_um_sum,
         |       CAST(count(DISTINCT centroid_id) AS BIGINT) AS n_cells
         |FROM ranked WHERE 2 * rk <= n + 1""".stripMargin,
    "qab_semantic_dedup" ->
      s"""$ivfCteSql,
         |red AS (
         |  SELECT DISTINCT x.vec_id
         |  FROM assigned x JOIN assigned y
         |    ON x.centroid_id = y.centroid_id AND y.vec_id < x.vec_id
         |  WHERE ${cosineSql("x.embedding", "y.embedding")} >= 0.3),
         |surv AS (
         |  SELECT * FROM assigned
         |  WHERE vec_id NOT IN (SELECT vec_id FROM red))
         |SELECT CAST(count(*) AS BIGINT) AS n_survivors,
         |       CAST(sum(vec_id) AS BIGINT) AS survivor_id_sum,
         |       CAST(count(DISTINCT centroid_id) AS BIGINT) AS n_cells
         |FROM surv""".stripMargin,
    "q44_ivf_search" ->
      s"""$ivfCteSql,
         |probe AS (SELECT centroid_id AS probe_cell, embedding AS probe_vec
         |          FROM assigned WHERE vec_id = $ProbeId)
         |SELECT vec_id, centroid_id, ${cosineSql("embedding", "probe_vec")} AS score
         |FROM assigned, probe
         |WHERE vec_id <> $ProbeId AND centroid_id = probe_cell
         |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin,
    "q4d_ivfpq_search" -> {
      // IVF assignment CTE (ivfCteSql) supplies the cell filter; the PQ
      // CTEs from q4c supply the ADC ranking — joined on the vec level
      val hash = s"(('0x' || substr(md5(vec_id::VARCHAR || ':$IvfSeed'), 1, 8))::BIGINT)"
      def sub(e: String) = s"list_slice(($e)::DOUBLE[], ss.s * 8 + 1, ss.s * 8 + 8)"
      s"""$ivfCteSql,
         |pick AS (
         | SELECT vec_id, embedding,
         |  row_number() OVER (ORDER BY $hash, vec_id) - 1 AS j
         | FROM embeddings ORDER BY $hash, vec_id LIMIT $IvfK),
         |ss AS (SELECT unnest(generate_series(0, 7)) AS s),
         |probe AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = $ProbeId),
         |pcell AS (SELECT centroid_id AS probe_cell FROM assigned WHERE vec_id = $ProbeId),
         |d AS (
         | SELECT e.vec_id, ss.s, p.j,
         |  ${sqDistUmSql(sub("e.embedding"), sub("p.embedding"))} AS d2um
         | FROM embeddings e, ss, pick p
         | WHERE e.vec_id <> $ProbeId),
         |codes AS (SELECT vec_id, s, j FROM (
         |  SELECT vec_id, s, j,
         |   row_number() OVER (PARTITION BY vec_id, s ORDER BY d2um ASC, j ASC) AS rk
         |  FROM d) WHERE rk = 1),
         |td AS (
         | SELECT ss.s, p.j, ${sqDistUmSql(sub("probe.pv"), sub("p.embedding"))} AS t
         | FROM probe, ss, pick p)
         |SELECT a.vec_id, a.centroid_id, CAST(sum(t) AS BIGINT) AS adc_um
         |FROM codes JOIN td ON codes.s = td.s AND codes.j = td.j
         |JOIN assigned a ON a.vec_id = codes.vec_id, pcell
         |WHERE a.centroid_id = pcell.probe_cell
         |GROUP BY a.vec_id, a.centroid_id
         |ORDER BY adc_um ASC, a.vec_id LIMIT 5""".stripMargin
    },
    "q4c_pq_adc" -> {
      // codebook = the seeded pick in hash order (j = rank), encode =
      // per-(vec, subspace) integer-micro-unit argmin, ADC = exact
      // integer sum of the probe's table entries at each code
      val hash = s"(('0x' || substr(md5(vec_id::VARCHAR || ':$IvfSeed'), 1, 8))::BIGINT)"
      def sub(e: String) = s"list_slice(($e)::DOUBLE[], ss.s * 8 + 1, ss.s * 8 + 8)"
      s"""WITH pick AS (
         | SELECT vec_id, embedding,
         |  row_number() OVER (ORDER BY $hash, vec_id) - 1 AS j
         | FROM embeddings ORDER BY $hash, vec_id LIMIT $IvfK),
         |ss AS (SELECT unnest(generate_series(0, 7)) AS s),
         |probe AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = $ProbeId),
         |d AS (
         | SELECT e.vec_id, ss.s, p.j,
         |  ${sqDistUmSql(sub("e.embedding"), sub("p.embedding"))} AS d2um
         | FROM embeddings e, ss, pick p
         | WHERE e.vec_id <> $ProbeId),
         |codes AS (SELECT vec_id, s, j FROM (
         |  SELECT vec_id, s, j,
         |   row_number() OVER (PARTITION BY vec_id, s ORDER BY d2um ASC, j ASC) AS rk
         |  FROM d) WHERE rk = 1),
         |td AS (
         | SELECT ss.s, p.j, ${sqDistUmSql(sub("probe.pv"), sub("p.embedding"))} AS t
         | FROM probe, ss, pick p)
         |SELECT vec_id, CAST(sum(t) AS BIGINT) AS adc_um
         |FROM codes JOIN td ON codes.s = td.s AND codes.j = td.j
         |GROUP BY vec_id ORDER BY adc_um ASC, vec_id LIMIT 5""".stripMargin
    },
    "q4b_quantized_rerank" -> {
      // same maxabs/round-half-up quantization, integer dots, and
      // division order as the engine — floats widen to double exactly,
      // integer dots are exact, so the coarse ranking is bit-identical
      val qd = (a: String, b: String) => dotSql(a, b)
      s"""WITH m AS (
         | SELECT vec_id, embedding,
         |  greatest(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))), 1e-30) AS ma
         | FROM embeddings),
         |q AS (
         | SELECT vec_id, embedding,
         |  list_transform(embedding::DOUBLE[],
         |   x -> CAST(floor(x * 127.0 / ma + 0.5) AS BIGINT)) AS qvec
         | FROM m),
         |probe AS (SELECT qvec AS pq, embedding AS pv FROM q WHERE vec_id = $ProbeId),
         |cand AS (
         | SELECT vec_id, embedding, pv,
         |  ${graft.functions.Portable.proundSql(
              s"${qd("qvec", "pq")} / (sqrt(${qd("qvec", "qvec")}) * sqrt(${qd("pq", "pq")}))", 6)} AS qscore
         | FROM q, probe WHERE vec_id <> $ProbeId
         | ORDER BY qscore DESC, vec_id LIMIT 20)
         |SELECT vec_id, qscore, ${cosineSql("embedding", "pv")} AS score
         |FROM cand ORDER BY score DESC, vec_id LIMIT 5""".stripMargin
    },
    // identical search semantics over the persisted index → same oracle
    "q4a_ivf_persisted" ->
      s"""$ivfCteSql,
         |probe AS (SELECT centroid_id AS probe_cell, embedding AS probe_vec
         |          FROM assigned WHERE vec_id = $ProbeId)
         |SELECT vec_id, centroid_id, ${cosineSql("embedding", "probe_vec")} AS score
         |FROM assigned, probe
         |WHERE vec_id <> $ProbeId AND centroid_id = probe_cell
         |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin,
    "q46_ivf_nprobe" -> {
      val cellCos = cosineSql("c.centroid_vec", "probe_vec")
      s"""$ivfCteSql,
         |probe AS (SELECT embedding AS probe_vec FROM embeddings
         |          WHERE vec_id = $ProbeId),
         |cells AS (SELECT c.centroid_id FROM cent c, probe
         |          ORDER BY $cellCos DESC, c.centroid_id LIMIT 2)
         |SELECT vec_id, centroid_id, ${cosineSql("embedding", "probe_vec")} AS score
         |FROM assigned, probe
         |WHERE vec_id <> $ProbeId
         |  AND centroid_id IN (SELECT centroid_id FROM cells)
         |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin
    },
    "q49_ann_recall" -> {
      val bucket = maskedLshBucketSql("embedding", "pl.p", Dim)
      s"""WITH pl AS (${adaptivePlanesSql("embeddings")}),
         |e AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings, pl),
         |probe AS (SELECT bucket AS pb, embedding AS pv FROM e WHERE vec_id = $ProbeId),
         |scored AS (
         | SELECT e.vec_id, e.bucket, probe.pb,
         |  ${cosineSql("e.embedding", "probe.pv")} AS score
         | FROM e, probe WHERE vec_id <> $ProbeId),
         |brute AS (SELECT vec_id FROM scored ORDER BY score DESC, vec_id LIMIT 5),
         |l AS (SELECT vec_id FROM scored WHERE bucket = pb
         |      ORDER BY score DESC, vec_id LIMIT 5)
         |SELECT count(*) / 5.0 AS recall_at_5 FROM
         | (SELECT vec_id FROM brute INTERSECT SELECT vec_id FROM l)""".stripMargin
    },
    "q48_multiprobe_lsh" -> {
      val bucket = maskedLshBucketSql("embedding", "pl.p", Dim)
      s"""WITH pl AS (${adaptivePlanesSql("embeddings")}),
         |e AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings, pl),
         |probe AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = $ProbeId),
         |margins AS ${probeMarginsSql("pv", "probe", Dim)},
         |own AS (SELECT bucket AS b FROM e WHERE vec_id = $ProbeId),
         |flips AS (SELECT j FROM margins, pl WHERE j < pl.p
         |          ORDER BY abs(proj) ASC, j ASC LIMIT 2),
         |targets AS (SELECT b FROM own
         |            UNION ALL
         |            SELECT xor(own.b, (1::BIGINT << j)) AS b FROM flips, own)
         |SELECT vec_id, bucket, ${cosineSql("embedding", "pv")} AS score
         |FROM e, probe
         |WHERE vec_id <> $ProbeId AND bucket IN (SELECT b FROM targets)
         |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin
    },
    "q47_ivf_refine" ->
      s"""$ivfCteSql
         |SELECT centroid_id, pos,
         |       ${graft.functions.Portable.proundSql("avg(v)", 6)} AS mean_v,
         |       count(*) AS n
         |FROM (SELECT centroid_id,
         |             generate_subscripts(embedding, 1) - 1 AS pos,
         |             unnest(embedding) AS v
         |      FROM assigned)
         |GROUP BY centroid_id, pos
         |ORDER BY centroid_id, pos""".stripMargin,
    "q45_ivf_cells" ->
      s"""$ivfCteSql
         |SELECT centroid_id, count(*) AS n FROM assigned
         |GROUP BY centroid_id ORDER BY centroid_id""".stripMargin,
    "q4e_ivf_recall" ->
      s"""$ivfCteSql,
         |probe AS (SELECT centroid_id AS pc, embedding AS pv
         |          FROM assigned WHERE vec_id = $ProbeId),
         |scored AS (
         | SELECT a.vec_id, a.centroid_id, probe.pc,
         |  ${cosineSql("a.embedding", "probe.pv")} AS score
         | FROM assigned a, probe WHERE a.vec_id <> $ProbeId),
         |brute AS (SELECT vec_id FROM scored ORDER BY score DESC, vec_id LIMIT 5),
         |iv AS (SELECT vec_id FROM scored WHERE centroid_id = pc
         |       ORDER BY score DESC, vec_id LIMIT 5)
         |SELECT count(*) / 5.0 AS recall_at_5 FROM
         | (SELECT vec_id FROM brute INTERSECT SELECT vec_id FROM iv)""".stripMargin,
    "q43_lsh_buckets" -> {
      val bucket = lshBucketSql("embedding", Planes, Dim)
      s"""SELECT $bucket AS bucket, count(*) AS n FROM embeddings
         |GROUP BY 1 ORDER BY bucket""".stripMargin
    }
  )
}
