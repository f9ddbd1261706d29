package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Corpus-scaling probe: replicates the documents/embeddings tables
  * Nx with shifted ids and a per-replica marker appended to EVERY
  * token (token counts and text sizes stay ~identical, but replicas
  * share no shingles with each other or the originals — corpus size
  * grows, near-dup DENSITY stays constant; a plain suffix would
  * densify the dup graph and measure the data, not the plan), then
  * times the heavy curation/dedup queries at each scale. The point is
  * the GROWTH CURVE, not the absolute numbers — a bucket-local plan
  * should scale near-linearly in corpus size; a hidden all-pairs or
  * driver-side step shows up as super-linear blowup long before
  * 100 TB would.
  *
  * Writes scaled corpora under /tmp (never touches the driver's
  * testdata) and prints one table row per (query, scale).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val queries = Seq("q_dedup_pipeline", "q_curation_pipeline", "q_dedup_spans",
      "q_tfidf", "q_dedup_minhash_pairs", "q_decontaminate",
      "q_lm_score", "q_winnow", "q_substring_dedup", "q_source_overlap",
      "q_dedup_prefix_filter", "q_bm25",
      // events/lineitem members: replicas are DISJOINT shifted copies
      // (constant per-user and per-order density), so these probe the
      // plan's growth, not densification of the synthetic data
      "q_markov_chain", "q_triangle_count", "q_label_prop", "q_bfs_hops",
      "q_concurrency",
      // r12: the DOULION sampled estimator next to its exact sibling —
      // the p² wedge-work reduction should grow visibly slower than
      // q_triangle_count's (provably optimal-exact) 14x curve
      "q_triangle_estimate",
      // r13: the estimator-only identities — no exact recompute in
      // q_triangle_doulion at all; q_edge_jaccard_estimate's exact
      // side is edge-local (O(deg of the 40 reported nodes)), so both
      // rows should track the SAMPLED wedge volume, not Σ outdeg²
      "q_triangle_doulion", "q_edge_jaccard_estimate",
      // r4 additions: the remaining unprobed heavy queries — per-edge
      // triangle scoring, walk sampling, the 64-replicate bootstrap
      // expansion, and basket-local rule mining
      "q_edge_jaccard", "q_random_walk", "q_bootstrap_ci", "q_assoc_rules",
      // r5 additions (verdict #4): the last unprobed heavies — the
      // PageRank loop, session stitching, PQ encode+ADC, DSIR token
      // bucketing, and the re-bounded vocabulary-coverage plan (its
      // r4 global-window form would grow super-linearly here: the
      // replica markers multiply the type count ~Nx while tokens stay
      // constant — exactly the vocabulary growth the fix bounds)
      "q_pagerank", "q_session_stitch", "q_ann_pq", "q_dsir",
      "q_vocab_coverage",
      // r5 additions: the training-data batch — brute-force/filtered
      // ranking should track corpus size (bounded probe set, map-side
      // TopKAgg); classifier/curriculum/span-corruption are row-local
      // scans that must stay linear
      "q_ndcg", "q_hard_negatives", "q_quality_classifier",
      "q_curriculum", "q_span_corruption", "q_mmr_diversify",
      "q_dataset_card", "q_tokenizer_fertility",
      // r5 batch B: mixture/selection/tokenizer operators — all
      // single-scan map-side-agg shapes except the BPE loop, whose
      // per-round cost is vocabulary-sized (types grow with the
      // replica markers, so the probe stresses the vocab frame too)
      "q_doremi_reweight", "q_rejection_sample", "q_preference_pairs",
      "q_length_buckets", "q_epoch_allocation", "q_bpe_train",
      // r5 batch C: stored-tokenizer encode (vocab-sized work after
      // the one corpus scan), vocab-frame KL join, the triple-shingle
      // explode, and the label-dimension reweighting
      "q_bpe_encode", "q_kl_divergence", "q_ngram_diversity",
      "q_label_balance",
      // bounded-probe media dedup: decode + fingerprint cost is fixed
      // by the 400-doc probe set, so the curve must be flat
      "q_audio_dedup",
      // r5 batch D: the eval family — pass@k / arena ride one event
      // agg each (linear); SFT assembly is one corpus-sized hash agg;
      // the LSH sweep runs on a bounded probe slice (flat curve);
      // video dedup is the bounded 400-doc triad member (flat)
      "q_pass_at_k", "q_win_matrix", "q_bt_rating", "q_sft_assemble",
      "q_lsh_param_sweep", "q_video_dedup",
      // r5 batch E: targeted selection (row-local scoring + bounded
      // take), clustering eval (broadcast assignment + tiny
      // contingency), length reweighting (one scan agg)
      "q_embed_select", "q_rand_index", "q_length_upsample",
      // r5 batch F: IVF sweep (bounded probes, flat), cluster-capped
      // sampling (broadcast assignment + bounded top-k), score
      // normalization (distinct-score frame, linear scan)
      "q_ivf_nprobe_sweep", "q_cluster_sample", "q_score_norm",
      // r6 additions (verdict #5): the last unprobed heavies — the
      // trained-Lloyd recall loop (per-round cost ∝ corpus), the
      // tolerance-gated sketch aggregate, the rule-frame top-3 window,
      // the planted-pair MinHash accuracy join, and the two
      // partials-based ROI rollups (events scanned once, map-side agg)
      "q_ivf_recall_trained", "q_approx_sketch", "q_item_recs",
      "q_minhash_accuracy", "q_feature_roi", "q_channel_roi",
      // r6 additions: trained-PQ recall (two codebook trainings ∝
      // corpus, ADC ranking bounded by the probe set), the converged
      // PageRank loop (rounds may GROW with the graph — the probe
      // shows whether the stop round drifts), and incremental index
      // absorb+search (build ∝ corpus once, batch assign ∝ batch)
      "q_pq_recall_trained", "q_pagerank_converged", "q_ann_ivf_incremental",
      // the stored-index absorbs: index build cost ∝ corpus lands in
      // pass 1 (buildIfAbsent); the min-of-2 curve isolates the
      // ABSORB+search path, which must track batch/bucket size
      "q_dedup_lsh_incremental", "q_index_drift",
      // r8 additions: offset-robust substring dedup — detection thins
      // to ~n/WIN anchors (near-grid curve expected) while REMOVAL
      // pays the honest n-spans/doc stream (linear, steeper constant);
      // the compacted/swap/indexed-bitext gates re-build + probe the
      // stored indexes, so build ∝ corpus in pass 1 and the min-of-2
      // curve isolates the probe path
      "q_substring_dedup_offsets", "q_substring_dedup_removal",
      "q_dedup_lsh_compacted", "q_index_retrain_swap",
      "q_bitext_mine_indexed",
      // r9 additions: PQ-codes compaction gate (build ∝ corpus in
      // pass 1, probe path isolated by min-of-2), targeted delete
      // (O(keys) tombstones + one probe day), text retrain-swap
      // (re-sign ∝ corpus once, then probe), drift report (probe-only
      // — must track batch, not corpus), and the 7-day chained week
      // (7 × (batch absorb + compaction) — the full operational
      // cadence; its curve tracks total absorbed volume)
      "q_ann_pq_compacted", "q_corpus_delete", "q_lsh_retrain_swap",
      "q_lsh_drift", "q_curation_week", "q_ann_delete",
      // the two remaining incremental members: semantic probe ∝
      // batch + bucket candidates; span probe ∝ batch + matching
      // stored spans (both build ∝ corpus in pass 1)
      "q_semdedup_incremental", "q_substring_dedup_incremental",
      // r10 additions: span-chain compaction (build ∝ corpus in
      // pass 1; 2-day probe path isolated by min-of-2) and the 7-day
      // vector-side week (7 × (probe + encode + nightly) — the full
      // operational cadence; like q_curation_week its curve tracks
      // total absorbed volume, the per-day breakdown probe below
      // localizes a day-cost regression). q_semdedup_scaled is
      // deliberately NOT in this list: its internal 4x-replica +
      // k = 32 recipe is corpus-proportional only at its own scale —
      // scaling its INPUT would re-create the fixed-k violation the
      // gate exists to close; the scaling claim is measured by the
      // dedicated semdedup_scaled probe below, which grows k with N
      "q_span_compacted", "q_embedding_week",
      // r10 lakehouse gates: history plays once per content-fingerprint
      // root in pass 1; min-of-2 isolates the READ path — the chain
      // fold (union + anti-join + merge) must track table size with no
      // metadata-driven blowup, and the change feed must track CHANGED
      // rows (delta dirs only, never the base)
      "q_ingest_rollback", "q_schema_evolution", "q_snapshot_merge",
      "q_change_feed",
      // r11 additions: the streamed follower gate (history + follower
      // play once per fingerprint root in pass 1; min-of-2 isolates
      // the sink read, which tracks CHANGED rows) and the contended
      // week (replay passes re-run every day as watermark no-ops, so
      // the curve tracks the same absorbed volume as q_curation_week)
      "q_change_feed_stream", "q_curation_week_contended",
      // r11: per-doc FLV encode+decode is row-local (clip state never
      // leaves its row) — the curve must be linear in docs; the
      // feed-mirror replica applies O(changed rows) per version on
      // top of the once-played feed history
      "q_video_interframe", "q_feed_mirror")
    val scales = Seq(1, 4, 16)

    def scaled(n: Int): String = {
      val dir = s"/tmp/graft-scale/x$n"
      val docs = spark.read.parquet(s"$base/documents.parquet")
      val out = (0 until n).map { k =>
        if (k == 0) docs
        else docs.select(
          (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"$$1x$k").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
      out.write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
      val embOut = (0 until n).map { k =>
        if (k == 0) emb
        else emb.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          col("embedding"), col("label"))
      }.reduce(_ unionByName _)
      embOut.write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
      val ev = spark.read.parquet(s"$base/events.parquet")
      val evOut = (0 until n).map { k =>
        if (k == 0) ev
        else ev.select((col("event_id") + lit(k * 10000000L)).as("event_id"),
          col("ts"), (col("user_id") + lit(k * 10000000L)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _)
      evOut.write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
      val li = spark.read.parquet(s"$base/lineitem.parquet")
      val liOut = (0 until n).map { k =>
        if (k == 0) li
        else li.withColumn("l_orderkey", col("l_orderkey") + lit(k * 10000000L))
          .withColumn("l_partkey", col("l_partkey") + lit(k * 10000000L))
      }.reduce(_ unionByName _)
      liOut.write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")
      // orders/customer replicas shift BOTH sides of the o_custkey
      // join key, so per-customer order density stays constant and the
      // join graph is n disjoint copies (probes the plan, not data
      // densification)
      val ord = spark.read.parquet(s"$base/orders.parquet")
      val ordOut = (0 until n).map { k =>
        if (k == 0) ord
        else ord.withColumn("o_orderkey", col("o_orderkey") + lit(k * 10000000L))
          .withColumn("o_custkey", col("o_custkey") + lit(k * 10000000L))
      }.reduce(_ unionByName _)
      ordOut.write.mode(SaveMode.Overwrite).parquet(s"$dir/orders.parquet")
      val cust = spark.read.parquet(s"$base/customer.parquet")
      val custOut = (0 until n).map { k =>
        if (k == 0) cust
        else cust.withColumn("c_custkey", col("c_custkey") + lit(k * 10000000L))
      }.reduce(_ unionByName _)
      custOut.write.mode(SaveMode.Overwrite).parquet(s"$dir/customer.parquet")
      dir
    }

    println(f"${"query"}%-24s ${scales.map(s => f"x$s%8s").mkString} ratio(16x/1x)")
    lazy val dirs = scales.map(n => n -> scaled(n)).toMap // lazy: dedicated-only invocations (mirror_skip) skip the corpora rebuild
    // optional arg: comma-separated subset for fast incremental probes
    val picked =
      if (args.nonEmpty) queries.filter(args(0).split(",").toSet)
      else queries
    for (q <- picked) {
      val times = scales.map { n =>
        val fn = SparkEntry.queries(q)
        // warm once at 1x for JIT/codegen, then min of 2 timed passes
        val t = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          FullEval.run(fn(spark, dirs(n)))
          (System.nanoTime() - t0) / 1e9
        }.min
        t
      }
      val ratio = times.last / times.head
      println(f"$q%-24s ${times.map(t => f"$t%7.2fs").mkString} ${ratio}%6.1fx")
    }
    // SKEWED-GRAPH probe (r6): hub degree GROWS with scale — the
    // hub-row hazard the disjoint TPC-H replicas can never surface
    // (their max degree is constant). Hub 0 fans out to 50k·n leaves;
    // consecutive leaves are also linked, so every path edge closes a
    // triangle THROUGH the hub and the enumerator does real work.
    // Edge count ∝ n, so the full edges→degrees→orient→triangles
    // pipeline must stay ~linear; the old collect_set adjacency put
    // the hub's whole neighborhood in ONE aggregation-buffer row here
    // and degraded super-linearly long before it OOMed.
    if (args.isEmpty || args(0).split(",").contains("skew_graph")) {
      import graft.queries.GraphCore
      val times = scales.map { n =>
        val h = 50000L * n
        val leaves = spark.range(1, h + 1).select(col("id"))
        val pairs = leaves.select(lit(0L).as("pa"), col("id").as("pb"))
          .unionByName(leaves.filter(col("id") < h)
            .select(col("id").as("pa"), (col("id") + 1).as("pb")))
        val t = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val edges = GraphCore.edgesFromPairs(pairs)
          val tri = GraphCore.triangles(GraphCore.orientedOf(edges)).count()
          assert(tri == h - 1, s"skew probe triangle count: $tri vs ${h - 1}")
          (System.nanoTime() - t0) / 1e9
        }.min
        t
      }
      val ratio = times.last / times.head
      println(f"${"skew_graph(hub=50k*n)"}%-24s ${times.map(t => f"$t%7.2fs").mkString} ${ratio}%6.1fx")
    }
    // DOULION P-SCALING probe (r12): the q_triangle_estimate GATE
    // recomputes the exact count for its tolerance flag, so its
    // main-loop row necessarily tracks the exact side's curve. This
    // block times the SAMPLED PATH ALONE under the honest at-scale
    // recipe: the estimator's relative variance is ~1/(p³·t), and t
    // grows with the corpus (disjoint replicas: ∝ n), so p may SHRINK
    // as n^(-1/3) at constant accuracy — wedge work ∝ p²·n ∝ n^(1/3),
    // a provably sub-linear curve where the exact form is Θ(n).
    // p: 50% / 31% / 20% at 1x/4x/16x; the estimate is asserted
    // within 10% of the exact count at every scale (p³·t ≥ 50k at
    // 16x → sub-1% standard error; the assert is the accuracy HALF
    // of the claim, the curve is the cost half).
    if (args.isEmpty || args(0).split(",").contains("doulion_scaled")) {
      import graft.queries.GraphCore
      val pPct = Map(1 -> 50, 4 -> 31, 16 -> 20)
      // the md5-bucket sampler keys on TWO hex chars, so the keep
      // probability is the EXACT combinatorial mass of the 256
      // equiprobable (char1, char2) pairs below the threshold — NOT
      // thr/100 (256 pairs spread unevenly over the 100 residues);
      // the estimator must divide by the true p or it is biased
      def pOf(thr: Int): Double = {
        val hex = "0123456789abcdef".map(_.toInt)
        (for (a <- hex; b <- hex) yield (a * 256 + b) % 100)
          .count(_ < thr) / 256.0
      }
      val times = scales.map { n =>
        val edges = GraphCore.copurchaseEdges(spark, dirs(n))
        val exact = GraphCore.triangles(GraphCore.orientedOf(edges)).count()
        val thr = pPct(n)
        val p = pOf(thr)
        val t = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val canon = edges.filter(col("src") < col("dst"))
          val h = md5(concat(col("src").cast("string"), lit(":"),
            col("dst").cast("string"), lit(":doulion")))
          val pct = (ascii(substring(h, 1, 1)) * 256 +
            ascii(substring(h, 2, 1))) % 100
          val sampled = GraphCore.edgesFromPairs(canon.filter(pct < thr)
            .select(col("src").as("pa"), col("dst").as("pb")))
          val ts = GraphCore.triangles(GraphCore.orientedOf(sampled)).count()
          val est = ts / (p * p * p)
          assert(math.abs(est - exact) / math.max(1.0, exact.toDouble) <= 0.10,
            s"doulion at ${n}x p=$p: est $est vs exact $exact")
          (System.nanoTime() - t0) / 1e9
        }.min
        t
      }
      val ratio = times.last / times.head
      println(f"${"doulion_scaled(p~n^-1/3)"}%-24s ${times.map(t => f"$t%7.2fs").mkString} ${ratio}%6.1fx")
    }
    // PER-EDGE SAMPLED JACCARD probe (r13): q_edge_jaccard's estimator
    // sibling (q_edge_jaccard_estimate) under the same p ∝ n^(-1/3)
    // recipe — the sampled enumeration + per-edge count + exact-degree
    // join-back + top-20 cut, with NO exact wedge work anywhere (the
    // gate's edge-local exact side is O(deg of 40 nodes) and rides
    // along here as it does in production). The exact form's work is
    // ≡ Σ outdeg² (q_edge_jaccard measured ~12x under 16x disjoint
    // replicas); the sampled path's wedge volume shrinks by p², so
    // the curve must sit well below it. Accuracy asserted on the
    // aggregate identity Σ_e cn_s = 3·T_sampled (E = p³·3T): the
    // per-edge estimates are individually noisy at small counts by
    // design — the gate's ±50%+3 band grades those — but the mass
    // must land within 10% of 3T at every scale.
    if (args.isEmpty || args(0).split(",").contains("ejacc_scaled")) {
      import graft.queries.GraphCore
      val pPct = Map(1 -> 50, 4 -> 31, 16 -> 20)
      def pOf(thr: Int): Double = {
        val hex = "0123456789abcdef".map(_.toInt)
        (for (a <- hex; b <- hex) yield (a * 256 + b) % 100)
          .count(_ < thr) / 256.0
      }
      val times = scales.map { n =>
        val edges = GraphCore.copurchaseEdges(spark, dirs(n))
        val exact3T =
          GraphCore.triangles(GraphCore.orientedOf(edges)).count() * 3.0
        val thr = pPct(n)
        val p = pOf(thr)
        def cnSOf = {
          val canon = edges.filter(col("src") < col("dst"))
          val h = md5(concat(col("src").cast("string"), lit(":"),
            col("dst").cast("string"), lit(":ejacc")))
          val pct = (ascii(substring(h, 1, 1)) * 256 +
            ascii(substring(h, 2, 1))) % 100
          val sampled = GraphCore.edgesFromPairs(canon.filter(pct < thr)
            .select(col("src").as("pa"), col("dst").as("pb")))
          GraphCore.triangles(GraphCore.orientedOf(sampled))
            .select(explode(array(
              struct(least(col("a"), col("b")).as("pa"),
                greatest(col("a"), col("b")).as("pb")),
              struct(least(col("b"), col("c")).as("pa"),
                greatest(col("b"), col("c")).as("pb")),
              struct(least(col("a"), col("c")).as("pa"),
                greatest(col("a"), col("c")).as("pb")))).as("e"))
            .groupBy(col("e.pa").as("pa"), col("e.pb").as("pb"))
            .agg(count(lit(1)).as("cn_s"))
        }
        val t = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val deg = edges.groupBy(col("src").as("node"))
            .agg(count(lit(1)).as("deg"))
          val scored = cnSOf
            .join(deg.select(col("node"), col("deg").as("dega")),
              col("pa") === col("node")).drop("node")
            .join(deg.select(col("node"), col("deg").as("degb")),
              col("pb") === col("node")).drop("node")
            .withColumn("ce", least(col("cn_s") / (p * p),
              least(col("dega"), col("degb")).cast("double")))
            .withColumn("je",
              col("ce") / (col("dega") + col("degb") - col("ce")))
          val top = scored.orderBy(round(col("je"), 6).desc,
            col("pa"), col("pb")).limit(20).collect()
          assert(top.nonEmpty, s"ejacc at ${n}x: no scored edges")
          (System.nanoTime() - t0) / 1e9
        }.min
        // accuracy (outside the timed window): sampled mass vs 3T
        val sumCn = cnSOf.agg(sum(col("cn_s"))).head().getLong(0)
        val est = sumCn / (p * p * p)
        assert(math.abs(est - exact3T) / math.max(1.0, exact3T) <= 0.10,
          s"ejacc at ${n}x p=$p: mass est $est vs exact $exact3T")
        t
      }
      val ratio = times.last / times.head
      println(f"${"ejacc_scaled(p~n^-1/3)"}%-24s ${times.map(t => f"$t%7.2fs").mkString} ${ratio}%6.1fx")
    }
    // STATS-COLLECTION FAN-OUT probe (r13): commit-time footer-stats
    // collection was driver-sequential — fine for a daily delta's
    // handful of files, hours for a 100 TB base commit's 10^5-10^6
    // footers (r12 verdict Missing #2). collectDistributed reads the
    // footers on EXECUTORS, so wall time at 16x the file count must
    // grow far sub-16x (files/cores waves); the sequential path at the
    // same counts is printed as the contrast, and both paths' results
    // are asserted identical at every count (the correctness half —
    // StatsSkippingSpec pins it once, this re-pins it at probe scale).
    if (args.isEmpty || args(0).split(",").contains("stats_collect")) {
      import graft.sources.FileStats
      val counts = Seq(16, 64, 256)
      val rows = counts.map { nf =>
        val dir = java.nio.file.Files
          .createTempDirectory(s"statsc$nf").toString + "/stage"
        spark.range(0, 400000L * nf / 16)
          .select(col("id"), (col("id") % 97).as("k"),
            (col("id") * 31 % 1000).cast("double").as("s"))
          .repartitionByRange(nf, col("id")).write.parquet(dir)
        val p = java.nio.file.Paths.get(dir)
        val cols = Seq("id", "k", "s")
        def t1(body: => Seq[FileStats.FileStat]): (Double, Seq[FileStats.FileStat]) = {
          val t0 = System.nanoTime()
          val r = body
          ((System.nanoTime() - t0) / 1e9, r)
        }
        val (tSeq, rSeq) = t1(FileStats.collect(p, cols,
          spark.sparkContext.hadoopConfiguration))
        val (tDist, rDist) = t1(FileStats.collectDistributed(spark, p, cols))
        assert(rDist == rSeq, s"stats_collect at $nf files: paths diverge")
        assert(rSeq.size == nf)
        (tSeq, tDist)
      }
      val seqRatio = rows.last._1 / rows.head._1
      val distRatio = rows.last._2 / rows.head._2
      println(f"${"stats_collect(seq)"}%-24s ${rows.map(r => f"${r._1}%7.2fs").mkString} ${seqRatio}%6.1fx")
      println(f"${"stats_collect(dist)"}%-24s ${rows.map(r => f"${r._2}%7.2fs").mkString} ${distRatio}%6.1fx")
    }
    // CDC CATCH-UP vs APPLIED HISTORY probe (r12): the mirror's
    // watermark filter prunes already-applied feed FILES via the
    // `_commit_version` sidecars, so applying 2 pending versions must
    // cost the same whether the change table already holds 8 or 128
    // applied versions — the FLAT curve is the claim (without the
    // sidecars every pass re-opens the whole feed's files). Scales
    // here are history DEPTHS, not corpus replicas.
    if (args.isEmpty || args(0).split(",").contains("mirror_skip")) {
      import graft.sources.Snapshots
      import graft.streaming.ChangeFeed
      val depths = Seq(8, 32, 128)
      val times = depths.map { n =>
        val b = java.nio.file.Files.createTempDirectory(s"mskip$n").toString
        val (src, sink, mirror) = (s"$b/src", s"$b/sink", s"$b/mirror")
        val row = (i: Int) => spark.range(i * 100L, i * 100L + 100L)
          .selectExpr("id", "CAST(id AS STRING) AS v")
        Snapshots.commit(row(0), src)
        (1 to n).foreach(i =>
          Snapshots.commitAppend(row(i), src, Seq.empty, Some(i.toLong)))
        ChangeFeed.catchUp(spark, src, sink)
        Snapshots.commitBatch(Snapshots.readVersion(spark, src, 0L), mirror, 0L)
        ChangeFeed.mirrorCatchUp(spark, sink, mirror, "id") // absorb history
        // timed: 3 reps of (2 new versions -> land -> apply), min
        val t = (1 to 3).map { r =>
          val base = n + 2 * r
          Snapshots.commitAppend(row(base - 1), src, Seq.empty, Some((base - 1).toLong))
          Snapshots.commitAppend(row(base), src, Seq.empty, Some(base.toLong))
          ChangeFeed.catchUp(spark, src, sink)
          val t0 = System.nanoTime()
          val applied = ChangeFeed.mirrorCatchUp(spark, sink, mirror, "id")
          assert(applied.size == 2, s"expected 2 applied, got $applied")
          (System.nanoTime() - t0) / 1e9
        }.min
        t
      }
      val ratio = times.last / times.head
      println(f"${"mirror_skip(hist=8/32/128)"}%-24s ${times.map(t => f"$t%7.2fs").mkString} ${ratio}%6.1fx")
    }
    // SEMDEDUP K-SCALING probe (r10): semProbeBatch is bucket-local
    // quadratic, so per-bucket occupancy — and with it the probe cost
    // — stays flat only if the centroid count grows WITH the corpus
    // (k ∝ N, the operational retrainSwap recipe; see
    // VectorIndex.semProbeBatch's cost model). Measured head-to-head:
    // the fixed-k row re-creates the violated form (the old 6.5x
    // curve), the k ∝ N row must stay near-flat. Build is outside the
    // timed window; pass 1 absorbs, pass 2 replays — min-of-2
    // isolates the probe path, the main-loop convention.
    if (args.isEmpty || args(0).split(",").contains("semdedup_scaled")) {
      import graft.similarity.{Embeddings, VectorIndex}
      def probeAt(n: Int, seedK: Int): Double = {
        val emb = spark.read.parquet(s"${dirs(n)}/embeddings.parquet")
        val vecs = emb.select(col("vec_id"),
          Embeddings.asDouble(col("embedding")).as("v"))
        val base = vecs.filter(pmod(col("vec_id"), lit(10)) =!= 7)
          .localCheckpoint()
        val batch = vecs.filter(pmod(col("vec_id"), lit(10)) === 7)
          .localCheckpoint()
        val root = java.nio.file.Files
          .createTempDirectory("graft-semscale").toString
        VectorIndex.build(base, root, seedK = seedK, iters = 2)
        (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          FullEval.run(VectorIndex.semProbeBatch(spark, root, batch,
            tau = 0.95, batchId = 0L))
          (System.nanoTime() - t0) / 1e9
        }.min
      }
      val fixed = scales.map(n => probeAt(n, 8))
      println(f"${"semdedup fixed k=8"}%-24s ${fixed.map(t => f"$t%7.2fs").mkString} ${fixed.last / fixed.head}%6.1fx")
      val grown = scales.map(n => probeAt(n, 8 * n))
      println(f"${"semdedup k=8n (k prop N)"}%-24s ${grown.map(t => f"$t%7.2fs").mkString} ${grown.last / grown.head}%6.1fx")
    }
    // PER-DAY WEEK BREAKDOWN (r10): q_curation_week's 14s is 7 ingest
    // days + 7 maintenance passes BY DESIGN — this probe times each
    // day separately at 1x so a day-cost regression is visible without
    // re-running (or guessing inside) the composed gate.
    if (args.isEmpty || args(0).split(",").contains("curation_week_days")) {
      import graft.dedup.LshIndex
      import graft.pipelines.CurationJob
      import graft.sources.Snapshots
      val corpus = spark.read.parquet(s"${dirs(1)}/documents.parquet")
        .select(col("doc_id"), col("text")).localCheckpoint()
      val wbase = java.nio.file.Files
        .createTempDirectory("graft-weekdays").toString
      val (curatedRoot, lshRoot) = (s"$wbase/curated", s"$wbase/lsh")
      Snapshots.commit(corpus, curatedRoot)
      LshIndex.build(corpus, lshRoot)
      println(f"${"curation_week per-day"}%-24s ${"ingest"}%8s ${"nightly"}%8s")
      for (d <- 0 until 7) {
        val batch = graft.queries.Indexing.weekBatch(corpus, d).localCheckpoint()
        val t0 = System.nanoTime()
        FullEval.run(CurationJob.absorbDaily(batch, curatedRoot, lshRoot,
          batchId = d.toLong))
        val tIngest = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        CurationJob.nightly(spark, curatedRoot, lshRoot, keep = 3)
        val tNightly = (System.nanoTime() - t1) / 1e9
        println(f"${s"  week_day$d"}%-24s $tIngest%7.2fs $tNightly%7.2fs")
      }
    }
    // CHANGE-FEED FOLLOW probe (r11): the O(changed rows) claim
    // measured — the SAME fixed-size delta lands on a 1x vs 16x base
    // table, and catchUp (read the delta dir, type it, land it into
    // the sink) must stay FLAT: the follower never touches the base,
    // only the changed version's immutable dir. Base commit cost
    // (∝ corpus) sits OUTSIDE the timed window by design.
    if (args.isEmpty || args(0).split(",").contains("change_feed_follow")) {
      import graft.sources.Snapshots
      import graft.streaming.ChangeFeed
      val delta = spark.read.parquet(s"${dirs(1)}/documents.parquet")
        .filter(pmod(col("doc_id"), lit(20)) === 3)
        .select((col("doc_id") + 900000000L).as("doc_id"),
          length(col("text")).cast("long").as("len"))
        .localCheckpoint()
      val times = scales.map { n =>
        val b = java.nio.file.Files.createTempDirectory(s"feedprobe$n").toString
        val (src, sink) = (s"$b/src", s"$b/sink")
        Snapshots.commit(
          spark.read.parquet(s"${dirs(n)}/documents.parquet")
            .select(col("doc_id"), length(col("text")).cast("long").as("len")),
          src)
        Snapshots.commitAppend(delta, src, Seq.empty, Some(1L))
        val t0 = System.nanoTime()
        ChangeFeed.catchUp(spark, src, sink)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"${"change_feed_follow"}%-24s ${times.map(t => f"$t%7.2fs").mkString} ${times.last / times.head}%6.1fx")
    }
    spark.stop()
  }
}
