package graft

/** Plan-shape regression tests: the scale properties README claims
  * (pushdown, broadcast, single-shuffle sessionization) asserted
  * against the actual physical plans so a refactor can't silently
  * lose them.
  */
class PlanAuditSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def formattedPlanOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("scan filters and projection reach the parquet reader") {
    val p = formattedPlanOf("q_scan_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount)"), p)
    assert(p.contains("GreaterThan(l_discount,0.05)"), p)
    // pruned read schema: only the 5 referenced columns, not all 11
    assert(!p.contains("l_extendedprice"), "read schema not pruned")
  }

  test("dimension joins broadcast, fact side does not shuffle before the join") {
    val p = planOf("q_join_broadcast")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("area top3 broadcasts all three dims and the part join") {
    val p = planOf("q_area_top3")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
  }

  test("sessionization shuffles once on user_id before window + agg") {
    val p = planOf("q_sessionize")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
  }

  test("semi and anti joins plan as fused join operators") {
    assert(planOf("q_semi_join").contains("LeftSemi"), planOf("q_semi_join"))
    assert(planOf("q_anti_join").contains("LeftAnti"), planOf("q_anti_join"))
  }

  test("conditional-agg stats use partial + final hash aggregation") {
    val p = planOf("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("set-ops counts are one pass: single scan, no join, two agg levels") {
    val p = planOf("q_set_ops")
    // the union/intersect/except cardinalities come from membership
    // flags in one groupBy chain — a regression to the three-action
    // formulation would reappear as joins/unions here
    assert(!p.contains("Join"), p)
    assert(!p.contains("Union"), p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("stratified sample broadcasts the per-stratum quota table") {
    val p = planOf("q_stratified_sample")
    assert(p.contains("BroadcastHashJoin"), p)
    // per-stratum selection is heap-pruned (partial+final GroupedTopK)
    // before the window rank, so no stratum is ever fully sorted
    assert("GroupedTopK \\[".r.findAllIn(p).size == 2, p)
  }

  test("kmeans final assignment is map-only: no join, no corpus shuffle") {
    // centroids ride into the projection as literals, so the only
    // exchange in the finished query is the output orderBy's range
    // partitioning — an assignment regression to a join/aggregate
    // formulation would appear as a Join or hash exchange here
    val p = planOf("emb_kmeans")
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning".r.findFirstIn(p).isEmpty, p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("joined kmeans broadcasts the rolled-up model; assignment is map-only") {
    // the large-k shape: the k-row centroid frame collapses to ONE
    // broadcast array row and the arg-min is an array HOF over it —
    // no n·k candidate expansion, ZERO corpus hash exchanges (the r9
    // shape's groupBy-vec_id re-aggregation is the regression this
    // pins against); the only exchanges are the model roll-up's
    // SinglePartition and the output sort's range partitioning
    val p = planOf("emb_kmeans_joined")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 0, p)
    assert(p.contains("array_min"), p)
  }

  test("temperature mix broadcasts quotas and heap-prunes strata like the stratified sampler") {
    val p = planOf("q_temperature_mix")
    assert(p.contains("BroadcastHashJoin"), p)
    assert("GroupedTopK \\[".r.findAllIn(p).size == 2, p)
  }

  test("keep-best shares one clustered shuffle between size window and top-1 heap") {
    val p = planOf("dedup_keep_best")
    // partial+final heap passes present, and the final pass rides the
    // window's partitioning: exactly ONE hash exchange on cluster_id
    // (GroupedTopKExec propagates child partitioning — a second
    // exchange here is the regression this test pins against)
    assert("GroupedTopK \\[".r.findAllIn(p).size == 2, p)
    assert("Exchange hashpartitioning\\(cluster_id".r.findAllIn(p).size == 1, p)
  }

  test("keep-best reads the materialized cluster table, not a re-derived pair pipeline") {
    // first invocation builds the cluster table as a side effect
    SparkEntry.queries("dedup_keep_best")(spark, sf).collect()
    val name = graft.operators.Dedup.clustersTableName(sf)
    assert(spark.catalog.tableExists(name), "cluster table was not materialized")
    val scans = SparkEntry.queries("dedup_keep_best")(spark, sf)
      .queryExecution.sparkPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    // exactly one documents scan (the quality side) + the cluster
    // table scan — a signature/band-join recompute would reappear as
    // additional documents scans here
    val docScans = scans.count(
      _.metadata.get("Location").exists(_.contains("documents.parquet")))
    assert(docScans == 1, s"expected 1 documents scan, got $docScans")
    assert(scans.exists(_.metadata.get("Location").exists(_.contains(name))),
      "selection does not read the materialized cluster table")
  }

  test("repetition signals are one scan with no exchange except the output sort") {
    val p = planOf("text_repetition")
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning".r.findFirstIn(p).isEmpty, p)
  }

  test("text-dedup candidate generation is always an equi-join, never a cross product") {
    // the 100 TB contract: candidates come from bucket equi-joins
    // (band / prefix shingle), so no plan may contain a cartesian or
    // nested-loop join. (Embedding ops are excluded: their bounded
    // ×centroids crossJoin-broadcast assignment is legitimate.)
    for (q <- Seq("dedup_exact", "dedup_minhash_lsh",
                  "dedup_ngram_jaccard", "dedup_simhash",
                  "dedup_incremental", "dedup_verbatim")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("BroadcastNestedLoop"), s"$q:\n$p")
    }
  }

  test("semantic dedup pairs by cluster equi-join; source overlap by shingle equi-join") {
    // same 100 TB contract as the text dedups: the corpus-wide pair
    // generation is an equi-join on the blocking key (the k-means
    // cell / the shingle) — never an all-pairs product. The bounded
    // ×k crossJoin-broadcast of the joined kmeans ASSIGNMENT is
    // legitimate (k rows on the build side), so the ban is on
    // CartesianProduct plus any nested-loop join in the plans that
    // don't embed that assignment.
    for (q <- Seq("dedup_semantic", "dedup_semantic_scaled",
                  "text_source_overlap")) {
      assert(!planOf(q).contains("CartesianProduct"), s"$q")
    }
    // literal-kmeans semantic dedup has no crossJoin anywhere
    assert(!planOf("dedup_semantic").contains("BroadcastNestedLoop"),
      planOf("dedup_semantic"))
    assert(!planOf("text_source_overlap").contains("BroadcastNestedLoop"),
      planOf("text_source_overlap"))
    // both semantic plans generate pairs via a cluster-keyed join
    for (q <- Seq("dedup_semantic", "dedup_semantic_scaled")) {
      assert("Join \\[cluster#".r.findFirstIn(planOf(q)).isDefined,
        s"$q prune join must key on cluster:\n${planOf(q)}")
    }
    // r14: pair generation is ONE aggregate keyed on the shingle
    // (sorted per-shingle source set + bounded in-row pair explode) —
    // the former vocab⋈vocab join shuffled the distinct-shingle
    // universe twice for the same (sh, pair) rows. Contract now: an
    // aggregate grouped on the shingle exists, and NO join keys on it.
    val overlapPlan = planOf("text_source_overlap")
    assert("Aggregate\\(keys=\\[sh#".r.findFirstIn(overlapPlan).isDefined,
      s"overlap pair generation must aggregate on the shingle:\n$overlapPlan")
    assert("Join \\[sh#".r.findFirstIn(overlapPlan).isEmpty,
      "the shingle-keyed self-join should be gone (one shuffle, not two)")
    // the scaled plan's only nested-loop joins are the ×k centroid
    // assignments (one per Lloyd pass + final assignment)
    val bnlj = "BroadcastNestedLoopJoin".r
      .findAllIn(planOf("dedup_semantic_scaled")).size
    assert(bnlj <= 3, s"unexpected nested-loop joins beyond the kmeans assignment: $bnlj")
  }

  test("classifier inference is one scan with no join and no hash exchange") {
    // the model-filter contract at 100 TB: scoring is a projection
    // (hashed weights, no vocabulary table), so the plan may not
    // contain a join or a hash shuffle — only the output sort
    val p = planOf("text_quality_classifier")
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning".r.findFirstIn(p).isEmpty, p)
  }

  test("bloom decontamination probes map-side, before the verify join") {
    val p = planOf("text_decontaminate_bloom")
    // the probe must appear as a Filter predicate (map-side, fused
    // with the shingle explode), not as a join condition — that's
    // what bounds the verify join's shuffle to candidates
    assert(p.contains("bloom_might_contain"), p)
    val probeAt = p.indexOf("bloom_might_contain")
    val joinAt = p.indexOf("Join")
    assert(joinAt >= 0 && joinAt < probeAt,
      "probe should sit below the join in the plan tree (executes first)")
  }

  test("SQ8 search fuses reconstruction into the bucket scan — no codes-table join") {
    val p = planOf("sim_ivf_sq8")
    // one join only (candidates × queries); reconstruction is a
    // projection, so no second join materializes codes
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(p).size <= "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(planOf("sim_ivf")).size, p)
    assert(p.contains("cosine_similarity"), p)
  }

  test("PQ search keeps the SQ8 plan shape: recon is a projection, no codebook join or extra exchange") {
    val pPq = planOf("sim_ivf_pq")
    val pSq = planOf("sim_ivf_sq8")
    // the codebook is a codegen reference object inside pq_recon, so
    // encoding+reconstruction must not materialize as a join or add
    // an exchange over the sq8 formulation it replaces
    assert(pPq.contains("pq_recon"), pPq)
    val joins = "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
    assert(joins.findAllIn(pPq).size == joins.findAllIn(pSq).size,
      s"PQ added a join:\n$pPq")
    val ex = "Exchange hashpartitioning".r
    assert(ex.findAllIn(pPq).size == ex.findAllIn(pSq).size,
      s"PQ added a hash exchange:\n$pPq")
  }

  test("hash split is a pure projection: no join, no aggregate, no hash exchange") {
    val p = planOf("q_hash_split")
    assert("Exchange hashpartitioning".r.findFirstIn(p).isEmpty, p)
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|HashAggregate".r
      .findFirstIn(p).isEmpty, p)
  }

  test("unigram-LM scoring side is map-only: the literal-map fold adds no join or hash exchange") {
    // the returned frame is the SCORING plan (training ran eagerly at
    // construction); an explode+join formulation of the lookup would
    // appear here as a join + per-token row explosion
    val p = planOf("text_unigram_logprob")
    assert("Exchange hashpartitioning".r.findFirstIn(p).isEmpty, p)
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|Generate".r
      .findFirstIn(p).isEmpty, p)
  }

  test("chunking is map-only: one generate, no join, no hash exchange") {
    val p = planOf("text_chunk")
    assert("Exchange hashpartitioning".r.findFirstIn(p).isEmpty, p)
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findFirstIn(p).isEmpty, p)
    assert("Generate".r.findAllIn(p).size == 1, p)
  }

  test("verbatim rewrite joins intervals back doc-level — every generate is the window index, never a position explode") {
    val p = planOf("dedup_verbatim_rewrite")
    // the window-index explode (sequence(1, n-7)) legitimately appears
    // on both sides of the owner aggregate; what must NOT appear is
    // any OTHER explode — a token/position generate would be the n·w
    // row growth the interval-array join exists to avoid
    val gens = p.linesIterator.filter(_.contains("Generate")).toSeq
    assert(gens.nonEmpty, p)
    assert(gens.forall(_.contains("sequence(1")),
      s"non-window-index generate in the rewrite plan:\n${gens.mkString("\n")}")
  }

  test("two-level search keeps the flat path's plan shape: map-only assignment, same exchanges") {
    val p2 = planOf("sim_ivf_2level_scaled")
    val p1 = planOf("sim_ivf_scaled")
    // hierarchical assignment is still a projection (the expression
    // rides in the scan's project list) — no join, no exchange added
    // between scan and bucket id
    assert(p2.contains("nearest_cells_2level"), p2)
    val ex = "Exchange hashpartitioning".r
    assert(ex.findAllIn(p2).size == ex.findAllIn(p1).size,
      s"two-level added a hash exchange:\n$p2")
    val joins = "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
    assert(joins.findAllIn(p2).size == joins.findAllIn(p1).size,
      s"two-level added a join:\n$p2")
  }

  test("SQL-driven pack keeps the two-phase shape: no corpus-wide single-partition window") {
    val pSql = planOf("pack_sequences_sql")
    val pDf = planOf("pack_sequences")
    // the corpus-side window must be hash-partitioned on bucket; the
    // only SinglePartition exchange feeds the ~√n bucket-subtotal
    // window — exactly as many as the DataFrame twin has
    val sp = "Exchange SinglePartition".r
    assert(sp.findAllIn(pSql).size == sp.findAllIn(pDf).size,
      s"SQL pack gained a single-partition stage:\n$pSql")
    assert("Exchange hashpartitioning\\(bucket".r.findFirstIn(pSql).isDefined,
      s"per-bucket phase lost its hash partitioning:\n$pSql")
    assert(pSql.contains("BroadcastHashJoin"),
      s"bucket offsets must broadcast back, not shuffle the corpus:\n$pSql")
  }

  test("epoch mix is map-only on the corpus: broadcast quota join, one hash exchange total") {
    val p = planOf("q_mix_epochs")
    // the ONE hash exchange is the per-source quota aggregate (20
    // rows); the corpus side must see only the broadcast join + the
    // explode — a second hash exchange means the membership test
    // regressed to a rank/sort somewhere
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Generate explode"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("IVF coarse assignment is map-only: no exchange between corpus scan and bucket id") {
    // the round-9 contract: assignment is the nearest_cells projection
    // over the driver-held centroid matrix — no crossJoin, no per-
    // vec_id window, so NOTHING shuffles before candidate generation.
    // In the ivf searches the candidates join a broadcast query set,
    // leaving exactly ONE hash exchange in the whole plan (the
    // per-query rank window over already-pruned candidate rows)
    for (name <- Seq("sim_ivf", "sim_ivf_sq8", "sim_ivf_scaled",
                     "sim_ivf_sq8_scaled")) {
      val p = planOf(name)
      assert(p.contains("nearest_cells"), s"$name lost the map-only assignment:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name:\n$p")
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
        s"$name should shuffle only the rank window:\n$p")
    }
    // blocked/knn paths: the bucket equi-join is now genuinely the
    // ONLY corpus-wide shuffle mechanism — no nested-loop join anywhere
    for (name <- Seq("sim_knn_graph", "sim_knn_graph_scaled",
                     "dedup_embedding_blocked", "dedup_embedding_scaled")) {
      val p = planOf(name)
      assert(p.contains("nearest_cells"), s"$name lost the map-only assignment:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name:\n$p")
    }
  }

  test("hard-negative mining keeps the search plan shape: label filter fused, one hash exchange") {
    // scaled config: map-only nearest_cells assignment, label-mismatch
    // predicate inside the bucket equi-join (never a post-join filter
    // stage of its own), and exactly one hash exchange — the per-anchor
    // rank window over pruned candidates — like every sim_ivf_* plan
    val p = planOf("sim_hard_negatives_scaled")
    assert(p.contains("nearest_cells"), s"lost the map-only assignment:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"should shuffle only the rank window:\n$p")
    // exact config: the corpus never shuffles — broadcast anchors, one
    // rank-window exchange, and the label predicate in the join filter
    val pb = planOf("sim_hard_negatives")
    assert("Exchange hashpartitioning".r.findAllIn(pb).size == 1, pb)
    assert(pb.contains("BroadcastNestedLoopJoin") ||
           pb.contains("CartesianProduct"),
      s"exact path is the broadcast corpus×anchors scan by design:\n$pb")
  }

  test("triplet mining reads the corpus once: one scored join, no pos/neg self-join") {
    // one broadcast corpus×anchors join feeds BOTH the positive and
    // negative argmax (conditional max_by in one aggregate), so the
    // corpus parquet scans once — a pos⋈neg formulation would scan
    // and score it twice — and the only exchange is the partial→final
    // aggregate boundary (no rank window: nothing sorts candidates)
    val p = planOf("sim_triplets")
    assert("FileScan parquet".r.findAllIn(p).size == 2, // corpus + anchor slice
      s"expected exactly corpus + anchor scans:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"only the aggregate boundary should shuffle:\n$p")
    assert(!p.contains("Window"), s"no rank window expected:\n$p")
    // the struct-keyed max_by buffer is not hash-aggregable, so this
    // plans as SortAggregate — still partial+final with map-side
    // combine, which is the property that matters (the exchange
    // carries per-task partial maxima, not scored candidate rows)
    assert("SortAggregate".r.findAllIn(p).size == 2,
      s"expected partial+final aggregation:\n$p")
  }

  test("knn graph candidates come from a bucket equi-join with a bounded-heap top-k") {
    for (name <- Seq("sim_knn_graph", "sim_knn_graph_scaled")) {
      val p = planOf(name)
      // partial + final heap passes; candidates only ever pair within
      // a cell (equi-join on the cell id — the all-pairs cross product
      // is exactly what the IVF blocking exists to avoid)
      assert("GroupedTopK \\[".r.findAllIn(p).size == 2, p)
      assert(!p.contains("CartesianProduct"), p)
      assert("Join \\S*\\[bucket".r.findFirstIn(p).isDefined, p)
    }
  }

  test("epoch pack windows per hash bucket, never a copy-level global window") {
    val p = planOf("pipeline_epoch_pack")
    // the heavy cumulative sum must partition by hb (256 hash
    // buckets); an unpartitioned copy-level window is the
    // single-partition trap the two-phase sum exists to avoid (the
    // only global windows may be the 256-row bucket-offset pass and
    // the tiny quota table)
    assert("windowspecdefinition\\(hb#\\d+, rk#\\d+ ASC".r
      .findFirstIn(p).isDefined,
      s"no hb-partitioned copy-level window:\n$p")
  }

  test("quality sampling is map-only: zero hash exchanges, keep-filter pushed into the scan node") {
    val p = planOf("q_quality_sample")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 0, p)
    // the hash-threshold keep predicate must run as a scan-level data
    // filter, not a post-shuffle stage
    assert(p.contains("DataFilters: [isnotnull(doc_id"), p)
  }

  test("paragraph dedup is exactly two hash exchanges with a map-side first-occurrence prune") {
    val p = planOf("dedup_paragraphs")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges:\n$p")
    // rank<=1 must prune BEFORE the window (WindowGroupLimit), so the
    // segment-hash shuffle carries survivors-per-partition, not
    // everything
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("bm25 top-k plans as TakeOrderedAndProject with no exchange") {
    val p = planOf("text_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 0, p)
  }

  test("token-budget mix runs its prefix sum two-phase: doc-level window partitions by (source, sub-bucket)") {
    val p = planOf("q_token_budget_mix")
    // the heavy running sum must partition by (source, hb) — a doc-
    // level cumulative window partitioned by source alone is one task
    // per source scanning the whole quota (the single-partition trap)
    assert("windowspecdefinition\\(source#\\d+, hb#\\d+, rk#\\d+ ASC".r
      .findFirstIn(p).isDefined,
      s"no (source, hb)-partitioned doc-level window:\n$p")
    assert("windowspecdefinition\\(source#\\d+, rk#\\d+ ASC".r
      .findFirstIn(p).isEmpty,
      s"doc-level window still partitions by source alone:\n$p")
  }

  test("heavy-hitter verify broadcasts the candidate set as a semi-join; one hash exchange total") {
    val p = planOf("text_heavy_hitters")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    // only the candidate-token groupBy shuffles — never the full
    // token stream on its own
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
  }

  test("sequence examples pay exactly the one user_id window exchange") {
    val p = planOf("q_sequence_examples")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("skip-gram pairs generate in-row: no position self-join, no cartesian") {
    val p = planOf("text_skipgram_pmi")
    assert(!p.contains("CartesianProduct"), p)
    // pair rows come from Generate (explode of the in-row pair
    // array), never from a tokens⋈tokens position join: every join
    // in the plan keys on the token string (vocab side)
    assert(p.contains("Generate explode"), p)
    assert(!"Join.*pos".r.findFirstIn(p).isDefined, p)
  }

  test("z-order cell summary is map-only into one partial-agg exchange") {
    val p = planOf("q_zorder_layout")
    assert(!p.contains("Join"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
  }

  test("fertility is one scan, one source agg exchange, no join") {
    val p = planOf("text_fertility")
    assert(!p.contains("Join"), p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
  }

  test("outlier flag rides the UNSORTED map-only assignment: no join, one cluster exchange, one output sort") {
    val p = planOf("emb_outliers")
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
    // inheriting qEmbKmeans' presentation sort would add a second
    // range exchange the cluster window immediately destroys
    val ranges = "Exchange rangepartitioning".r.findAllIn(p).size
    assert(ranges == 1, s"expected 1 range exchange (output sort), got $ranges:\n$p")
    val hashes = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashes == 1, s"expected 1 hash exchange (cluster window), got $hashes:\n$p")
  }

  test("dsir scoring is one scan with no join and no hash exchange") {
    // both LMs ride as literal maps (the classifier-inference
    // contract): a vocabulary-table join or a shuffle would mean the
    // model leaked back into the data plane
    val p = planOf("text_dsir_weights")
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning".r.findFirstIn(p).isEmpty, p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("pass@k is map-only: one scan, no explode, no exchange except the output sort") {
    val p = planOf("eval_pass_at_k")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Generate"), "the 5 samples must fold as literal terms, not explode")
    assert("Exchange hashpartitioning".r.findFirstIn(p).isEmpty, p)
  }

  test("silhouette is map-only over the model literals: no join, no hash exchange") {
    val p = planOf("emb_silhouette")
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning".r.findFirstIn(p).isEmpty, p)
  }

  test("pack efficiency aggregates partial+final with no per-sequence materialization") {
    val p = planOf("pack_efficiency")
    assert(p.contains("HashAggregate"), p)
    // the report must NOT group by seq_id — only the pack's two-phase
    // prefix windows and one global aggregate
    assert(!p.contains("hashpartitioning(seq_id"), p)
  }

  test("domain cap and cluster sample select on the bounded heap, not a corpus window sort") {
    Seq("q_domain_cap", "emb_cluster_sample").foreach { g =>
      val p = planOf(g)
      assert(p.contains("GroupedTopK"), s"$g lost the bounded-heap operator:\n$p")
    }
  }

  test("whole-doc FFD pack: bucket-grouped kernel + BROADCAST bin offsets, no corpus-wide window") {
    val p = planOf("pack_whole_doc")
    // the per-bucket FFD state rides a groupByKey kernel (one bucket
    // exchange); the bin-count prefix comes back as a broadcast join,
    // never a corpus-side shuffle
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"bin offsets not broadcast:\n$p")
    // no window may partition by anything corpus-wide: the only Window
    // is the metadata-sized bucket-subtotal prefix (unpartitioned over
    // ~sqrt(n) rows AFTER the per-bucket aggregate)
    assert(!p.contains("windowspecdefinition(doc_id"), p)
  }
}
