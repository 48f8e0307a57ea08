package graft

/** Plan-shape pins for claims that live in query comments: a Spark
  * upgrade (or an innocent-looking query edit) must not silently
  * regress an optimized physical shape the 100 TB story depends on.
  * Style follows RangeJoinSpec's no-BNLJ pin: assert on the physical
  * plan string of the REGISTERED query. */
class PlanPinsSpec extends SparkSpec {

  test("tfidf_topk's rank<=3 cut compiles to WindowGroupLimit (partial " +
      "per-group top-k before the exchange, not a full per-doc sort)") {
    // the claim at TrainingQueries' tfidf comment: row_number over
    // (doc_id) filtered to rank<=3 triggers Spark's WindowGroupLimit
    // rewrite — each map task keeps only 3 rows per doc before the
    // window exchange, so the shuffle carries ~3·docs rows instead of
    // every (doc, token) score
    val df = SparkEntry.queries("tfidf_topk")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=3 no longer compiles to WindowGroupLimit:\n$plan")
    // both the partial (pre-exchange) and final passes are present
    assert("WindowGroupLimit".r.findAllIn(plan).length >= 2,
      s"expected partial+final WindowGroupLimit passes:\n$plan")
  }

  test("ann_topk_ivf_pruned's at-rest scan carries a dynamic partition " +
      "pruning filter on cell — probe reads touch ~nprobe/k of the " +
      "corpus directories, not all of them") {
    val df = SparkEntry.queries("ann_topk_ivf_pruned")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // DPP shows up as a dynamicpruning expression inside the parquet
    // scan's PartitionFilters; without it the broadcast join would
    // still be correct but would LIST AND READ every cell directory —
    // the difference between IVF and a full scan at 100 TB
    assert(plan.contains("dynamicpruningexpression(cell"),
      s"no dynamic partition pruning on the cell scan:\n$plan")
    // and it sits in the at-rest scan's PartitionFilters, not as a
    // post-scan data filter (the probe-side embeddings scans have
    // empty PartitionFilters, so anchor on the pruned one)
    assert(plan.split("PartitionFilters: \\[").exists(seg =>
      seg.takeWhile(_ != ']').contains("dynamicpruning")),
      s"dynamic pruning not inside PartitionFilters:\n$plan")
  }

  test("seq_gaps' rank<=20 cut compiles to WindowGroupLimit (partial " +
      "per-shard top-k before the rank exchange)") {
    val df = SparkEntry.queries("seq_gaps")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=20 no longer compiles to WindowGroupLimit:\n$plan")
  }

  test("bpe_pair_counts aggregates with map-side partials (the shuffle " +
      "carries per-pair partial counts, not raw corpus pairs)") {
    val df = SparkEntry.queries("bpe_pair_counts")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // two HashAggregates around the exchange = partial + final; a
    // single post-exchange aggregate would ship every exploded
    // char-pair row through the shuffle
    assert(plan.contains("partial_count"),
      s"no partial aggregation before the pair exchange:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"unexpected join in a scan-aggregate query:\n$plan")
  }

  test("seq_gaps_bucketed's event sort partitions on (shard, bucket) — " +
      "the deep-backfill variant's whole point is sort tasks " +
      "proportional to shards x buckets, not one per shard") {
    val df = SparkEntry.queries("seq_gaps_bucketed")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the lag/prune windows must carry BOTH keys in their partition
    // spec; a shard-only windowspec would mean the bucketing silently
    // collapsed back to the one-task-per-shard ceiling
    assert("windowspecdefinition\\(shard_id#\\d+, bucket#\\d+".r
      .findFirstIn(plan).isDefined,
      s"no (shard_id, bucket)-partitioned window in the plan:\n$plan")
    // and the per-bucket rank<=20 prune compiles to WindowGroupLimit
    // like seq_gaps' own cut
    assert(plan.contains("WindowGroupLimit"),
      s"per-bucket prune lost its WindowGroupLimit shape:\n$plan")
  }

  test("bpe_merges' per-round pair count keeps map-side partials (each " +
      "merge round's exchange carries vocab-bounded partials, not the " +
      "raw corpus pair stream)") {
    // the claim in bpe_merges' comment: every round of the merge loop
    // re-counts through this same helper, so ONE pinned plan covers
    // all five rounds' exchanges
    val words = graft.queries.TrainingQueries.bpeInitialWords(spark, sf0001)
    val plan = graft.queries.TrainingQueries.bpePairCounts(words)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"),
      s"no partial aggregation before the per-round pair exchange:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"unexpected join in a scan-aggregate round:\n$plan")
  }

  test("bpe_encode's per-doc aggregate keeps map-side partials (the " +
      "shuffle carries one partial row per doc, not the encoded word " +
      "stream) and the encode pass joins nothing") {
    val df = SparkEntry.queries("bpe_encode")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"),
      s"no partial aggregation before the doc-keyed exchange:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin") &&
      !plan.contains("CartesianProduct"),
      s"encode is a map + aggregate; unexpected join:\n$plan")
  }

  test("embedding_code_dups' candidate join is a hash equi-join on the " +
      "M-code tuple (blocking must never degrade into a pairwise " +
      "nested-loop over the corpus)") {
    val df = SparkEntry.queries("embedding_code_dups")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"code blocking fell back to a nested-loop join:\n$plan")
  }

  test("ann_topk_ivf_append broadcasts the probe side over the appended " +
      "corpus scan (the ingest path must not shuffle old+new vectors)") {
    val df = SparkEntry.queries("ann_topk_ivf_append")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"probe join is not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"appended corpus shuffles before the probe join:\n$plan")
  }

  test("dedup_source_matrix's source lookups are hash equi-joins on the " +
      "unshifted id (a nested-loop fallback would be pairs x corpus)") {
    val df = SparkEntry.queries("dedup_source_matrix")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"source lookup fell back to a nested-loop join:\n$plan")
  }

  test("dedup_span_trim keeps the doc-frequency shape end to end (no " +
      "nested-loop join anywhere in occurrence/covered/reassembly stages)") {
    val df = SparkEntry.queries("dedup_span_trim")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"span-trim stage fell back to a nested-loop join:\n$plan")
  }

  test("semantic_dedup's within-cell pair join is a hash equi-join on " +
      "cell (the SemDeDup cost model is sum of |cell| squared, never " +
      "a corpus-wide nested loop)") {
    val df = SparkEntry.queries("semantic_dedup")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"cell pair join fell back to a nested-loop shape:\n$plan")
    // the per-cell rollups keep map-side partials, so the exchanges
    // carry cell-keyed partial counts, not raw pair/member rows
    assert(plan.contains("partial_count"),
      s"no partial aggregation in the per-cell rollups:\n$plan")
  }

  test("epoch_shuffle's per-shard position window sorts WITHIN the " +
      "shard exchange (one hash exchange on shard, no global sort " +
      "before the windows)") {
    val df = SparkEntry.queries("epoch_shuffle")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the position window must partition by shard — a missing
    // partitionBy would compile to a single-partition global window,
    // the exact shape the query exists to avoid at 100 TB
    assert(plan.contains("hashpartitioning(shard"),
      s"no shard-keyed exchange feeding the position window:\n$plan")
  }

  test("bm25_batch's per-query rank<=5 cut compiles to " +
      "WindowGroupLimit (partial per-query top-k before the exchange)") {
    val df = SparkEntry.queries("bm25_batch")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=5 no longer compiles to WindowGroupLimit:\n$plan")
  }

  test("q5_local_revenue's 6-way star join is one broadcast-hash " +
      "pipeline — lineitem never shuffles before the nation aggregate") {
    val df = SparkEntry.queries("q5_local_revenue")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"dimensions not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      s"a dimension join shuffled the fact stream:\n$plan")
  }

  test("window_topk's rank<=3 cut compiles to WindowGroupLimit " +
      "(partial per-hour top-k before the rank exchange)") {
    val df = SparkEntry.queries("window_topk")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=3 no longer compiles to WindowGroupLimit:\n$plan")
  }

  test("ann_topk_ivfpq_pruned's at-rest code scan carries dynamic " +
      "partition pruning on cell (probe IO = nprobe/k directories of " +
      "M-code rows — the IVF-PQ storage story end-to-end)") {
    val df = SparkEntry.queries("ann_topk_ivfpq_pruned")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression(cell"),
      s"no dynamic partition pruning on the code scan:\n$plan")
    assert(plan.split("PartitionFilters: \\[").exists(seg =>
      seg.takeWhile(_ != ']').contains("dynamicpruning")),
      s"dynamic pruning not inside PartitionFilters:\n$plan")
  }

  test("bm25_topk's global top-10 compiles to TakeOrderedAndProject " +
      "(per-partition bounded heaps, never a full corpus sort)") {
    val df = SparkEntry.queries("bm25_topk")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"orderBy+limit no longer compiles to TakeOrdered:\n$plan")
    // and the postings filter reaches the scan: the explode feeds a
    // query-term filter, so the shuffle carries postings, not corpus
    assert(plan.contains("partial_count"),
      s"tf aggregate lost its map-side partials:\n$plan")
  }

  test("dup_span_report never expands pairwise (doc-frequency pattern: " +
      "distinct spans, span-keyed counts, one join back)") {
    val df = SparkEntry.queries("dup_span_report")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"span join fell back to a nested-loop shape:\n$plan")
    // the doc-freq aggregate runs partial+final like every count here
    assert(plan.contains("partial_count"),
      s"no partial aggregation in the span doc-freq pass:\n$plan")
  }

  test("q18_big_orders aggregates before joining: TakeOrdered top-20 " +
      "from a partial+final quantity aggregate, then broadcast joins " +
      "only — lineitem rows never shuffle with order payloads") {
    val df = SparkEntry.queries("q18_big_orders")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 no longer compiles to TakeOrdered:\n$plan")
    assert(plan.contains("partial_sum"),
      s"quantity aggregate lost its map-side partials:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"20-row frame not broadcast into orders/customer:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a join shuffled instead of broadcasting:\n$plan")
  }

  test("scd2_dimension runs both windows (lag + lead/row_number) over " +
      "ONE customer exchange — gaps-and-islands must not re-shuffle " +
      "between change detection and interval closing") {
    val df = SparkEntry.queries("scd2_dimension")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1,
      s"expected exactly one hash exchange (shared by both windows):" +
        s"\n$plan")
  }

  test("erasure_sweep's tombstone restriction is a broadcast semi-join " +
      "against the fact scan, never a shuffled join") {
    val df = SparkEntry.queries("erasure_sweep")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"),
      s"tombstone semi-join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"tombstone join shuffled the fact table:\n$plan")
  }

  test("matryoshka_topk's coarse stage runs through the native " +
      "bounded-heap top-k node (partial+final around the exchange), " +
      "and the re-rank joins broadcast") {
    val df = SparkEntry.queries("matryoshka_topk")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup(partial=true, k=50)"),
      s"coarse shortlist lost the partial bounded heap:\n$plan")
    assert(plan.contains("TopKPerGroup(partial=false, k=50)"),
      s"coarse shortlist lost the final bounded heap:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a shortlist-sized re-rank join shuffled the corpus:\n$plan")
  }

  test("heaps_law's first-bucket trick keeps partial aggregation (the " +
      "vocab exchange carries per-term partial minima, not raw " +
      "token occurrences) and joins nothing pairwise") {
    val df = SparkEntry.queries("heaps_law")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"),
      s"per-term min lost its map-side partials:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("SortMergeJoin"),
      s"checkpoint join went pairwise or shuffled:\n$plan")
  }

  test("q10_returns: TakeOrdered top-20 then broadcast display joins " +
      "(customer and nation never shuffle against the 20-row frame)") {
    val df = SparkEntry.queries("q10_returns")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 no longer compiles to TakeOrdered:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      s"display joins not broadcast:\n$plan")
  }

  test("q17_small_qty: the correlated rewrite runs both window " +
      "moments over ONE partkey exchange, with the brand filter " +
      "broadcast into the lineitem scan") {
    val df = SparkEntry.queries("q17_small_qty")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1,
      s"expected exactly one hash exchange for the window pair:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"brand dimension not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"part join shuffled the fact table:\n$plan")
  }

  test("cdc_merge's full-outer merge never degrades to a nested-loop " +
      "shape (the one-join MERGE INTO claim)") {
    val df = SparkEntry.queries("cdc_merge")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"),
      s"merge lost its full-outer join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"merge degraded to a nested loop:\n$plan")
  }

  test("bpe_fertility applies the memoized merge table with no join " +
      "at all — the learned merges are driver-side literals, so the " +
      "encode pass is one scan plus shrinking aggregates") {
    val df = SparkEntry.queries("bpe_fertility")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"encode pass acquired a join — the merge table should be " +
        s"driver-memoized literals:\n$plan")
    assert(plan.contains("partial_count"),
      s"language rollup lost its map-side partials:\n$plan")
  }

  test("fuzzy_name_pairs blocks on the COMPOUND (word, length-bucket) " +
      "key with the doc-freq cap applied before the pair join (the " +
      "r13 quadratic-block fix)") {
    val df = SparkEntry.queries("fuzzy_name_pairs")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the pair join must carry BOTH block columns as equi-keys — a
    // word-only key would mean the length bucketing silently fell out
    // and block candidates are quadratic in the dictionary again
    assert("\\[word#\\d+, lb#\\d+L?\\]".r.findFirstIn(plan).isDefined,
      s"pair join no longer keyed on (word, lb):\n$plan")
    // the cap is a semi-join against the df<=200 key set, upstream of
    // the pair join; its aggregate keeps map-side partials
    assert(plan.contains("LeftSemi"),
      s"doc-freq cap semi-join missing:\n$plan")
    assert(plan.contains("partial_count"),
      s"block doc-freq aggregate lost map-side partials:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"blocking degraded to a nested loop:\n$plan")
  }

  test("domain_cap runs the blocklist as a broadcast anti-join and " +
      "the per-domain cap through the native bounded-heap top-k " +
      "(partial+final around the exchange — never a per-domain sort)") {
    val df = SparkEntry.queries("domain_cap")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup(partial=true"),
      s"cap lost its partial bounded-heap pass:\n$plan")
    assert(plan.contains("TopKPerGroup(partial=false"),
      s"cap lost its final bounded-heap pass:\n$plan")
    // toString renders join type after the key lists —
    // "BroadcastHashJoin [...], [...], LeftAnti, BuildRight"
    assert(plan.contains("LeftAnti") &&
      plan.contains("BroadcastHashJoin"),
      s"blocklist not a broadcast anti-join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"blocklist anti-join shuffled:\n$plan")
  }

  test("domain_dup_matrix stays hash-equi-join end to end (fingerprint " +
      "and doc_id keys — a nested-loop fallback would be pairs x " +
      "corpus)") {
    val df = SparkEntry.queries("domain_dup_matrix")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"dup matrix degraded to a nested loop:\n$plan")
    assert(plan.contains("partial_count"),
      s"fingerprint doc-freq cap lost map-side partials:\n$plan")
  }

  test("rfm_segments_approx classifies with histogram cuts — no " +
      "ntile, no customer-dimension global sort; the only ordering " +
      "windows are bucket-histogram cumulations above aggregates") {
    val df = SparkEntry.queries("rfm_segments_approx")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("ntile"),
      s"approx RFM reacquired a global ntile sort:\n$plan")
    // the breakpoint frames join in as 1-row broadcasts, and the
    // histogram aggregates keep map-side partials (the shuffle
    // carries per-bucket partial counts, never customers)
    assert(plan.contains("partial_count"),
      s"histogram aggregates lost map-side partials:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"breakpoint frames are not broadcast:\n$plan")
  }

  test("interval_overlap plans as a hash equi-join on (nation, bin) — " +
      "never the BroadcastNestedLoopJoin the naive two-sided interval " +
      "ON-clause produces") {
    val df = SparkEntry.queries("interval_overlap")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval overlap degraded to a nested-loop join:\n$plan")
    assert(plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"no hash/merge equi-join node in the overlap plan:\n$plan")
  }

  test("dp_count_release is one partial-aggregable scan + per-row " +
      "ladder arithmetic — no join, no window, nothing past the " +
      "source-cardinality exchange") {
    val df = SparkEntry.queries("dp_count_release")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"),
      s"source aggregate lost map-side partials:\n$plan")
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"unexpected join/window in a scan-aggregate release:\n$plan")
  }

  test("dp_histogram_release is scan + two shrinking aggregates + " +
      "per-row ladder — no join, no window; the contribution clamp " +
      "(user×bucket distinct) keeps map-side partials") {
    val df = SparkEntry.queries("dp_histogram_release")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"),
      s"bucket aggregate lost map-side partials:\n$plan")
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"unexpected join/window in a scan-aggregate release:\n$plan")
  }

  test("frontier_refresh_plan aggregates with map-side partials and " +
      "ranks in ONE domains-bounded window — no corpus-sized sort") {
    val df = SparkEntry.queries("frontier_refresh_plan")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"),
      s"domain aggregate lost map-side partials:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"unexpected nested loop:\n$plan")
    // the rank window must sit ABOVE the domain aggregate (its input
    // is domain-cardinality), which the partial/final agg pair plus a
    // single Window node in the plan certifies
    assert("Window".r.findAllIn(plan).length >= 1,
      s"priority rank window missing:\n$plan")
  }

  test("ingest_changepoint's CUSUM windows run over the FIXED 200-" +
      "bucket histogram (broadcast extent, no corpus-proportional " +
      "single-partition sort)") {
    val df = SparkEntry.queries("ingest_changepoint")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the extent frame joins in as a broadcast nested loop over ONE
    // row (the house's documented 1-row-global shape) and the bucket
    // projection divides by the broadcast extent — assert the fixed
    // bucket arithmetic reached the plan
    assert(plan.contains("* 200"),
      s"fixed 200-bucket projection missing from the plan:\n$plan")
    // the ordering windows must sit above the bucket AGGREGATE (≤200
    // rows), not above the raw doc scan: the aggregate's partial pass
    // proves per-bucket char sums combine map-side first
    assert(plan.contains("partial_sum"),
      s"bucket char-sum aggregate lost map-side partials:\n$plan")
  }

  test("robots_policy decides per URL in the SCAN stage via the " +
      "collected-and-broadcast compiled rule map (r22 verdict #4): " +
      "the answer plan has NO join at all, no per-URL max_by " +
      "exchange, and the only aggregate past the scan is the " +
      "domains-sized rollup") {
    val df = SparkEntry.queries("robots_policy")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"robots_policy regrew a join — the broadcast rule map " +
        s"decides joins-free:\n$plan")
    assert(!plan.contains("max_by"),
      s"the per-URL max_by exchange is back — the compiled " +
        s"RobotsMatch kernel should decide in the scan stage:\n$plan")
    assert(plan.contains("UDF"),
      s"RobotsMatch kernel probe missing from the plan:\n$plan")
  }

  test("robots_wildcard keeps robots_policy's shape under the RFC " +
      "9309 grammar: the compiled kernel matches the grammar " +
      "directly against the broadcast rule map (no per-row LIKE " +
      "translation), no join, no per-URL max_by exchange") {
    val df = SparkEntry.queries("robots_wildcard")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"robots_wildcard regrew a join — the broadcast rule map " +
        s"decides joins-free:\n$plan")
    assert(!plan.contains("max_by") && !plan.contains(" LIKE "),
      s"per-URL max_by / LIKE probe is back — the compiled " +
        s"RobotsMatch kernel should decide in the scan stage:\n$plan")
    assert(plan.contains("UDF"),
      s"RobotsMatch kernel probe missing from the plan:\n$plan")
  }

  test("anchor_text_topk's cut runs through the NATIVE top-k node, " +
      "partial before the exchange and final after it") {
    val df = SparkEntry.queries("anchor_text_topk")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup(partial=true"),
      s"partial bounded-heap pass missing:\n$plan")
    assert(plan.contains("TopKPerGroup(partial=false"),
      s"final bounded-heap pass missing:\n$plan")
  }

  test("the iterative/sketch r16 additions keep every join hashed — " +
      "no nested-loop anywhere in redirect_resolve, crawl_depth_bfs, " +
      "cms_bigram_report or hdr_value_quantiles") {
    Seq("redirect_resolve", "crawl_depth_bfs", "cms_bigram_report",
        "hdr_value_quantiles").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$name grew a nested loop:\n$plan")
    }
  }

  test("the r17 sketch/audit additions keep their scale shapes: " +
      "merge rows and the sketch-only rows stay partial-aggregable " +
      "with hashed joins only; politeness_schedule is one exchange + " +
      "per-host window, join-free") {
    Seq("hll_shingle_sketch", "cms_bigram_sketch", "hll_merge_shards",
        "cms_merge_shards", "politeness_schedule").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$name grew a nested loop:\n$plan")
      assert(plan.contains("partial_max") ||
        plan.contains("partial_sum") || plan.contains("partial_count") ||
        name == "politeness_schedule",
        s"$name lost its map-side partial aggregate:\n$plan")
    }
    val politePlan = SparkEntry.queries("politeness_schedule")(
      spark, sf0001).queryExecution.executedPlan.toString
    assert(!politePlan.contains("Join"),
      s"politeness_schedule grew a join:\n$politePlan")
    // hll_pair_overlap's pairs frame is an inequality cross of the
    // SOURCES list — sources²-bounded by design (scaladoc); pin that
    // the only nested-loop input is that sketch-sized frame, i.e. the
    // corpus-scale branches (registers, exact audit) stay hashed
    val overlap = SparkEntry.queries("hll_pair_overlap")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(overlap.contains("SortMergeJoin") ||
      overlap.contains("BroadcastHashJoin"),
      s"hll_pair_overlap lost its hashed corpus-side joins:\n$overlap")
  }

  test("the r18 sketch-only pair twins hold ONE corpus scan: the " +
      "register/sketch frame is checkpointed at construction, so the " +
      "final plan reads NO parquet — every join input is " +
      "sketch-sized (<= sources x 256 rows)") {
    Seq("hll_pair_estimate", "kmv_pair_estimate").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("FileScan") && !plan.contains("Scan parquet"),
        s"$name's final plan re-reads the corpus — the checkpointed " +
          s"sketch frame stopped carrying the scan:\n$plan")
      assert(plan.contains("Scan ExistingRDD") ||
        plan.contains("LogicalRDD") || plan.contains("ExistingRDD"),
        s"$name lost its checkpointed sketch input:\n$plan")
      // (the sources-list inequality pair expansion is a nested loop
      // by design — sources²-bounded, never corpus-sized, same as the
      // r17 hll_pair_overlap pin above)
    }
  }

  test("the sliding sketch-only twins are ONE-PASS, JOIN-FREE plans " +
      "(r22 verdict #2): a single events scan feeds the " +
      "anchor-exploded window aggregate directly — no day-grain " +
      "pre-aggregate + checkpoint, no days-distinct, no anchor join " +
      "(r21's equi-join and r20's BroadcastNestedLoopJoin are both " +
      "gone); the 7x anchor fan-out is absorbed by the map-side " +
      "partial aggregate, so the exchange stays (days+6) x " +
      "registers/buckets-bounded") {
    Seq("hll_sliding_estimate", "hdr_sliding_sketch").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Join"),
        s"$name gained a join — the single-pass window aggregate " +
          s"needs none:\n$plan")
      assert(!plan.contains("Scan ExistingRDD") &&
        !plan.contains("ExistingRDD"),
        s"$name re-grew a checkpointed intermediate — the one-pass " +
          s"shape reads the corpus directly:\n$plan")
      val scans = "FileScan".r.findAllIn(plan).length
      assert(scans == 1,
        s"$name must scan the events corpus exactly ONCE, found " +
          s"$scans FileScans:\n$plan")
    }
  }

  test("hll_pair_from_table's answer-time plan scans ONLY the " +
      "persisted sketch table: its FileScans read the hll_regs " +
      "parquet layout, and the documents corpus appears nowhere — " +
      "the restart-safe persisted-sketch path (r18 verdict task #4)") {
    val plan = SparkEntry.queries("hll_pair_from_table")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hll_regs_"),
      s"answer-time plan lost its sketch-table scan:\n$plan")
    assert(!plan.contains("documents"),
      s"answer-time plan touches the corpus — the pair algebra must " +
        s"read the persisted register table alone:\n$plan")
  }

  test("kmv_pair_from_table's answer-time plan scans ONLY the " +
      "persisted bottom-k table: its FileScans read the kmv_sketch " +
      "parquet layout, and the documents corpus appears nowhere — " +
      "the persisted-table pair path for the measured-better " +
      "estimator (r19 verdict task #2)") {
    val plan = SparkEntry.queries("kmv_pair_from_table")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("kmv_sketch_"),
      s"answer-time plan lost its sketch-table scan:\n$plan")
    assert(!plan.contains("documents"),
      s"answer-time plan touches the corpus — the pair algebra must " +
        s"read the persisted bottom-k table alone:\n$plan")
  }

  test("hll_sliding_from_table's answer-time plan scans ONLY the " +
      "persisted day-grain register table: its FileScans read the " +
      "hll_day_regs parquet layout, and the events corpus appears " +
      "nowhere — the durable sliding estimator (r19 verdict task #1)") {
    val plan = SparkEntry.queries("hll_sliding_from_table")(
        spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hll_day_regs_"),
      s"answer-time plan lost its sketch-table scan:\n$plan")
    assert(!plan.contains("events"),
      s"answer-time plan touches the corpus — the window algebra " +
        s"must read the persisted per-day register table alone:\n$plan")
  }

  test("hdr_sliding_from_table's answer-time plan scans ONLY the " +
      "persisted day-grain histogram table: its FileScans read the " +
      "hdr_day_hist parquet layout, and the events corpus appears " +
      "nowhere — durable-table symmetry for the quantile family " +
      "(r20, completing both sliding estimators)") {
    val plan = SparkEntry.queries("hdr_sliding_from_table")(
        spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hdr_day_hist_"),
      s"answer-time plan lost its sketch-table scan:\n$plan")
    assert(!plan.contains("events"),
      s"answer-time plan touches the corpus — the window algebra " +
        s"must read the persisted per-day histogram table alone:\n$plan")
  }

  test("cms_table_ingest's answer-time plan scans ONLY the persisted " +
      "cell table: its FileScans read the cms_cells parquet layout, " +
      "and the documents corpus appears nowhere — durable at-rest " +
      "coverage now spans all four sketch families (r20)") {
    val plan = SparkEntry.queries("cms_table_ingest")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("cms_cells_"),
      s"answer-time plan lost its sketch-table scan:\n$plan")
    assert(!plan.contains("documents"),
      s"answer-time plan touches the corpus — the cell-add merge " +
        s"must read the persisted cell table alone:\n$plan")
  }

  test("hll/kmv_table_ingest answer-time plans are corpus-free (r21 " +
      "single-scan tagging): the batch sketch reads the checkpointed " +
      "slice split, so the one corpus pass happens at construction " +
      "and the answer plan sees only the persisted table + checkpoint") {
    for ((q, table) <- Seq("hll_table_ingest" -> "hll_ingest_",
        "kmv_table_ingest" -> "kmv_ingest_")) {
      val plan = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(plan.contains(table),
        s"$q answer-time plan lost its sketch-table scan:\n$plan")
      assert(!plan.contains("documents"),
        s"$q answer-time plan touches the corpus — the merge must " +
          s"read the persisted table + the checkpointed batch " +
          s"slice alone:\n$plan")
    }
  }
}
