package graft

/** Cross-cutting determinism: the README claims results are
  * bit-deterministic across parallelism levels — this spec pins it
  * for the gates where nondeterminism would be easiest to introduce
  * (anything ranked by hash order, prefix-summed, iterated to a
  * fixpoint, or selected by quota). Each query runs under two
  * different shuffle-partition settings (a runtime-mutable conf) and
  * the collected rows must be IDENTICAL, not merely equivalent —
  * the driver's oracle hashes rows, so a partitioning-dependent tie
  * break would fail the gate only on some machines, which is the
  * worst kind of flake. */
class DeterminismSpec extends SparkSpec {

  private val Sensitive = Seq(
    "pack_sequences",      // distributed prefix sum
    "q_global_shuffle",    // hash-bucketed global rank
    "q_stratified_sample", // md5 rank + heap prune + quota
    "q_token_budget_mix",  // greedy per-source prefix fill
    "q_temperature_mix",   // largest-remainder quotas
    "dedup_clusters_dist", // iterative label propagation
    "emb_kmeans",          // iterative fitting, driver-side model
    "dedup_semantic_scaled", // kmeans + cluster-keyed prune
    "dedup_keep_best",     // heap-selected rank over cluster labels
    "pipeline_funnel",     // window-flagged counts over LSH drops
    "sim_ivf_scaled",      // √n-cell assignment + per-query rank
    "sim_ivf_sq8_scaled",  // + SQ8 reconstruction scoring
    "sim_ivf_indexed",     // persisted-index round trip (build+search)
    "pack_sequences_precounted", // column-fed two-phase prefix sum
    "q_mix_epochs",        // quota-driven hash-threshold copies
    "sim_knn_graph_scaled", // √n-cell candidates + per-vector heap top-k
    "pipeline_epoch_pack", // resample + hash order + two-phase prefix sum
    "text_overlap_kmv")    // md5-ranked k-min sketch + pair rank

  test("hash-ranked / iterative / quota gates are identical across shuffle parallelism") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      Sensitive.foreach { name =>
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        val a = SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq).toSeq
        spark.conf.set("spark.sql.shuffle.partitions", "11")
        val b = SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq).toSeq
        assert(a == b, s"$name differs across shuffle parallelism")
        assert(a.nonEmpty, s"$name returned no rows — vacuous check")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
