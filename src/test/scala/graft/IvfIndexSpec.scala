package graft

import graft.operators.Similarity

/** The materialized-IVF-index contract: build once, then search
  * touches only the probed cells of the persisted index — no
  * assignment recompute, no quantization, no corpus-wide scan. The
  * sim_ivf_indexed oracle gate proves the VALUES match the recompute
  * path; this spec proves the search PLAN is the index plan (the
  * whole point of materializing — a search that silently recomputed
  * the assignment would still pass the oracle).
  */
class IvfIndexSpec extends SparkSpec {

  private val IndexName = "ivf_index_spec"

  private lazy val built: Unit =
    Similarity.buildIvfIndex(spark, sf, IndexName)

  private def searchPlan(nProbes: Int) = {
    built
    Similarity.searchIvfIndex(spark, sf, IndexName, nProbes)
      .queryExecution.executedPlan.toString
  }

  test("index build persists codes + coarse quantizer, not vectors") {
    built
    val idx = spark.table(IndexName)
    assert(idx.columns.sorted.toSeq == Seq("bucket", "codes", "scl", "vec_id", "vmin"),
      idx.columns.mkString(","))
    assert(!idx.columns.contains("embedding"),
      "index must store SQ8 codes, not raw vectors — that is the memory contract")
    val cent = spark.table(s"${IndexName}_centroids")
    assert(cent.count() == 8)
  }

  test("search scans only probed cells: bucket pruning fires on the index scan") {
    val p = searchPlan(nProbes = 1)
    // the bucketed-table scan must report pruned file buckets
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(p)
      .getOrElse(fail(s"no bucket pruning in search plan:\n$p"))
    assert(sel.group(1).toInt < sel.group(2).toInt,
      s"scan reads every file bucket (${sel.group(1)}/${sel.group(2)}):\n$p")
  }

  test("search does not recompute the assignment: one embeddings scan (the query slice), pushed down") {
    val p = searchPlan(nProbes = 1)
    val embScans = "embeddings\\.parquet".r.findAllIn(p).size
    assert(embScans == 1,
      s"expected exactly 1 embeddings scan (queries), got $embScans:\n$p")
    // and that scan is the query slice, not the corpus: the vec_id
    // predicate reaches the reader
    assert(p.contains("LessThan(vec_id,10)"), p)
  }

  test("indexed search reproduces the recompute path (sim_ivf_sq8) exactly") {
    built
    val viaIndex = Similarity.searchIvfIndex(spark, sf, IndexName, nProbes = 1)
      .collect().map(_.toSeq).toSeq
    val recompute = Similarity.qSimIvfSq8(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(viaIndex == recompute)
  }

  test("incremental append equals a full rebuild") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // first half carries all 8 quantizer vectors (vec_id < 8), so the
    // half-built index trains the SAME quantizer as a full build; the
    // second half is then appended against the persisted quantizer —
    // every appended row must land exactly where a rebuild puts it
    Similarity.buildIvfIndexFrom(emb.where(org.apache.spark.sql.functions
      .col("vec_id") < 250), "ivf_index_spec_inc", 8)
    Similarity.appendToIvfIndex(spark, "ivf_index_spec_inc",
      emb.where(org.apache.spark.sql.functions.col("vec_id") >= 250))
    built
    val full = Similarity.searchIvfIndex(spark, sf, IndexName, nProbes = 2)
      .collect().map(_.toSeq).toSeq
    val inc = Similarity.searchIvfIndex(spark, sf, "ivf_index_spec_inc",
      nProbes = 2).collect().map(_.toSeq).toSeq
    assert(inc == full)
    // and the appended table still prunes
    val p = Similarity.searchIvfIndex(spark, sf, "ivf_index_spec_inc",
      nProbes = 1).queryExecution.executedPlan.toString
    assert(p.contains("SelectedBucketsCount"), p)
  }

  test("nprobe widens the candidate set monotonically") {
    built
    // top-k per query can only improve (sim non-decreasing per rank)
    // as more cells are probed; row count stays |q|·k once cells are
    // non-empty. Cheap sanity that the dial is wired through.
    val p1 = Similarity.searchIvfIndex(spark, sf, IndexName, nProbes = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val p2 = Similarity.searchIvfIndex(spark, sf, IndexName, nProbes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    p1.keys.foreach { k =>
      assert(p2.contains(k) && p2(k) >= p1(k) - 1e-12,
        s"rank $k got worse with nprobe=2: ${p1(k)} -> ${p2.get(k)}")
    }
  }
}
