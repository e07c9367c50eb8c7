package graft

import graft.operators.Pipeline

/** Invariants of the end-to-end pre-training corpus build that the
  * row-hash oracle implies but doesn't state: the eval holdout can
  * never leak into the packed corpus, and packing is a valid
  * concat-and-chunk assignment over the survivors. */
class PretrainCorpusSpec extends SparkSpec {

  test("eval docs never reach the packed corpus; packing is valid") {
    val rows = Pipeline.qPretrainCorpus(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) % 20 != 0), "eval doc leaked into corpus")
    val seqIds = rows.map(_.getAs[Long]("seq_id"))
    val offs = rows.map(_.getAs[Long]("seq_offset"))
    assert(offs.forall(o => o >= 0 && o < 256))
    assert(seqIds.head == 0L, "packing must start at sequence 0")
    assert(seqIds.zip(seqIds.tail).forall { case (a, b) => b >= a },
      "doc_id-ordered packing can never go backwards")
    // curation must have dropped something relative to the raw pool
    // (the fixture plants dups and contaminated docs)
    val pool = Tables.documents(spark, sf)
      .where(org.apache.spark.sql.functions.expr("doc_id % 20 != 0")).count()
    assert(rows.length < pool, s"nothing was curated: ${rows.length} of $pool")
  }

  test("model-gated corpus: same packing invariants, classifier-consistent survivors") {
    val rows = Pipeline.qPretrainCorpusModel(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) % 20 != 0), "eval doc leaked into corpus")
    val offs = rows.map(_.getAs[Long]("seq_offset"))
    assert(offs.forall(o => o >= 0 && o < 256))
    val seqIds = rows.map(_.getAs[Long]("seq_id"))
    assert(seqIds.head == 0L && seqIds.zip(seqIds.tail).forall { case (a, b) => b >= a })
    // every survivor passed the classifier: its rounded prob ≥ 0.5 −
    // half a rounding step (the gate is on the unrounded value)
    assert(rows.forall(_.getAs[Double]("quality") >= 0.4999))
    // the standalone classifier gate agrees doc for doc on the keeps
    val kept = operators.TextAnalysis.qTextQualityClassifier(spark, sf)
      .collect().filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(rows.forall(r => kept(r.getLong(0))),
      "a packed doc was not a classifier keep")
    // and the model gate differs from the heuristic gate (the two
    // builds must not be accidentally identical)
    val v1 = Pipeline.qPretrainCorpus(spark, sf).collect().map(_.getLong(0)).toSet
    val v2 = rows.map(_.getLong(0)).toSet
    assert(v1 != v2, "model gate should select a different corpus than the heuristic")
  }
}
