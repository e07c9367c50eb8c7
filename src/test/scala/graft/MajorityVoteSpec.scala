package graft

import graft.operators.EvalScoring

/** Majority-vote label aggregation (eval_majority_vote): the oracle
  * gate pins the rows; this spec pins the vote semantics on crafted
  * panels — strict majority, deterministic tie-break to the smaller
  * label, unanimity detection, and rater-count independence.
  */
class MajorityVoteSpec extends SparkSpec {

  import spark.implicits._

  private def run(votes: Seq[(Long, Int, String)]) =
    EvalScoring.majorityVote(votes.toDF("item_id", "rater", "label"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))

  test("strict majority wins; unanimity flagged only when all agree") {
    val out = run(Seq(
      (1L, 1, "en"), (1L, 2, "en"), (1L, 3, "zz"),   // 2-1 majority
      (2L, 1, "fr"), (2L, 2, "fr"), (2L, 3, "fr")))  // unanimous
    assert(out.toSet == Set(
      (1L, "en", 2L, false),
      (2L, "fr", 3L, true)))
  }

  test("exact tie breaks to the lexicographically smaller label") {
    val out = run(Seq(
      (1L, 1, "de"), (1L, 2, "aa"),
      (2L, 1, "zz"), (2L, 2, "en"), (2L, 3, "zz"), (2L, 4, "en")))
    assert(out.toSet == Set(
      (1L, "aa", 1L, false),
      (2L, "en", 2L, false)))
  }

  test("panel sizes can differ per item") {
    val out = run(Seq(
      (1L, 1, "en"),
      (2L, 1, "fr"), (2L, 2, "fr"), (2L, 3, "fr"), (2L, 4, "fr"), (2L, 5, "de")))
    assert(out.toSet == Set(
      (1L, "en", 1L, true),
      (2L, "fr", 4L, false)))
  }

  test("the gate's synthetic panel exercises both agreement regimes") {
    val out = EvalScoring.qEvalMajorityVote(spark, sf).collect()
    val unanimous = out.count(_.getBoolean(3))
    assert(unanimous > 0 && unanimous < out.length)
    // every doc has exactly one row
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.length.toLong == nDocs)
  }

  test("the RLHF audit composition reconciles with its own stages") {
    import org.apache.spark.sql.functions._
    val row = graft.operators.Pipeline.qRlhfAudit(spark, sf).head()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val nItems = row.getAs[Long]("n_items")
    val nClean = row.getAs[Long]("n_clean")
    val nPairs = row.getAs[Long]("n_pairs")
    assert(nItems == nDocs, "stage 1 must label every doc")
    assert(nClean < nItems && nClean > 0, "the rater-QA gate must actually cut")
    assert(nPairs <= nClean, "pairs only form over clean prompts")
    assert(row.getAs[Double]("mean_margin") > 0.0,
      "kept pairs have strictly positive margins by construction")
    // the audit's top source is the direct majority-gated BT fit's #1
    val maj = EvalScoring.qEvalMajorityVote(spark, sf)
      .where(col("maj_label") =!= "zz")
      .select(col("item_id").as("prompt_id"))
    val pairs = EvalScoring.qPreferencePairs(spark, sf).join(maj, "prompt_id")
    val src = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source")
    val duels = pairs
      .join(src.select(col("doc_id").as("chosen_id"),
        col("source").as("ws")), "chosen_id")
      .join(src.select(col("doc_id").as("rejected_id"),
        col("source").as("ls")), "rejected_id")
      .where(col("ws") =!= col("ls"))
      .select(col("ws").as("winner"), col("ls").as("loser"))
    val top = EvalScoring.bradleyTerryFit(duels)
      .where(col("rank") === 1).head()
    assert(row.getAs[String]("top_source") == top.getAs[String]("source"))
    assert(row.getAs[Double]("top_strength") == top.getAs[Double]("strength"))
  }
}
