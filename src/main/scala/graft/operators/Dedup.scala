package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{SimHash, Text}

/** Deduplication operators over the `documents` table — the
  * training-data-pipeline side of the engine. Four families:
  * exact (hash groupBy), MinHash+LSH (banded candidate join + exact
  * verify), n-gram Jaccard (inverted shingle index), SimHash
  * (custom expression + banded hamming verify). Embedding-cosine
  * near-dup lives in Similarity.scala.
  *
  * Scale notes: nothing here is quadratic in the corpus. Candidate
  * generation always goes through an equi-join on a hash bucket
  * (band or shingle), i.e. a shuffle keyed on the bucket — the
  * standard way to dedup 100 TB. Only verified candidate *pairs*
  * (tiny) are ever joined back to full signatures.
  */
object Dedup {

  private val MinhashSeeds = 8  // 4 bands × 2 rows
  private val JaccardThreshold = 0.5
  private val NgramJaccardThreshold = 0.8
  // Of 64 bits. Over 3-gram shingles the planted near-dups sit at
  // hamming ≤ 7 and unrelated pairs at ≥ 16 — 12 splits them cleanly.
  // (Unigram-token simhash does NOT separate on this corpus: the
  // shared ~40-word vocab collapses token sets.)
  private val SimhashMaxHamming = 12

  /** Exact dedup: canonical row per distinct text, by content hash
    * (groupBy md5 — one shuffle on the hash, min doc_id wins). */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy("canonical_id")

  /** Document signatures: distinct 3-gram shingles + 8 minhashes +
    * 4 LSH bands. Shingles are exploded once and the 8 component
    * minima come out of a single codegen'd hash aggregate — much
    * faster than evaluating 8 interpreted higher-order `transform`
    * lambdas per document, and the same one-shuffle-on-doc_id cost
    * profile at any scale. collect_set in the same pass returns the
    * distinct-shingle set the verify join needs. */
  private def signatures(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(Text.shingles3(col("text"))).as("sh"))
    val minCols = (0 until MinhashSeeds).map(j =>
      min(md5(concat(lit(s"$j|"), col("sh")))).as(s"mh$j"))
    sh.groupBy("doc_id")
      .agg(collect_set(col("sh")).as("shingles"), minCols: _*)
      .withColumn("bands",
        array((0 until MinhashSeeds / 2).map(b =>
          Text.band(col(s"mh${2 * b}"), col(s"mh${2 * b + 1}"))): _*))
  }

  /** MinHash+LSH near-dup detection: shingle → minhash → band →
    * bucket self-join → exact-Jaccard verify. The band join is the
    * only shuffle over the corpus; the verify join touches only
    * candidate pairs. */
  def qDedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sigs = signatures(spark, dir).cache()
    val bands = sigs.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band_id", "bucket")))
    val cands = bands.as("a")
      .join(bands.as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sa = sigs.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val sb = sigs.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    cands.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))) /
        (size(col("sh_a")) + size(col("sh_b")) -
         size(array_intersect(col("sh_a"), col("sh_b")))))
      .where(col("jaccard") >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"), graft.functions.Text.roundPortable(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard near-dup via an inverted shingle index —
    * no LSH approximation: pairs sharing ≥1 shingle are scored
    * exactly. Heavier than LSH (every co-shingle pair is a row in
    * the join) but exact; the high threshold keeps output tiny. */
  def qDedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(Text.shingles3(col("text"))).as("sh"))
    val n = sh.groupBy("doc_id").agg(count(lit(1)).as("ns"))
    // Pair generation via per-shingle posting lists instead of a
    // self-join: one shuffle groups postings, pairs are exploded
    // in-place (sorted, so da < db), and partial aggregation folds
    // them before the pair shuffle. Same output as the equi-self-join
    // formulation the oracle uses, one heavy shuffle fewer.
    val pairs = sh.groupBy("sh")
      .agg(array_sort(collect_list(col("doc_id"))).as("docs"))
      .select(explode(expr(
        """flatten(transform(docs, (x, i) ->
           transform(slice(docs, i + 2, size(docs) - i - 1), y ->
             struct(x AS doc_a, y AS doc_b))))""")).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(n.select(col("doc_id").as("doc_a"), col("ns").as("na")), "doc_a")
      .join(n.select(col("doc_id").as("doc_b"), col("ns").as("nb")), "doc_b")
      .withColumn("jaccard", col("shared") / (col("na") + col("nb") - col("shared")))
      .where(col("jaccard") >= NgramJaccardThreshold)
      .select(col("doc_a"), col("doc_b"), col("shared"),
              graft.functions.Text.roundPortable(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash near-dup: 64-bit signature over the distinct 3-gram
    * shingles via the custom [[graft.functions.SimHash64]] expression
    * (one scalar pass per doc), banded by 4 hex chars for candidates,
    * verified by exact bit-level hamming distance. */
  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val sig = Tables.documents(spark, dir)
      .select(col("doc_id"),
        SimHash.simhash64(Text.shingles3(col("text"))).as("sh"))
      .cache()
    // Banding is the recall/cost dial (measured in SCALING.md):
    // 8 × 8-bit bands give 100% recall at hamming ≤ 7 but candidate
    // pairs grow quadratically with corpus size (256-value buckets);
    // 7 overlapping 16-bit bands (stride 2 hex chars) keep ~86-92%
    // recall with ~200× fewer candidates and scale linearly — the
    // default here. The exact-recall alternative for the same
    // threshold is dedup_ngram_jaccard.
    val bands = sig.select(col("doc_id"),
      posexplode(array((0 until 7).map(b =>
        substring(col("sh"), 1 + 2 * b, 4)): _*)).as(Seq("band_id", "bucket")))
    val cands = bands.as("a")
      .join(bands.as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cands
      .join(sig.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("hamming", expr(
        """aggregate(transform(sequence(1, 16), p ->
           bit_count((instr('0123456789abcdef', substr(sh_a, p, 1)) - 1) ^
                     (instr('0123456789abcdef', substr(sh_b, p, 1)) - 1))),
           0, (acc, x) -> acc + x)""").cast("long"))
      .where(col("hamming") <= SimhashMaxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** Connected-component dedup clusters over the LSH-verified pairs:
    * each document involved in any near-dup pair → the minimum doc_id
    * of its component (the canonical survivor). The pair graph is
    * tiny relative to the corpus (output of the verify step), so a
    * driver-side union-find over the collected edges is the right
    * tool — documented exception to the no-collect rule; the oracle
    * computes the same components with a recursive CTE. */
  def qDedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = qDedupMinhashLsh(spark, dir).select("doc_a", "doc_b")
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        // smaller id wins as the root → cluster_id = min of component
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    import spark.implicits._
    nodes.map(n => (n, find(n))).toSeq
      .toDF("doc_id", "cluster_id")
      .orderBy("doc_id")
  }
}
