package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Properties of the parameterized simhash banding dial that hold for
  * ANY band width — guarding the band-arithmetic refactor (the
  * default 7 × 16-bit configuration itself is hash-gated by the
  * dedup_simhash oracle, so this spec only checks the widths the gate
  * can't see). */
class DedupBandingSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog again and again today"
  private def docs = Seq(
    (1L, base),
    (2L, base),                                   // identical → hamming 0
    (3L, base + " with one trailing change"),     // near-dup
    (4L, "completely different text about spark catalyst optimizer internals and shuffles")
  ).toDF("doc_id", "text")

  test("identical documents are found at every band width") {
    // hamming(sig_a, sig_b) = 0 ⇒ every band matches under any
    // (bandHexLen, stride) — wider bands may lose near-dups but can
    // never lose exact signature matches
    for ((len, stride) <- Seq((4, 2), (6, 2), (8, 4), (16, 1))) {
      val pairs = Dedup.simhashPairs(docs, len, stride)
        .where(col("doc_a") === 1L && col("doc_b") === 2L)
        .collect()
      assert(pairs.length == 1, s"bandHexLen=$len stride=$stride")
      assert(pairs.head.getAs[Long]("hamming") == 0L)
    }
  }

  test("wider bands only shrink the verified pair set") {
    val narrow = Dedup.simhashPairs(docs, 4, 2)
      .select("doc_a", "doc_b").collect().toSet
    val wide = Dedup.simhashPairs(docs, 8, 4)
      .select("doc_a", "doc_b").collect().toSet
    assert(wide.subsetOf(narrow),
      "a pair surviving 32-bit bands must also collide on some 16-bit sub-band")
    spark.catalog.clearCache()
  }

  test("default band width adapts to corpus size at the documented crossover") {
    assert(Dedup.simhashBandHexLenFor(0L) == 4)
    assert(Dedup.simhashBandHexLenFor(100000L) == 4)   // at the bound: gate config
    assert(Dedup.simhashBandHexLenFor(100001L) == 6)   // above: 24-bit bands
    assert(Dedup.simhashBandHexLenFor(1000000L) == 6)
  }

  test("wide-gate pairs are a subset of default-gate pairs on the fixture") {
    // every 6-hex band start (1,3,…,11) is also a 4-hex band start, and
    // agreement on 6 chars implies agreement on its 4-char prefix — so
    // wide candidates ⊆ narrow candidates, and with the identical exact
    // hamming verify, wide PAIRS ⊆ narrow pairs. The wide gate must
    // never invent a pair the default config wouldn't emit.
    val narrow = Dedup.qDedupSimhash(spark, sf)
      .select("doc_a", "doc_b").collect().toSet
    val wide = Dedup.qDedupSimhashWide(spark, sf)
      .select("doc_a", "doc_b").collect().toSet
    assert(wide.subsetOf(narrow), s"wide-only pairs: ${(wide diff narrow).take(3)}")
    spark.catalog.clearCache()
  }

  test("materialized cluster table rebuilds when the corpus is rewritten in-session") {
    val col = org.apache.spark.sql.functions.col _
    val tmp = java.nio.file.Files.createTempDirectory("graft_corpus_fp").toFile
    val dir = tmp.getAbsolutePath
    val full = spark.read.parquet(s"$sf/documents.parquet")
    full.write.parquet(s"$dir/documents.parquet")
    val before = Dedup.clustersTableFor(spark, dir).count()
    assert(before > 0)
    // same dir, new corpus: keep only half the docs — a cached table
    // keyed on the dir alone would silently serve the old clusters
    val cutoff = full.agg(org.apache.spark.sql.functions
      .expr("percentile_approx(doc_id, 0.5)")).head.getLong(0)
    full.where(col("doc_id") < cutoff).write
      .mode("overwrite").parquet(s"$dir/documents.parquet")
    val rebuilt = Dedup.clustersTableFor(spark, dir)
    assert(rebuilt.agg(org.apache.spark.sql.functions.max(col("doc_id")))
      .head.getLong(0) < cutoff,
      "cluster table still holds docs that no longer exist in the corpus")
    // unchanged corpus → fingerprint match → NOT rebuilt: the backing
    // part files are byte-identical (a rebuild rewrites them under
    // fresh names)
    val name = Dedup.clustersTableName(dir)
    def partFiles = graft.sources.Readers.tableDataFiles(spark, name)
      .map(f => s"${f.getName}:${f.lastModified}").sorted
    val filesBefore = partFiles
    Dedup.clustersTableFor(spark, dir)
    assert(partFiles == filesBefore,
      "fingerprint-fresh table was rebuilt anyway")
    graft.sources.Readers.dropTableAndDir(spark, name)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
      f.delete()
    }
    rm(tmp)
  }

  test("deletion propagation removes exactly the seeds' clusters, tagged by reason") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = graft.operators.Dedup.qDeletePropagate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val reasons = out.toMap
    val seeds = spark.read.parquet(s"$sf/documents.parquet")
      .where(pmod(col("doc_id"), lit(100)) === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // every seed is deleted AS a seed; no doc appears twice
    assert(seeds.forall(s => reasons.get(s).contains("seed")))
    assert(out.length == reasons.size, "a doc was deleted twice")
    // every propagated deletion shares a cluster with some seed, and
    // every member of a seeded cluster is deleted — no survivors
    val clusters = graft.operators.Dedup.qDedupClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seededClusters = clusters.collect {
      case (d, c) if seeds(d) => c }.toSet
    reasons.foreach { case (d, why) =>
      if (why == "near_dup_of_seed")
        assert(seededClusters(clusters(d)), s"$d deleted without a seeded cluster")
    }
    clusters.foreach { case (d, c) =>
      if (seededClusters(c))
        assert(reasons.contains(d), s"cluster-mate $d of a seed survived")
    }
  }
}
