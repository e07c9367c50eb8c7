package graft

import org.apache.spark.sql.functions._
import graft.functions.{MinHashes, MultisetOverlap, Text}
import graft.operators.EvalScoring

/** Round-14 optimization kernels: the custom expressions that
  * replaced interpreted plans must be BIT-IDENTICAL to the builtin
  * compositions they displaced (which stay in-tree as the
  * cross-check twins).
  */
class R14KernelsSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(14)
  private val vocab = Vector("the", "a", "of", "to", "and", "x", "y",
    "zz", "", " spaced ", "Ünïcode", "emoji🙂", "tab\ttok")

  private def randomTokens(n: Int): Seq[String] =
    Seq.fill(n)(vocab(rng.nextInt(vocab.size)))

  test("MultisetOverlap expression == HOF fold on arbitrary arrays") {
    val cases = (1 to 200).map { _ =>
      (randomTokens(rng.nextInt(30)), randomTokens(rng.nextInt(30)))
    } ++ Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq("a", "a", "a"), Seq("a", "a")),
      (Seq("a", "b", "a"), Seq("a", "a", "b", "b")),
      (Seq(""), Seq("", "")))
    val df = cases.toDF("p", "r")
      .withColumn("fast", MultisetOverlap.multisetOverlap($"p", $"r"))
      .withColumn("slow", EvalScoring.multisetOverlapViaHof($"p", $"r"))
    val bad = df.where($"fast" =!= $"slow").count()
    assert(bad == 0, "expression diverged from the HOF fold")
  }

  test("MultisetOverlap == exact min-count reference") {
    def ref(p: Seq[String], r: Seq[String]): Int = {
      val cp = p.groupBy(identity).view.mapValues(_.size)
      val cr = r.groupBy(identity).view.mapValues(_.size)
      cp.keySet.intersect(cr.keySet.toSet)
        .toSeq.map(t => math.min(cp(t), cr(t))).sum
    }
    val cases = (1 to 100).map { _ =>
      (randomTokens(rng.nextInt(25)), randomTokens(rng.nextInt(25)))
    }
    val got = cases.toDF("p", "r")
      .select(MultisetOverlap.multisetOverlap($"p", $"r"))
      .as[Int].collect().toSeq
    assert(got == cases.map { case (p, r) => ref(p, r) })
  }

  test("MinHash8 == the builtin min(md5('j|'+sh)) composition") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", Text.shingles3($"text").as("shingles"))
      .where(size($"shingles") > 0)
    val viaExpr = docs
      .select($"doc_id", MinHashes.minhash8($"shingles").as("mh"))
    val viaBuiltin = docs.select($"doc_id" +:
      (0 until MinHashes.Seeds).map(j =>
        Text.minhash($"shingles", j).as(s"m$j")): _*)
    val joined = viaExpr.join(viaBuiltin, "doc_id")
    val bad = (0 until MinHashes.Seeds).map(j =>
      joined.where(element_at($"mh", j + 1) =!= col(s"m$j")).count()).sum
    assert(joined.count() > 0)
    assert(bad == 0, "MinHash8 diverged from the builtin composition")
  }

  test("signaturesOf drops shingle-less docs and keeps the band layout") {
    val docs = Seq(
      (1L, "one two three four"),   // has shingles
      (2L, "too short"),            // < 3 tokens -> dropped
      (3L, "")).toDF("doc_id", "text")
    val sigs = graft.operators.Dedup.signaturesOf(docs)
    assert(sigs.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    val row = sigs.head
    assert(row.getSeq[String](row.fieldIndex("bands")).size == 4)
  }
}
