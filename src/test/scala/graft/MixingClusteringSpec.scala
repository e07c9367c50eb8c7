package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Mixing, TextAnalysis}

/** Properties of the round-7 mixing / clustering / repetition
  * operators that the hash oracle can't express: Lloyd iterations
  * must not worsen the objective, temperature mixing must actually
  * flatten the stratum distribution, and the repetition signals must
  * equal hand-computed values on crafted documents. */
class MixingClusteringSpec extends SparkSpec {

  test("kmeans partitions the corpus; more Lloyd iterations never worsen WCSS") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    def wcss(iters: Int): (Long, Double) = {
      val out = Clustering.kmeans(emb, 8, iters).collect()
      assert(out.map(_.getLong(0)).distinct.length == n,
        "every vector appears exactly once")
      assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 8))
      assert(out.forall(_.getDouble(2) >= 0.0))
      (out.length.toLong, out.map(_.getDouble(2)).sum)
    }
    val (n0, w0) = wcss(0)
    val (n2, w2) = wcss(2)
    assert(n0 == n && n2 == n)
    // Lloyd monotonicity (centroid 4dp-rounding can only wiggle the
    // objective at the last decimal, far below the init→2-iter drop)
    assert(w2 <= w0, s"2-iteration WCSS $w2 should not exceed init WCSS $w0")
  }

  test("joined-assignment kmeans is bit-identical to the literal shape") {
    val emb = Tables.embeddings(spark, sf)
    val lit = Clustering.kmeans(emb, 8, 2).collect().map(_.toSeq).toSeq
    val joined = Clustering.kmeansJoined(emb, 8, 2).collect().map(_.toSeq).toSeq
    assert(lit == joined)
  }

  test("kmeans is deterministic across runs") {
    val a = Clustering.kmeans(Tables.embeddings(spark, sf), 8, 2)
      .collect().map(_.toSeq).toSeq
    val b = Clustering.kmeans(Tables.embeddings(spark, sf), 8, 2)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("temperature mix hits the target size and flattens the lang distribution") {
    val docs = Tables.documents(spark, sf)
    val raw = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mixed = Mixing.qTemperatureMix(spark, sf).collect()
    assert(mixed.length == 200, s"largest-remainder quotas must total 200, got ${mixed.length}")
    val mixCnt = mixed.groupBy(_.getString(0)).map { case (l, rs) => l -> rs.length }
    // α = 0.5 upweights rare strata: every below-average lang must get
    // MORE than its proportional share, the top lang less
    val total = raw.values.sum.toDouble
    val propOf = (l: String) => 200.0 * raw(l) / total
    val maxLang = raw.maxBy(_._2)._1
    assert(mixCnt(maxLang) < propOf(maxLang),
      s"dominant $maxLang: mixed ${mixCnt(maxLang)} vs proportional ${propOf(maxLang)}")
    raw.filter(_._2.toDouble < total / raw.size).keys.foreach { l =>
      assert(mixCnt(l) > propOf(l),
        s"rare $l: mixed ${mixCnt(l)} vs proportional ${propOf(l)}")
    }
    // selection never exceeds availability
    mixCnt.foreach { case (l, c) => assert(c <= raw(l)) }
  }

  test("token-budget mix fills every source quota maximally and never overspends") {
    val out = Mixing.qTokenBudgetMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val perSource = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val totalSel = perSource.values.sum
    assert(totalSel <= 20000L, s"budget overspent: $totalSel")
    // greedy maximality: re-derive each source's md5 order and check
    // the first UNSELECTED doc would overflow the spent+its-size sum
    // against what the quota must at least be (the selected total)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        operators.TextAnalysis.bpeTokenCount(col("text")).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val selected = out.map(t => (t._1, t._2)).toSet
    docs.groupBy(_._2).foreach { case (src, rows) =>
      val inOrder = rows.sortBy(r => (md5hex(r._1.toString), r._1))
      var cum = 0L
      var stopped = false
      inOrder.foreach { case (id, _, n) =>
        if (!stopped && selected((src, id))) cum += n
        else if (!stopped) {
          // first unselected doc: selection must be a PREFIX (nothing
          // after it is selected) — the greedy fill property
          stopped = true
          assert(cum == perSource.getOrElse(src, 0L),
            s"$src: selection is not the md5-order prefix")
        } else assert(!selected((src, id)),
          s"$src: doc $id selected after the prefix ended")
      }
    }
  }

  test("epoch mix: per-doc copies follow the exact integer threshold rule, epochs are dense") {
    val out = Mixing.qMixEpochs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // epochs per (source, doc) are exactly 1..copies — no gaps, no dups
    val byDoc = out.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sorted).toMap
    byDoc.foreach { case ((src, id), epochs) =>
      assert(epochs.toList == (1L to epochs.length).toList,
        s"$src/$id epochs ${epochs.toList} are not dense from 1")
    }
    // re-derive the whole allocation locally: √(char mass) weights,
    // largest-remainder doc quotas, base = quota/n epochs for all,
    // +1 for docs whose 24-bit md5 hash clears h·n < (quota mod n)·2^24
    val docs = Tables.documents(spark, sf).select("source", "doc_id", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySrc = docs.groupBy(_._1)
    val w = bySrc.view.mapValues(rows =>
      math.floor(math.sqrt(rows.map(_._3).sum.toDouble) * 1e6 + 0.5).toLong).toMap
    val wSum = w.values.sum
    val ideal = w.view.mapValues(wi => 600.0 * wi / wSum).toMap
    val base = ideal.view.mapValues(i => math.floor(i).toLong).toMap
    val leftover = 600L - base.values.sum
    val extraRank = ideal.toSeq
      .sortBy { case (s, i) => (-(i - math.floor(i)), s) }.map(_._1).zipWithIndex.toMap
    val quota = base.map { case (s, b) =>
      s -> (b + (if (extraRank(s) < leftover) 1L else 0L)) }
    def h24(id: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(3)
        .map("%02x".format(_)).mkString, 16)
    docs.foreach { case (src, id, _) =>
      val n = bySrc(src).length.toLong
      val expect = quota(src) / n +
        (if (h24(id) * n < (quota(src) % n) * 16777216L) 1L else 0L)
      val got = byDoc.get((src, id)).map(_.length.toLong).getOrElse(0L)
      assert(got == expect, s"$src/$id: got $got epochs, expected $expect")
    }
    // the fixture must exercise the fractional-epoch branch: some doc
    // repeated (≥2 epochs) AND unevenly within its source
    assert(out.exists(_._3 >= 2L), "no doc was upsampled to a 2nd epoch")
    assert(byDoc.values.map(_.length).toSet.size > 1,
      "all docs got identical copy counts — threshold branch untested")
  }

  test("domain reweight: hand-computed DoReMi quotas on 2 and 3 domains, clip included") {
    import spark.implicits._
    // A learns (excess 0.5 -> e^1 scaled 2718282); B already beats the
    // reference (excess floors at 0 -> 1000000). Ideals are the exact
    // integer ratio B·(9·wi·k + S)/(10·S·k): 707.95.. / 292.05.. ->
    // largest remainder gives A the leftover seat
    val two = Mixing.domainReweightWith(
      Seq(("A", 2.0, 1.5), ("B", 1.0, 2.0))
        .toDF("source", "proxy_loss", "ref_loss"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(4), r.getLong(5))).toMap
    assert(two("A") == (0.707953, 708L) && two("B") == (0.292047, 292L))
    // C's raw excess 4.0 CLIPS to 1.0 (e^2); quotas: 254/114/632
    val three = Mixing.domainReweightWith(
      Seq(("A", 2.0, 1.5), ("B", 1.0, 2.0), ("C", 5.0, 1.0))
        .toDF("source", "proxy_loss", "ref_loss"))
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(three == Map("A" -> 254L, "B" -> 114L, "C" -> 632L))
  }

  test("domain reweight: quotas conserve the budget, zero-excess domains keep the uniform floor") {
    val rows = Mixing.qDomainReweight(spark, sf).collect()
    val k = rows.length
    assert(rows.map(_.getLong(5)).sum == 1000L, "quotas must sum to the budget")
    // ε-uniform mixing: every domain's weight ≥ ε/k = 1/(10k), so no
    // domain is starved no matter how bad its excess loss
    val floor = 1.0 / (10.0 * k)
    rows.foreach { r =>
      assert(r.getDouble(4) >= floor - 1e-6,
        s"${r.getString(0)} starved below the uniform floor")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, "excess out of clip range")
    }
    // and the weights themselves sum to 1 (up to the 6dp rounding)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-4)
  }

  test("domain reweight quotas feed the epoch resampler: per-source epochs track the quota") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("source", "doc_id", "n_chars")
    val quotas = Mixing.qDomainReweight(spark, sf).select("source", "quota")
    val out = Mixing.resampleByQuotas(docs, quotas).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val got = out.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val q = quotas.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nBySrc = docs.collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    // base epochs are exact (quota DIV n per doc); the fractional
    // remainder is hash-proportional IN EXPECTATION — bound the
    // realized count to base ≤ got ≤ base + n (the remainder adds at
    // most one epoch per doc)
    q.foreach { case (s, quota) =>
      val n = nBySrc(s)
      val baseTotal = (quota / n) * n
      val gotS = got.getOrElse(s, 0L)
      assert(gotS >= baseTotal && gotS <= baseTotal + n,
        s"$s: $gotS epochs outside [$baseTotal, ${baseTotal + n}] for quota $quota")
    }
  }

  test("semantic dedup: output partitions the corpus and every cluster keeps its farthest member") {
    val n = Tables.embeddings(spark, sf).count()
    for (out <- Seq(Clustering.qSemanticDedup(spark, sf).collect(),
                    Clustering.qSemanticDedupScaled(spark, sf).collect())) {
      assert(out.map(_.getLong(0)).distinct.length == n,
        "every vector verdict appears exactly once")
      out.groupBy(_.getLong(1)).values.foreach { rows =>
        // the keep-rule winner — max (dist, -vec_id) — can't be outranked
        val top = rows.maxBy(r => (r.getDouble(2), -r.getLong(0)))
        assert(top.getBoolean(3),
          s"farthest member ${top.getLong(0)} of cluster ${top.getLong(1)} must be kept")
      }
    }
  }

  test("semantic dedup: every pruned vector has an outranking similar clustermate") {
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val out = Clustering.qSemanticDedup(spark, sf).collect()
    val byCluster = out.groupBy(_.getLong(1))
    val prunedRows = out.filter(!_.getBoolean(3))
    assert(prunedRows.nonEmpty, "fixture must exercise the prune branch")
    prunedRows.foreach { p =>
      val mates = byCluster(p.getLong(1)).filter(_.getLong(0) != p.getLong(0))
      assert(mates.exists { m =>
        val outranks = m.getDouble(2) > p.getDouble(2) ||
          (m.getDouble(2) == p.getDouble(2) && m.getLong(0) < p.getLong(0))
        outranks && cos(vecs(m.getLong(0)), vecs(p.getLong(0))) >= 0.45
      }, s"vec ${p.getLong(0)} pruned without an outranking similar clustermate")
    }
    // and kept vectors have NO outranking similar clustermate
    out.filter(_.getBoolean(3)).foreach { k =>
      val mates = byCluster(k.getLong(1)).filter(_.getLong(0) != k.getLong(0))
      assert(!mates.exists { m =>
        val outranks = m.getDouble(2) > k.getDouble(2) ||
          (m.getDouble(2) == k.getDouble(2) && m.getLong(0) < k.getLong(0))
        outranks && cos(vecs(m.getLong(0)), vecs(k.getLong(0))) >= 0.45
      }, s"vec ${k.getLong(0)} kept despite an outranking similar clustermate")
    }
  }

  test("repetition signals match hand-computed values on crafted docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"),        // g2 = [a a, a a, a b]; runs: aaa, b
      (2L, "x y x y"),        // g2 = [x y, y x, x y]; all runs 1
      (3L, "solo"),           // 1 token: no 2-grams, run 1
      (4L, "c c c c"))        // g2 = [c c, c c, c c]; run 4
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out(1L) == ((0.3333, 0.6667, 3L)))
    assert(out(2L) == ((0.3333, 0.6667, 1L)))
    assert(out(3L) == ((0.0, 0.0, 1L)))
    assert(out(4L) == ((0.6667, 1.0, 4L)))
  }

  test("repetition fractions stay in [0,1] and max_run ≥ 1 on the fixture") {
    val out = TextAnalysis.qTextRepetition(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val d = r.getDouble(1); val t = r.getDouble(2)
      d >= 0.0 && d <= 1.0 && t >= 0.0 && t <= 1.0 && r.getLong(3) >= 1
    })
    // the synthetic corpus visibly repeats tokens; at least one doc
    // must show a run longer than 1
    assert(out.exists(_.getLong(3) > 1))
  }
}
