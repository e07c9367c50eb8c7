package graft

import org.apache.spark.sql.functions._
import graft.operators.{Packing, TextAnalysis}

/** Whole-document FFD packing (pack_whole_doc): the oracle gate pins
  * the exact placement; this spec pins the CONTRACTS the recipe is
  * for — no short doc ever splits, no sequence overflows or overlaps,
  * tokens conserve through the pre-chunking, and (on a single bucket,
  * the prefixLen=0 dial) the greedy scan IS textbook first-fit
  * decreasing, including its ≤-one-half-empty-bin guarantee.
  */
class WholeDocPackSpec extends SparkSpec {

  import spark.implicits._

  private val C = 256L

  private def ffd(items: Seq[(Long, Long)], prefixLen: Int = 0) =
    Packing.packWholeDocs(items.toDF("doc_id", "n_tok"), prefixLen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(x => (x._1, x._2)) // (doc_id, piece, tok, seq, off)

  test("fixture: no doc within budget is split, and every piece fits its sequence") {
    val rows = Packing.qPackWholeDoc(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val byDoc = rows.groupBy(_._1)
    val docTok = Tables.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.bpeTokenCount(col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (d, pieces) =>
      if (docTok(d) <= C)
        assert(pieces.length == 1, s"doc $d (${docTok(d)} tok) was split")
      assert(pieces.map(_._3).sum == docTok(d), s"doc $d tokens not conserved")
    }
    rows.foreach { case (d, p, t, _, off) =>
      assert(off + t <= C, s"doc $d piece $p overflows its sequence")
    }
  }

  test("fixture: sequences never overflow and member pieces never overlap") {
    val rows = Packing.qPackWholeDoc(spark, sf).collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getLong(2))) // (seq, off, tok)
    rows.groupBy(_._1).foreach { case (s, members) =>
      assert(members.map(_._3).sum <= C, s"seq $s over budget")
      val sorted = members.sortBy(_._2)
      sorted.zip(sorted.tail).foreach { case ((_, o1, t1), (_, o2, _)) =>
        assert(o2 >= o1 + t1, s"seq $s pieces overlap at offset $o2")
      }
    }
    // seq ids are contiguous from 0 (the audit's n_seqs = max+1 contract)
    val ids = rows.map(_._1).distinct.sorted
    assert(ids.head == 0L && ids.last == ids.length - 1L)
  }

  test("single bucket: hand-checked textbook FFD placement") {
    // sizes desc: 200, 150, 100, 56, 50. FFD: 200→bin0; 150→bin1;
    // 100→bin1 (rem 106); 56→bin0 (rem 56→0); 50→bin1 (rem 6→... no:
    // bin0 rem 0 < 50, bin1 rem 6 < 50 → bin2)
    val out = ffd(Seq((1L, 200L), (2L, 150L), (3L, 100L), (4L, 56L), (5L, 50L)))
    val place = out.map(x => x._1 -> (x._4, x._5)).toMap
    assert(place(1L) == (0L, 0L))
    assert(place(2L) == (1L, 0L))
    assert(place(3L) == (1L, 150L))
    assert(place(4L) == (0L, 200L))
    assert(place(5L) == (2L, 0L))
  }

  test("single bucket: at most one bin ends less than half full (first-fit invariant)") {
    // pseudo-random but fixed sizes, all nonzero and within budget
    val sizes = Seq.tabulate(60)(i => 1L + (i * 97 + 13) % 255)
    val out = ffd(sizes.zipWithIndex.map { case (s, i) => (i.toLong, s) })
    val fills = out.groupBy(_._4).view.mapValues(_.map(_._3).sum).values.toSeq
    assert(fills.count(_ < C / 2) <= 1,
      s"first-fit guarantee violated: fills=${fills.sorted.mkString(",")}")
    // and greedy is within the FFD bound of optimal: ≤ 11/9·⌈total/C⌉ + 1
    val lower = (sizes.sum + C - 1) / C
    assert(fills.size <= (11 * lower) / 9 + 1)
  }

  test("overlong docs pre-chunk into full pieces plus a remainder, whole docs don't") {
    val out = ffd(Seq((1L, 600L), (2L, 512L), (3L, 40L)))
    val p1 = out.filter(_._1 == 1L).map(x => (x._2, x._3))
    assert(p1.toSeq == Seq((0L, 256L), (1L, 256L), (2L, 88L)))
    val p2 = out.filter(_._1 == 2L).map(x => (x._2, x._3))
    assert(p2.toSeq == Seq((0L, 256L), (1L, 256L)))
    assert(out.filter(_._1 == 3L).map(x => (x._2, x._3)).toSeq == Seq((0L, 40L)))
    // full-size pieces fill their bins exactly: their sequences carry
    // nothing else
    val bySeq = out.groupBy(_._4)
    out.filter(_._3 == C).foreach { case (_, _, _, s, off) =>
      assert(off == 0L && bySeq(s).length == 1)
    }
  }

  test("audit row reconciles with the placement and prices the padding trade") {
    val audit = Packing.qPackWholeDocAudit(spark, sf).head()
    val rows = Packing.qPackWholeDoc(spark, sf).collect()
    val nSeqs = rows.map(_.getLong(3)).max + 1
    val total = rows.map(_.getLong(2)).sum
    assert(audit.getAs[Long]("n_items") == rows.length.toLong)
    assert(audit.getAs[Long]("n_seqs") == nSeqs)
    assert(audit.getAs[Long]("total_tokens") == total)
    assert(audit.getAs[Long]("padding_tokens") == nSeqs * C - total)
    assert(audit.getAs[Long]("n_split_docs") ==
      rows.count(_.getLong(1) == 1L).toLong)
    // whole-doc packing trades padding for zero mid-doc splits; the
    // fill rate must still clear the sparse-bucket floor
    val fill = audit.getAs[Double]("fill_rate")
    assert(fill > 0.0 && fill <= 1.0)
  }
}
