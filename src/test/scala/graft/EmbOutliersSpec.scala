package graft

import org.apache.spark.sql.functions._
import graft.operators.Clustering

/** Embedding outlier pruning (emb_outliers): the oracle gate pins the
  * rows; this spec pins the flag's semantics — the outlier set is
  * exactly the per-cluster top ⌈10 %⌉ by distance, every outlier is
  * at least as far from its centroid as every inlier of the same
  * cluster, and the flag rides on the SAME assignment the emb_kmeans
  * gate produces (one model, two views).
  */
class EmbOutliersSpec extends SparkSpec {

  private lazy val rows = Clustering.qEmbOutliers(spark, sf)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))

  test("per-cluster outlier count is exactly ceil(10%)") {
    rows.groupBy(_._2).foreach { case (c, members) =>
      val expected = (members.length + 9) / 10
      assert(members.count(_._4) == expected, s"cluster $c")
    }
  }

  test("every outlier is at least as far as every inlier in its cluster") {
    rows.groupBy(_._2).foreach { case (c, members) =>
      val outs = members.filter(_._4).map(_._3)
      val ins = members.filterNot(_._4).map(_._3)
      if (outs.nonEmpty && ins.nonEmpty)
        assert(outs.min >= ins.max - 1e-12, s"cluster $c")
    }
  }

  test("assignment columns agree with the emb_kmeans gate") {
    val asg = Clustering.qEmbKmeans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows.map(t => (t._1, t._2, t._3)).toSet == asg)
  }
}
