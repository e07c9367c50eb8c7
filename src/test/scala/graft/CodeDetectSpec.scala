package graft

import graft.operators.TextAnalysis

/** Code-vs-prose routing (text_code_detect): the oracle gate pins the
  * rows; this spec pins the routing outcomes — exactly the injected
  * residue class flags as code, nothing else, and un-injected fixture
  * prose sits well under the threshold.
  */
class CodeDetectSpec extends SparkSpec {

  test("exactly the injected residue class routes to code") {
    val out = TextAnalysis.qTextCodeDetect(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(out.nonEmpty)
    out.foreach { case (id, ratio, isCode) =>
      assert(isCode == (id % 6 == 0), s"doc $id at ratio $ratio")
    }
    // the margin is real on both sides, not a knife-edge
    val codeMin = out.filter(_._3).map(_._2).min
    val proseMax = out.filterNot(_._3).map(_._2).max
    assert(codeMin >= 0.03 && proseMax < 0.02,
      s"margins: code min $codeMin, prose max $proseMax")
  }
}
