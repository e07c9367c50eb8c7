package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(id: Long, s: String) =
    MediaRow(id, "image/stub", s.getBytes("UTF-8"))

  test("decode stub derives dims and mean from bytes; batching preserves rows") {
    val ds = Seq(media(1, "abcd"), media(2, "A" * 200)).toDS()
    val got = Multimodal.decode(ds, batchSize = 1).collect().sortBy(_.doc_id)
    assert(got(0).n_bytes == 4)
    assert(got(0).width == 1 + 'a' % 64 && got(0).height == 1 + 'b' % 64)
    assert(got(0).mean_byte == ('a' + 'b' + 'c' + 'd') / 4.0)
    assert(got(1).n_bytes == 200 && got(1).mean_byte == 65.0)
  }

  test("frame sampling keeps every k-th frame with exact tail length") {
    // 300 bytes, 64-byte frames → frames 0..4 (tail = 44), every 4th → 0 and 4
    val ds = Seq(media(9, "x" * 300)).toDS()
    val frames = Multimodal.sampleFrames(ds, frameSize = 64, every = 4)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0L, 4L))
    assert(frames(0).frame_len == 64 && frames(1).frame_len == 44)
    assert(frames(0).checksum == (120L * 64) % 256)
    assert(frames(1).checksum == (120L * 44) % 256)
  }

  test("empty payload yields zero-dim decode and no frames") {
    val ds = Seq(media(5, "")).toDS()
    val d = Multimodal.decode(ds).collect().head
    assert(d.n_bytes == 0 && d.width == 1 && d.height == 1 && d.mean_byte == 0.0)
    assert(Multimodal.sampleFrames(ds).collect().isEmpty)
  }

  test("stub embedding is the byte-mod-16 histogram: integer counts, bins sum to payload length") {
    val ds = Seq(media(3, "abca")).toDS() // a=97(%16=1), b=98(2), c=99(3)
    val e = Multimodal.embed(ds, batchSize = 2).collect().head
    assert(e.vec_id == 3L)
    assert(e.embedding.length == 16)
    assert(e.embedding.sum == 4f)
    assert(e.embedding(1) == 2f && e.embedding(2) == 1f && e.embedding(3) == 1f)
  }

  test("multi-byte probe rides the media table: residue rows provably carry non-ASCII bytes") {
    val rows = Multimodal.mediaTable(spark, sf).collect()
    val probed = rows.filter(_.doc_id % Multimodal.MbResidue == 0)
    assert(probed.nonEmpty, "no residue-class rows in the fixture")
    val suffix = Multimodal.MbProbe.getBytes("UTF-8")
    // the probe includes 2-, 3-, and 4-byte UTF-8 sequences: more
    // bytes than codepoints, and high-bit bytes present
    assert(suffix.length >
      Multimodal.MbProbe.codePointCount(0, Multimodal.MbProbe.length))
    assert(suffix.exists(b => (b & 0x80) != 0))
    // every residue row ends with exactly the probe bytes; every
    // other row stays pure ASCII (the fixture text)
    assert(probed.forall(r =>
      r.content.length >= suffix.length &&
      r.content.takeRight(suffix.length).sameElements(suffix)))
    assert(rows.filter(_.doc_id % Multimodal.MbResidue != 0)
      .forall(r => r.content.forall(b => (b & 0x80) == 0)))
  }

  test("embed-and-search returns full top-5 rows for every query against its probed cells") {
    val out = Multimodal.qMultimodalEmbedAnn(spark, sf).collect()
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.keySet.subsetOf((0L until 10L).toSet))
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }
}
