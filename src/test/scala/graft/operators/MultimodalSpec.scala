package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal plumbing: binary schema, frame sampling, partition-
  * parallel decode through the pluggable (stubbed) decoder, resize,
  * feature aggregation.
  */
class MultimodalSpec extends SparkSpec {

  test("media relation: binary payload + typed metadata, kinds cycle") {
    val m = Multimodal.media(spark, sf)
    assert(m.schema("content").dataType.typeName == "binary")
    val kinds = m.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
    assert(m.filter(col("height") < 1 || col("height") > 16).count() == 0)
  }

  test("frame sampling keeps every stride-th chunk") {
    val sampled = Multimodal.sampleFrames(Multimodal.media(spark, sf), 2)
    val bad = sampled.filter(col("frame_idx") % 2 =!= 0).count()
    assert(bad == 0)
    // every sampled frame's bytes come from its chunk offset
    val r = sampled.filter(col("frame_idx") === 0)
      .select(octet_length(col("frame_bytes"))).collect()
    assert(r.forall(_.getInt(0) <= Multimodal.FrameBytes))
  }

  test("decode: one row per sampled frame, plane sized width*height") {
    val frames = Multimodal.decodeFrames(spark, sf, stride = 2)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(f => f.pixels.length == f.width * f.height))
    assert(rows.forall(f => f.pixels.forall(p => p >= 0f && p < 1f)))
    // deterministic fake: same call twice -> identical planes
    val again = Multimodal.decodeFrames(spark, sf, stride = 2).collect()
    assert(rows.map(_.pixels.toSeq).toSet == again.map(_.pixels.toSeq).toSet)
  }

  test("resize average-pools to the target shape") {
    val frames = Multimodal.decodeFrames(spark, sf, stride = 4)
    val small = Multimodal.resize(frames, 4, 4).collect()
    assert(small.forall(f => f.width == 4 && f.height == 4 &&
      f.pixels.length == 16))
  }

  test("features: per-media aggregation, no pixel planes on the driver") {
    val feats = Multimodal.features(
      Multimodal.decodeFrames(spark, sf, stride = 2))
    val rows = feats.collect()
    assert(rows.length ==
      Multimodal.media(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Int]("n_frames") >= 1)
      val mean = r.getAs[Double]("mean")
      assert(mean >= 0 && mean < 1)
      assert(r.getAs[Double]("std") >= 0)
    }
  }

  test("descriptors: fixed-dim, deterministic, zero-padded") {
    val d1 = Multimodal.descriptors(spark, sf)
      .orderBy("media_id").collect()
    assert(d1.nonEmpty)
    d1.foreach { r =>
      val v = r.getSeq[Float](r.fieldIndex("descriptor"))
      assert(v.length == Multimodal.DescriptorDim)
      assert(v.forall(x => x >= 0 && x < 1))
    }
    val d2 = Multimodal.descriptors(spark, sf)
      .orderBy("media_id").collect()
    assert(d1.sameElements(d2)) // stub decode + agg fully deterministic
  }

  test("media near-dup: self-consistent cosine pairing over descriptors") {
    // every media is a perfect near-dup of itself: pair each media
    // with itself shifted by an id offset via a doubled corpus check —
    // here simply assert the pair op's contract on the real corpus
    val pairs = Multimodal.mediaNearDup(spark, sf, minCos = 0.999).collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("cos") >= 0.999)
    }
    // descriptors are near-uniform means (~0.37 each) so most vectors
    // point the same way: the op must find plenty of near-dups here
    assert(pairs.length > 0)
  }
}
