package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns plus a typed metadata struct —
  * the lakehouse pattern for non-tabular content (the reference stores
  * such bytes in IPFS untyped; SURVEY.md §1.1). Decode/feature-extract/
  * resize/frame-sample run as partition-parallel transforms over those
  * bytes via `mapPartitions` on a typed `Dataset` (the JVM analog of
  * arrow-batched Python UDFs: one decoder instantiation per partition,
  * streaming through rows, never materializing a partition in memory).
  *
  * ── DECODE BOUNDARY ────────────────────────────────────────────────
  * `Decoder` is pluggable. PNG and WAV decode for REAL through the
  * JDK's own codecs (`javax.imageio`, `javax.sound.sampled` — no
  * external library needed): see [[JdkDecoder]], exercised end-to-end
  * by the oracled `media_decode` query over [[mediaEncoded]], whose
  * image rows carry actual grayscale PNG containers and audio rows
  * actual 16-bit PCM WAV containers. Only VIDEO remains stubbed
  * (`FakeDecoder` — the JDK ships no video codec and this container
  * has no ffmpeg); a real frame decoder swaps in at the same trait
  * without touching schema, partitioning, or any downstream op.
  * ───────────────────────────────────────────────────────────────────
  *
  * The synthetic `media` table is derived deterministically from
  * `documents` (text bytes as payload) so the plumbing runs against
  * driver-provided data at any scale factor.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, content: Array[Byte],
      mime: String, width: Int, height: Int, duration_ms: Long)

  /** Decode input shape (public: encoder codegen needs access). */
  case class FrameIn(media_id: Long, kind: String, frame_idx: Int,
      width: Int, height: Int, frame_bytes: Array[Byte])

  case class DecodedFrame(media_id: Long, kind: String, frame_idx: Int,
      width: Int, height: Int, pixels: Array[Float])

  case class MediaFeatures(media_id: Long, kind: String, n_frames: Int,
      mean: Float, std: Float)

  /** Frame granularity for the fake video container: one "frame" per
    * 256-byte chunk.
    */
  val FrameBytes = 256

  /** Pluggable decode boundary. Implementations must be serializable
    * (shipped to executors) and cheap to instantiate per partition.
    */
  trait Decoder extends Serializable {
    /** bytes of one frame → row-major pixel/sample plane. */
    def decode(bytes: Array[Byte], width: Int, height: Int): Array[Float]
  }

  /** STUB (video only): deterministic fake — byte k of the payload
    * becomes pixel k (normalized to [0,1), plane padded/truncated to
    * width×height). NOT a real codec; see the decode-boundary note.
    */
  object FakeDecoder extends Decoder {
    def decode(bytes: Array[Byte], width: Int, height: Int): Array[Float] = {
      val n = width * height
      Array.tabulate(n)(i =>
        if (i < bytes.length) (bytes(i) & 0xFF) / 256.0f else 0.0f)
    }
  }

  /** REAL decode through the JDK's built-in codecs, dispatched on the
    * container's magic bytes (self-describing formats need no mime at
    * this boundary): PNG via `javax.imageio`, WAV via
    * `javax.sound.sampled`; anything else (the fake video payloads)
    * falls through to [[FakeDecoder]].
    *
    * Plane contract (shared with FakeDecoder so every downstream op is
    * decoder-agnostic): row-major `Array[Float]` of exactly
    * width×height normalized levels in [0,1), quantization step 1/256
    * for 8-bit sources — gray level g → g/256, 16-bit PCM sample v →
    * v/65536 + 1/2. Both maps are power-of-two exact in Float, so
    * re-quantizing `round(p*256)` recovers source levels bit-exactly —
    * that is what lets the `media_decode` query be hash-verified
    * against a SQL oracle even though the oracle cannot run a codec.
    */
  object JdkDecoder extends Decoder {
    private def isPng(b: Array[Byte]): Boolean =
      b.length > 8 && b(0) == 0x89.toByte && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G'
    private def isWav(b: Array[Byte]): Boolean =
      b.length > 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
        b(11) == 'E'
    private def isJpeg(b: Array[Byte]): Boolean =
      b.length > 3 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte &&
        b(2) == 0xFF.toByte

    def decode(bytes: Array[Byte], width: Int, height: Int): Array[Float] =
      if (isJpeg(bytes)) {
        // MJPEG video frames ARE baseline JPEGs — the same ImageIO
        // read as PNG, same plane contract; only LOSSY (DCT), so the
        // graded video query pins a tolerance instead of bit-equality
        javax.imageio.ImageIO.setUseCache(false)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        val raster = img.getRaster
        val (w, h) = (img.getWidth, img.getHeight)
        val n = width * height
        val plane = new Array[Float](n)
        var i = 0
        while (i < n && i < w * h) {
          plane(i) = raster.getSample(i % w, i / w, 0) / 256.0f
          i += 1
        }
        plane
      } else if (isPng(bytes)) {
        javax.imageio.ImageIO.setUseCache(false) // no temp-file churn
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        val raster = img.getRaster
        val (w, h) = (img.getWidth, img.getHeight)
        val n = width * height
        val plane = new Array[Float](n)
        var i = 0
        while (i < n && i < w * h) {
          plane(i) = raster.getSample(i % w, i / w, 0) / 256.0f
          i += 1
        }
        plane
      } else if (isWav(bytes)) {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val data =
          try ais.readAllBytes()
          finally ais.close()
        val n = width * height
        val plane = new Array[Float](n)
        val samples = data.length / 2
        var i = 0
        while (i < n && i < samples) {
          // 16-bit signed little-endian PCM
          val v = (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xFF)
          plane(i) = v / 65536.0f + 0.5f
          i += 1
        }
        plane
      } else FakeDecoder.decode(bytes, width, height)
  }

  /** Deterministic container ENCODERS (JDK codecs again) used to give
    * the synthetic media relation real decodable payloads. Executors
    * call these inside `mapPartitions` — cheap, allocation-only, no
    * native state.
    */
  object MediaCodec {
    /** payload bytes → grayscale PNG of the w×h plane (byte k = gray
      * level of pixel k; truncated at w·h, zero-padded past the end).
      */
    def encodePng(bytes: Array[Byte], width: Int, height: Int): Array[Byte] = {
      if (width <= 0 || height <= 0) return bytes // BufferedImage rejects 0-dim
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var i = 0
      val n = width * height
      while (i < n) {
        raster.setSample(i % width, i / width, 0,
          if (i < bytes.length) bytes(i) & 0xFF else 0)
        i += 1
      }
      javax.imageio.ImageIO.setUseCache(false)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** JPEG compression quality for MJPEG frames. 1.0 = an all-ones
      * quantization table, so the only loss is forward+inverse integer
      * DCT rounding — still a real DCT codec round-trip (unlike the
      * bit-exact PNG/WAV paths), which is why the graded video-decode
      * query pins a per-pixel level tolerance ([[JpegTol]]) instead of
      * bit-equality.
      */
    val JpegQuality = 1.0f

    /** Max per-pixel absolute error (in 0..255 levels) the MJPEG
      * round-trip is allowed at [[JpegQuality]]: measured worst case
      * over random printable-ASCII planes (high-frequency content, the
      * codec's hardest case) is 1 level (quality 0.95 → 9, 0.9 → 17);
      * pinned at 2 for headroom. A decode exceeding it flips the
      * graded `within_tol` column and fails the hash compare.
      *
      * ENVIRONMENT ASSUMPTION: the measurement is of the JDK's own
      * `javax.imageio` JPEG plugin (Temurin/OpenJDK 17 here — both
      * encode and decode sides). The headroom covers DCT rounding
      * spread between conformant decoders, but a JDK whose JPEG
      * plugin takes a different IDCT path could exceed it: if
      * `media_video_decode` fails on a NEW host with every other
      * media query green, suspect environment drift first — re-run
      * MultimodalSpec's measured-worst-case test (it prints the
      * observed max error) before treating it as a decode regression.
      */
    val JpegTol = 2

    /** payload bytes → grayscale baseline JPEG of the w×h plane (same
      * plane rule as [[encodePng]]: byte k = gray level of pixel k).
      * Explicit quality — ImageIO's default writer is deterministic
      * for fixed input + parameters, so the lossy plane is stable
      * across runs (MultimodalSpec pins the measured error).
      */
    def encodeJpeg(bytes: Array[Byte], width: Int,
        height: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var i = 0
      val n = width * height
      while (i < n) {
        raster.setSample(i % width, i / width, 0,
          if (i < bytes.length) bytes(i) & 0xFF else 0)
        i += 1
      }
      javax.imageio.ImageIO.setUseCache(false)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(
        javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(JpegQuality)
      val out = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      try {
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null),
          params)
      } finally { writer.dispose(); ios.close() }
      out.toByteArray
    }

    /** payload bytes → mono 16-bit signed PCM WAV, one sample per
      * byte: sample k = (b_k − 128) · 256, exactly invertible under
      * [[JdkDecoder]]'s v/65536 + 1/2 normalization (→ b_k/256).
      */
    def encodeWav(bytes: Array[Byte]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        8000f, 16, 1, true, false) // signed, little-endian
      val pcm = new Array[Byte](bytes.length * 2)
      var i = 0
      while (i < bytes.length) {
        val s = ((bytes(i) & 0xFF) - 128) << 8
        pcm(2 * i) = (s & 0xFF).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, bytes.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      try javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      finally ais.close()
      out.toByteArray
    }
  }

  /** The synthetic media relation: binary payload + typed metadata.
    * kind cycles image/audio/video by id; dims derive from payload size.
    */
  def media(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("content"),
      element_at(typedLit(Seq("image/png", "audio/wav", "video/mp4")),
        (col("doc_id") % 3 + 1).cast("int")).as("mime"),
      lit(16).as("width"),
      least(ceil(length(col("text")) / 16), lit(16)).cast("int").as("height"),
      (length(col("text")).cast("long") * 10).as("duration_ms"))

  def mediaDs(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    media(s, dir).as[MediaRow]
  }

  /** The media relation with REAL containers: image rows carry an
    * actual grayscale PNG of their payload plane, audio rows an actual
    * 16-bit PCM WAV (one sample per payload byte); video rows keep the
    * raw payload (no JDK video codec — the declared remaining stub).
    * Encoding runs partition-parallel on executors; only the binary
    * column changes, so every metadata-driven op sees the same schema.
    */
  def mediaEncoded(s: SparkSession, dir: String): Dataset[MediaRow] =
    encodeRows(mediaDs(s, dir))

  /** Container-encode any media subset (the partition-parallel stage
    * [[mediaEncoded]] runs over the full relation).
    */
  def encodeRows(rows: Dataset[MediaRow]): Dataset[MediaRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.map { m =>
      m.kind match {
        case "image" =>
          m.copy(content = MediaCodec.encodePng(m.content, m.width, m.height))
        case "audio" =>
          m.copy(content = MediaCodec.encodeWav(m.content))
        case _ => m
      }
    })
  }

  /** Decode the real-container relation: for image/audio the container
    * IS the frame set (one decoded plane per media); video chunks into
    * FrameBytes fake frames exactly like [[decodeFrames]]. One decoder
    * dispatch per row, streaming through partitions — planes never
    * leave their partition until an aggregation reduces them.
    */
  def decodeMedia(s: SparkSession, dir: String,
      decoder: Decoder = JdkDecoder): Dataset[DecodedFrame] =
    decodeRows(mediaEncoded(s, dir), decoder)

  def decodeRows(rows: Dataset[MediaRow], decoder: Decoder)
      : Dataset[DecodedFrame] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.flatMap { m =>
      if (m.kind == "video") {
        val n = (m.content.length + FrameBytes - 1) / FrameBytes
        (0 until n).iterator.map { i =>
          val chunk = m.content.slice(i * FrameBytes,
            math.min((i + 1) * FrameBytes, m.content.length))
          DecodedFrame(m.media_id, m.kind, i, m.width, m.height,
            decoder.decode(chunk, m.width, m.height))
        }
      } else Iterator.single(DecodedFrame(m.media_id, m.kind, 0,
        m.width, m.height, decoder.decode(m.content, m.width, m.height)))
    })
  }

  /** The REAL decode path as an oracle-checkable query: encode →
    * JDK-codec decode → re-quantize each plane back to source levels
    * (`round(p·256)`, bit-exact per the [[JdkDecoder]] contract) and
    * sum them. The SQL oracle computes the same sum directly from the
    * payload's character codes — so a hash match proves the PNG/WAV
    * containers round-tripped through the actual codecs losslessly.
    * Video is excluded BEFORE the decode stage: a filter above the
    * typed mapPartitions can't be pushed through it, and decoding a
    * third of the corpus to discard it is real waste. Docs whose text
    * is non-ASCII or empty are excluded by the same predicate on both
    * sides (`octet_length(content)·10 = duration_ms` ⟺ chars = bytes):
    * the oracle sums CHARACTER codes while the codecs process BYTES,
    * so the contract is only byte-exact where the two coincide —
    * rather than silently assume an ASCII corpus, the query states the
    * boundary. Video's decode is the declared stub, covered by
    * MultimodalSpec instead.
    */
  def mediaDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val decodable = media(s, dir)
      .filter(col("kind") =!= "video" &&
        octet_length(col("content")) * 10 === col("duration_ms") &&
        col("duration_ms") > 0)
      .as[MediaRow]
    decodeRows(encodeRows(decodable), JdkDecoder).toDF()
      .select(col("media_id"), col("kind"),
        size(col("pixels")).as("n_px"),
        aggregate(col("pixels"), lit(0L),
          (a, x) => a + round(x * 256).cast("long")).as("px_sum"))
      .orderBy(col("media_id"))
  }

  /** Frame sampling: split the payload into FrameBytes chunks, keep
    * every `stride`-th. Pure column ops (no decode needed to *sample*),
    * so Catalyst prunes and the explode is the only row expansion.
    */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame = {
    val nFrames = ceil(length(col("content")).cast("double") / FrameBytes)
      .cast("int")
    // empty payload → zero frames (sequence(0, -1) would yield [0, -1])
    val idxs = when(nFrames > 0,
      filter(sequence(lit(0), nFrames - 1), i => i % stride === 0))
      .otherwise(array().cast("array<int>"))
    df.withColumn("frame_idx", explode(idxs))
      .withColumn("frame_bytes",
        expr(s"substring(content, frame_idx * $FrameBytes + 1, $FrameBytes)"))
  }

  /** Decode every (sampled) frame via the pluggable decoder, one
    * decoder per partition, streaming — the JVM mirror of an
    * arrow-batched decode UDF.
    */
  def decodeFrames(s: SparkSession, dir: String, stride: Int = 2,
      decoder: Decoder = FakeDecoder): Dataset[DecodedFrame] = {
    import s.implicits._
    val framed = sampleFrames(mediaDs(s, dir).toDF(), stride)
      .select(col("media_id"), col("kind"), col("frame_idx"),
        col("width"), col("height"), col("frame_bytes"))
    framed.as[FrameIn]
      .mapPartitions { it =>
        val d = decoder // one instance per partition
        it.map(f => DecodedFrame(f.media_id, f.kind, f.frame_idx,
          f.width, f.height, d.decode(f.frame_bytes, f.width, f.height)))
      }
  }

  /** Resize = average-pool the decoded plane to (w2,h2) — deterministic
    * arithmetic on the fake planes, the real op shape for a real codec.
    */
  def resize(frames: Dataset[DecodedFrame], w2: Int, h2: Int)
      : Dataset[DecodedFrame] = {
    import frames.sparkSession.implicits._
    frames.map { f =>
      val out = Array.tabulate(w2 * h2) { i =>
        val (x2, y2) = (i % w2, i / w2)
        val (x0, x1) = (x2 * f.width / w2, ((x2 + 1) * f.width / w2).max(x2 * f.width / w2 + 1))
        val (y0, y1) = (y2 * f.height / h2, ((y2 + 1) * f.height / h2).max(y2 * f.height / h2 + 1))
        var s = 0.0f; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val idx = y * f.width + x
            if (idx < f.pixels.length) { s += f.pixels(idx); n += 1 }
            x += 1
          }
          y += 1
        }
        if (n == 0) 0.0f else s / n
      }
      f.copy(width = w2, height = h2, pixels = out)
    }
  }

  /** Per-media feature extraction over decoded frames: frame count and
    * pixel mean/std — a groupBy aggregation (map-side combinable) over
    * per-frame partial sums, never shipping pixel planes to the driver.
    */
  def features(frames: Dataset[DecodedFrame]): DataFrame =
    frames.toDF()
      .select(col("media_id"), col("kind"),
        aggregate(col("pixels"), lit(0.0), (a, x) => a + x).as("sum"),
        aggregate(col("pixels"), lit(0.0), (a, x) => a + x * x).as("sumsq"),
        size(col("pixels")).as("n"))
      .groupBy(col("media_id"), col("kind"))
      .agg(count(lit(1)).cast("int").as("n_frames"),
        (sum("sum") / sum("n")).as("mean"),
        sqrt(greatest(lit(0.0), (sum("sumsq") / sum("n")) -
          pow(sum("sum") / sum("n"), 2))).as("std"))

  /** Descriptor dimension for `descriptors`. */
  val DescriptorDim = 8

  /** Fixed-dim media descriptor: per-frame pixel means of the first
    * `DescriptorDim` sampled frames, zero-padded — the
    * embedding-from-media plumbing (with the stub decoder supplying
    * deterministic planes; a real model head swaps in at the same
    * boundary). One aggregation over the decoded-frame stream; planes
    * never leave their partitions, only the k floats per media do.
    */
  def descriptors(s: SparkSession, dir: String): DataFrame = {
    val frameMean = aggregate(col("pixels"), lit(0.0), (a, x) => a + x)
      .cast("double") / size(col("pixels"))
    val ordered = transform(
      array_sort(collect_list(struct(col("frame_idx"), frameMean.as("m")))),
      x => x.getField("m").cast("float"))
    decodeFrames(s, dir).toDF()
      .groupBy(col("media_id"), col("kind"))
      .agg(ordered.as("raw"))
      .select(col("media_id"), col("kind"),
        slice(concat(col("raw"),
          array_repeat(lit(0.0f), DescriptorDim)), 1, DescriptorDim)
          .as("descriptor"))
  }

  /** Cross-pack composition: near-duplicate media by cosine over the
    * frame descriptors — decode → embed → the same vec_dot pairing the
    * text/embedding packs use. Quadratic pair form (fine for the
    * descriptor grain); at corpus scale the LSH bucketing from
    * Similarity applies unchanged to these vectors.
    */
  def mediaNearDup(s: SparkSession, dir: String, minCos: Double = 0.999)
      : DataFrame = {
    val d = descriptors(s, dir)
      .select(col("media_id"), col("descriptor"),
        sqrt(call_function("vec_dot", col("descriptor"), col("descriptor")))
          .as("nrm"))
    val a = d.toDF("id_a", "v_a", "nrm_a")
    val b = d.toDF("id_b", "v_b", "nrm_b")
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", call_function("vec_dot", col("v_a"), col("v_b"))
        / col("nrm_a") / col("nrm_b"))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Oracle-checkable metadata/shape stats (no decode involved):
    * payload size, frame count, sampled-frame count at stride 2.
    */
  def mediaStats(s: SparkSession, dir: String): DataFrame =
    media(s, dir).select(
      col("media_id"), col("kind"), col("mime"),
      octet_length(col("content")).as("n_bytes"),
      col("width"), col("height"), col("duration_ms"))
      .withColumn("n_frames",
        ceil(col("n_bytes").cast("double") / FrameBytes).cast("int"))
      .withColumn("n_sampled",
        floor((col("n_frames") + 1) / 2).cast("int"))
      .orderBy(col("media_id"))

  /** The frame-sampling plumbing as an oracle-checkable query: every
    * stride-2 sampled frame's index, length, and md5 fingerprint.
    * Still zero decode — one codegen'd explode over payload slices (the
    * exact shape a real decoder's `mapPartitions` consumes). This
    * ORACLED query frames the payload by CHARACTERS of the decoded
    * string (DuckDB 1.0 cannot slice BLOBs, and character slicing is
    * well-defined in both engines for any UTF-8 text); the byte-exact
    * path for real codecs is `sampleFrames`/`decodeFrames` above,
    * covered by MultimodalSpec.
    */
  def mediaFrames(s: SparkSession, dir: String): DataFrame = {
    val txt = col("content").cast("string")
    val nFrames = ceil(length(txt).cast("double") / FrameBytes).cast("int")
    val idxs = when(nFrames > 0,
      filter(sequence(lit(0), nFrames - 1), i => i % 2 === 0))
      .otherwise(array().cast("array<int>"))
    val frame = expr(
      s"substring(cast(content as string), frame_idx * $FrameBytes + 1, $FrameBytes)")
    media(s, dir)
      .withColumn("frame_idx", explode(idxs))
      .select(col("media_id"), col("kind"), col("frame_idx"),
        length(frame).as("frame_len"),
        md5(frame.cast("binary")).as("frame_md5"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  // --- VIDEO at the container level: a real AVI index, no codec -----

  /** Parsed AVI container index — everything a pipeline can know about
    * a video WITHOUT a codec: stream geometry from `avih`, the movi
    * frame directory (offset/size per frame), and the `idx1` entry
    * count. This is the metadata grain video curation runs at (frame
    * sampling, bitrate stats, seek tables); FRAME PIXEL decode remains
    * the declared out-of-JDK boundary ([[FakeDecoder]]).
    */
  case class VideoIndex(n_frames: Int, us_per_frame: Int, width: Int,
      height: Int, frames: Seq[(Long, Int)], idx_entries: Int)

  /** Minimal spec-correct AVI writer/reader (RIFF / LIST hdrl / avih /
    * strl / LIST movi / 00dc chunks / idx1 — all little-endian, chunks
    * word-aligned per the RIFF rule). The writer chunks a payload into
    * [[FrameBytes]] MJPG-stream frames; the reader walks the RIFF tree
    * generically (it never assumes the writer's sizes), so the parse
    * is a genuine container round-trip, not an arithmetic identity.
    */
  object AviCodec {
    /** 10 fps — dwMicroSecPerFrame in `avih`. */
    val UsPerFrame = 100000

    private def le32(v: Int): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

    private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    def encodeAvi(payload: Array[Byte], width: Int, height: Int)
        : Array[Byte] = {
      val n = (payload.length + FrameBytes - 1) / FrameBytes
      val chunks = (0 until n).map(i => payload.slice(i * FrameBytes,
        math.min((i + 1) * FrameBytes, payload.length)))
      assembleAvi(chunks, width, height, bufSize = FrameBytes)
    }

    /** The shared RIFF assembly (headers / movi / idx1) from an
      * explicit frame list — [[encodeAvi]] (raw chunks, fixed
      * geometry+buffer) and [[encodeAviMjpeg]] (per-frame JPEGs,
      * 16×16, max-frame buffer) are thin fronts, so a container-layout
      * fix can never drift between the two writers the same
      * [[parseAviIndex]] reads.
      */
    private def assembleAvi(frames: Seq[Array[Byte]], width: Int,
        height: Int, bufSize: Int): Array[Byte] = {
      val n = frames.length
      val out = new java.io.ByteArrayOutputStream()
      val avih = new java.io.ByteArrayOutputStream()
      Seq(UsPerFrame, 0, 0, 0x10 /* AVIF_HASINDEX */, n, 0, 1,
        bufSize, width, height, 0, 0, 0, 0).foreach(v => avih.write(le32(v)))
      val strh = new java.io.ByteArrayOutputStream()
      strh.write(fcc("vids")); strh.write(fcc("MJPG"))
      Seq(0, 0, 0, 1 /* scale */, 10 /* rate */, 0, n, bufSize,
        -1 /* quality */, 0).foreach(v => strh.write(le32(v)))
      strh.write(le32(0)); strh.write(le32(width << 16 | height))
      val strf = new java.io.ByteArrayOutputStream()
      Seq(40, width, height,
        1 | (24 << 16) /* biPlanes=1, biBitCount=24 */).foreach(v =>
        strf.write(le32(v)))
      strf.write(fcc("MJPG"))
      Seq(width * height * 3, 0, 0, 0, 0).foreach(v => strf.write(le32(v)))
      val strl = new java.io.ByteArrayOutputStream()
      strl.write(fcc("strl"))
      strl.write(fcc("strh")); strl.write(le32(56)); strh.writeTo(strl)
      strl.write(fcc("strf")); strl.write(le32(40)); strf.writeTo(strl)
      val hdrl = new java.io.ByteArrayOutputStream()
      hdrl.write(fcc("hdrl"))
      hdrl.write(fcc("avih")); hdrl.write(le32(56)); avih.writeTo(hdrl)
      hdrl.write(fcc("LIST")); hdrl.write(le32(strl.size)); strl.writeTo(hdrl)
      val movi = new java.io.ByteArrayOutputStream()
      movi.write(fcc("movi"))
      val idxOffsets = frames.map { f =>
        val off = movi.size // relative to movi list data start
        movi.write(fcc("00dc")); movi.write(le32(f.length))
        movi.write(f, 0, f.length)
        if (f.length % 2 == 1) movi.write(0)
        off
      }
      val idx1 = new java.io.ByteArrayOutputStream()
      idxOffsets.zip(frames).foreach { case (off, f) =>
        idx1.write(fcc("00dc")); idx1.write(le32(0x10 /* KEYFRAME */))
        idx1.write(le32(off)); idx1.write(le32(f.length))
      }
      val body = new java.io.ByteArrayOutputStream()
      body.write(fcc("AVI "))
      body.write(fcc("LIST")); body.write(le32(hdrl.size)); hdrl.writeTo(body)
      body.write(fcc("LIST")); body.write(le32(movi.size)); movi.writeTo(body)
      body.write(fcc("idx1")); body.write(le32(idx1.size)); idx1.writeTo(body)
      out.write(fcc("RIFF")); out.write(le32(body.size))
      body.writeTo(out)
      out.toByteArray
    }

    /** Frame geometry of the MJPEG form: each [[FrameBytes]] payload
      * chunk becomes one 16×16 grayscale JPEG frame (256 bytes = 256
      * pixels, the [[MediaCodec.encodePng]] plane rule per frame).
      */
    val MjpegW = 16
    val MjpegH: Int = FrameBytes / MjpegW

    /** [[encodeAvi]] with REAL MJPEG `00dc` payloads: each frame chunk
      * is compressed to an actual baseline JPEG
      * ([[MediaCodec.encodeJpeg]]) before entering the movi list, so
      * the container is a video a standard player could decode. Same
      * RIFF/LIST/idx1 layout; frame sizes now vary (JPEG output), so
      * offsets come only from the generic RIFF walk, never arithmetic.
      */
    def encodeAviMjpeg(payload: Array[Byte]): Array[Byte] = {
      val n = (payload.length + FrameBytes - 1) / FrameBytes
      val jpegs = (0 until n).map { i =>
        val chunk = payload.slice(i * FrameBytes,
          math.min((i + 1) * FrameBytes, payload.length))
        MediaCodec.encodeJpeg(chunk, MjpegW, MjpegH)
      }
      val maxSz = if (jpegs.isEmpty) 0 else jpegs.map(_.length).max
      assembleAvi(jpegs, MjpegW, MjpegH, bufSize = maxSz)
    }

    /** Walk the RIFF tree and return the container index. Throws on a
      * non-AVI or truncated container (curation surfaces it as a bad
      * asset). */
    def parseAviIndex(bytes: Array[Byte]): VideoIndex = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(at: Int): String =
        new String(bytes, at, 4, "US-ASCII")
      require(bytes.length >= 12 && fourcc(0) == "RIFF" &&
        fourcc(8) == "AVI ", "not an AVI container")
      var (nF, usF, w, h) = (0, 0, 0, 0)
      var frames = Vector.empty[(Long, Int)]
      var idxEntries = 0
      def walk(from: Int, to: Int): Unit = {
        var p = from
        while (p + 8 <= to) {
          val id = fourcc(p)
          val sz = bb.getInt(p + 4)
          require(sz >= 0 && p + 8 + sz <= to, s"truncated chunk $id")
          id match {
            case "LIST" =>
              val kind = fourcc(p + 8)
              if (kind == "hdrl" || kind == "strl" || kind == "movi")
                walk(p + 12, p + 8 + sz)
            case "avih" =>
              usF = bb.getInt(p + 8)
              nF = bb.getInt(p + 8 + 16)
              w = bb.getInt(p + 8 + 32)
              h = bb.getInt(p + 8 + 36)
            case "00dc" =>
              frames :+= ((p + 8).toLong, sz)
            case "idx1" =>
              idxEntries = sz / 16
            case _ => () // unknown chunks skip by size (RIFF contract)
          }
          p += 8 + sz + (sz % 2)
        }
      }
      walk(12, bytes.length)
      VideoIndex(nF, usF, w, h, frames, idxEntries)
    }
  }

  /** Graded `media_video_index`: every video's payload is wrapped in a
    * REAL AVI container ([[AviCodec.encodeAvi]]) and indexed back by a
    * generic RIFF walk ([[AviCodec.parseAviIndex]]) — frame count,
    * geometry and per-frame offsets/sizes all come from the PARSED
    * container, and the DuckDB oracle recomputes them from first
    * principles (payload length + the container's fixed header
    * arithmetic), so a hash match proves writer and reader agree with
    * the RIFF spec layout, closing the video-metadata half of the
    * multimodal stub (pixel decode stays the declared JDK boundary).
    *
    * Scale shape: one mapPartitions over the video rows — encode +
    * parse are per-row streaming (no shuffle, planes never
    * materialize); output is one scalar row per video.
    */
  def videoIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    media(s, dir)
      .filter(col("kind") === "video" && octet_length(col("content")) > 0)
      .as[MediaRow]
      .mapPartitions(_.map { m =>
        val avi = AviCodec.encodeAvi(m.content, m.width, m.height)
        val ix = AviCodec.parseAviIndex(avi)
        (m.media_id, ix.n_frames, ix.idx_entries, ix.us_per_frame,
          ix.width, ix.height, ix.frames.map(_._2.toLong).sum,
          ix.frames.head._1, ix.frames.last._1, ix.frames.last._2)
      })
      .toDF("media_id", "n_frames", "idx_entries", "us_per_frame",
        "width", "height", "movi_bytes", "first_offset", "last_offset",
        "last_frame_size")
      .orderBy(col("media_id"))
  }

  /** Graded `media_video_decode` — VIDEO PIXELS through a real codec,
    * closing the last multimodal decode gap: each video's payload is
    * wrapped as a REAL MJPEG AVI ([[AviCodec.encodeAviMjpeg]]: every
    * frame an actual baseline JPEG), the container is re-indexed by
    * the generic RIFF walk, each `00dc` frame is pixel-decoded by
    * `javax.imageio` ([[JdkDecoder]]'s JPEG branch — MJPEG frames ARE
    * baseline JPEGs, so the "no JDK video codec" boundary was one
    * step too conservative), and every decoded plane is compared
    * pixel-by-pixel against its source chunk.
    *
    * Hash contract for a LOSSY codec: the oracle cannot run a DCT,
    * and a DCT round-trip is not bit-exact — so the graded columns
    * are the EXACT source-derived facts (frame count from the parsed
    * container, pixel count, source level sum) plus `within_tol`,
    * true iff max |decoded − source| ≤ [[MediaCodec.JpegTol]] levels
    * over every pixel of every frame. A broken parse, wrong frame
    * geometry, mis-mapped offsets or a decode drift all flip a graded
    * column; the oracle replays the source facts from character codes
    * and expects `within_tol` true. Same ASCII predicate as
    * `media_decode` (codecs see bytes, the oracle sums char codes).
    *
    * Scale shape: one mapPartitions over video rows — encode, parse,
    * decode, compare are per-row streaming; planes never leave their
    * partition; output is one scalar row per video. Inter-frame
    * codecs (H.264 etc.) remain the only out-of-JDK boundary.
    */
  def videoDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    media(s, dir)
      .filter(col("kind") === "video" &&
        octet_length(col("content")) * 10 === col("duration_ms") &&
        col("duration_ms") > 0)
      .as[MediaRow]
      .mapPartitions(_.map { m =>
        val avi = AviCodec.encodeAviMjpeg(m.content)
        val ix = AviCodec.parseAviIndex(avi)
        var srcSum = 0L
        var maxErr = 0
        var px = 0L
        ix.frames.zipWithIndex.foreach { case ((off, sz), i) =>
          val jpeg = java.util.Arrays.copyOfRange(
            avi, off.toInt, off.toInt + sz)
          val plane = JdkDecoder.decode(jpeg,
            AviCodec.MjpegW, AviCodec.MjpegH)
          val base = i * FrameBytes
          var k = 0
          while (k < plane.length) {
            val src =
              if (base + k < m.content.length) m.content(base + k) & 0xFF
              else 0
            val dec = math.round(plane(k) * 256)
            srcSum += src
            val err = math.abs(dec - src)
            if (err > maxErr) maxErr = err
            px += 1
            k += 1
          }
        }
        (m.media_id, ix.n_frames, px, srcSum,
          ix.frames.length == ix.n_frames && maxErr <= MediaCodec.JpegTol)
      })
      .toDF("media_id", "n_frames", "n_px", "src_sum", "within_tol")
      .orderBy(col("media_id"))
  }
}
