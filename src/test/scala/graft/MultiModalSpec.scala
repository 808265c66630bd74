package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{MediaAsset, MediaFeatures, MultiModal}

/** Multimodal plumbing: binaryFile ingestion with extension-sniffed
  * modality, and the stubbed decode stage's schema/determinism contract.
  */
class MultiModalSpec extends SparkSpec {

  test("ingestBinary reads bytes and sniffs modality from extension") {
    val d = Files.createTempDirectory("graft-media")
    Files.write(d.resolve("a.jpg"), Array[Byte](1, 2, 3))
    Files.write(d.resolve("b.wav"), Array[Byte](4, 5))
    Files.write(d.resolve("c.mp4"), Array[Byte](6))
    Files.write(d.resolve("notes.txt"), "t".getBytes)
    val df = MultiModal.ingestBinary(spark, s"file://$d/*")
    val got = df.select("modality", "length").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("image", 3L), ("audio", 2L), ("video", 1L), ("other", 1L)))
    // content bytes round-trip
    val img = df.filter(col("modality") === "image")
      .select("content").collect().head.getAs[Array[Byte]](0)
    assert(img.toSeq == Seq[Byte](1, 2, 3))
  }

  test("decodeFeatures is deterministic, executor-side, and shaped") {
    import spark.implicits._
    val assets = Seq(
      MediaAsset(1L, "image", Array[Byte](10, 20, 30), "s1"),
      MediaAsset(2L, "audio", Array[Byte](40), "s2")).toDS()
    val f1 = MultiModal.decodeFeatures(assets).collect().sortBy(_.asset_id)
    val f2 = MultiModal.decodeFeatures(assets).collect().sortBy(_.asset_id)
    assert(f1.length == 2)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.features.toSeq == b.features.toSeq) // deterministic stub
    }
    val img = f1.head
    assert(img.n_bytes == 3 && img.features.length == 8)
    assert(img.width >= 1 && img.width <= 1920 && img.height >= 1 && img.height <= 1080)
    assert(img.format == "stub") // 3 fake bytes: no reader recognizes them
    assert(img.features.forall(v => v >= 0f && v < 1f))
  }

  test("real PNG and JPEG headers decode to true dimensions via imageio") {
    import spark.implicits._
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      bi.setRGB(0, 0, 0xff8800)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, fmt, bos))
      bos.toByteArray
    }
    val assets = Seq(
      MediaAsset(1L, "image", imageBytes(37, 23, "png"), "s"),
      MediaAsset(2L, "image", imageBytes(64, 48, "jpg"), "s"),
      MediaAsset(3L, "image", Array[Byte](9, 9, 9), "s"), // unreadable
      MediaAsset(4L, "audio", imageBytes(8, 8, "png"), "s") // wrong modality
    ).toDS()
    val out = MultiModal.decodeFeatures(assets).collect()
      .map(f => f.asset_id -> f).toMap
    assert(out(1L).width == 37 && out(1L).height == 23 &&
      out(1L).format == "png")
    assert(out(2L).width == 64 && out(2L).height == 48 &&
      out(2L).format.startsWith("jp")) // "jpeg"
    assert(out(3L).format == "stub") // falls back, never crashes
    assert(out(4L).format == "stub") // only image modality decodes
    // and the binaryFile ingest composes with the real decode end-to-end
    val d = java.nio.file.Files.createTempDirectory("graft-realimg")
    java.nio.file.Files.write(d.resolve("pic.png"), imageBytes(120, 77, "png"))
    val ingested = MultiModal.ingestBinary(spark, s"file://$d/*")
      .select("modality", "content").collect().head
    assert(ingested.getString(0) == "image")
    val asset = MediaAsset(9L, "image", ingested.getAs[Array[Byte]](1), "s")
    val f = MultiModal.decode(asset)
    assert(f.width == 120 && f.height == 77 && f.format == "png")
  }

  test("extractFeatures computes real pixel statistics for decodable images") {
    import spark.implicits._
    def solid(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) bi.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "png", bos))
      bos.toByteArray
    }
    def ramp(w: Int, h: Int): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 255) / math.max(1, w - 1)
        bi.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "png", bos))
      bos.toByteArray
    }
    val assets = Seq(
      MediaAsset(1L, "image", solid(10, 6, 0xff0000), "s"), // pure red
      MediaAsset(2L, "image", ramp(64, 4), "s"),            // gray ramp
      MediaAsset(3L, "audio", solid(8, 8, 0x00ff00), "s"),  // wrong modality
      MediaAsset(4L, "image", Array[Byte](1, 2, 3), "s")    // undecodable
    ).toDS()
    val out = MultiModal.extractFeatures(assets).collect()
      .map(f => f.asset_id -> f).toMap

    val red = out(1L)
    assert(red.width == 10 && red.height == 6 && red.format == "png")
    val Array(mr, mg, mb, luma, lstd, aspect, grad, sat) = red.features
    assert(math.abs(mr - 1f) < 1e-3 && mg < 1e-3 && mb < 1e-3)
    assert(math.abs(luma - 0.299f) < 1e-3) // Rec.601 red luma
    assert(lstd < 1e-3 && grad < 1e-3)     // uniform image: no variance
    assert(math.abs(aspect - 10f / 16f) < 1e-6)
    assert(math.abs(sat - 1f) < 1e-3)      // fully saturated

    val g = out(2L).features
    assert(g(4) > 0.1f)            // ramp: real luma spread
    assert(g(6) > 0f)              // nonzero horizontal gradient
    assert(g(7) < 1e-3f)           // gray: zero saturation
    assert(math.abs(g(0) - g(1)) < 1e-3 && math.abs(g(1) - g(2)) < 1e-3)

    // non-image and undecodable payloads keep the stub contract
    assert(out(3L).format == "stub" && out(4L).format == "stub")
    assert(out(4L).features.forall(v => v >= 0f && v < 1f))
    // determinism: a second pass is bit-identical
    val again = MultiModal.extractFeatures(assets).collect()
      .map(f => f.asset_id -> f).toMap
    assert(out(1L).features.toSeq == again(1L).features.toSeq &&
      out(2L).features.toSeq == again(2L).features.toSeq)
  }

  test("malformed image headers degrade to the stub instead of failing the task") {
    // ADVICE r8: imageio readers throw RUNTIME exceptions (not just
    // IOException) on crawl-grade garbage — e.g. a PNG magic followed
    // by a chunk length of -1, or a header truncated mid-IHDR. Every
    // one of these must come back as the stub, never an exception.
    val pngMagic = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    val negLenChunk = pngMagic ++ Array(0xFF, 0xFF, 0xFF, 0xFF).map(_.toByte) ++
      "IHDR".getBytes ++ Array.fill[Byte](8)(0x41)
    val truncated = pngMagic ++ Array[Byte](0, 0, 0, 13) ++ "IHDR".getBytes
    val jpegGarbage = Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte) ++
      Array.fill[Byte](16)(0x7F)
    val gifGarbage = "GIF89a".getBytes ++ Array.fill[Byte](3)(0xFF.toByte)
    Seq(negLenChunk, truncated, jpegGarbage, gifGarbage,
      Array.empty[Byte]).zipWithIndex.foreach { case (bytes, i) =>
      val f = MultiModal.decode(
        graft.operators.MediaAsset(i.toLong, "image", bytes, "s"))
      assert(f.format == "stub", s"payload $i did not fall back to the stub")
    }
  }

  test("real WAV headers decode to true audio metadata via javax.sound") {
    // synthesize a REAL 8 kHz mono 16-bit PCM WAV (400 frames = 50 ms)
    // through the JDK's own writer, then decode it back from bytes
    val sampleRate = 8000f
    val nFrames = 400
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val pcm = Array.tabulate(nFrames * 2) { i =>
      (math.sin(i / 7.0) * 1000).toInt.toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    val hdr = MultiModal.decodeAudioHeader(wav)
    assert(hdr.contains((8000f, 1, 16, nFrames.toLong, "wave")))

    // the typed stage carries the full-fidelity row, incl. duration
    import spark.implicits._
    val assets = Seq(
      MediaAsset(1L, "audio", wav, "s1"),
      MediaAsset(2L, "audio", Array[Byte](1, 2, 3, 4), "s2")).toDS()
    val rows = MultiModal.decodeAudio(assets).collect()
      .map(a => a.asset_id -> a).toMap
    val ok = rows(1L)
    assert(ok.format == "wave" && ok.sample_rate_hz == 8000f &&
      ok.channels == 1 && ok.bits_per_sample == 16 &&
      ok.frames == nFrames.toLong && ok.duration_ms == 50L)
    assert(rows(2L).format == "stub" && rows(2L).frames == -1L,
      "non-audio garbage must degrade to the stub row")

    // the shared decode() path overlays real audio dims on the stub
    val f = MultiModal.decode(MediaAsset(3L, "audio", wav, "s"))
    assert(f.format == "wave" && f.width == 8000 && f.height == 1)
  }

  test("audioEnergy: windowed RMS, silence and clipping on a real WAV") {
    // 8 kHz mono 16-bit WAV, three 0.2 s sections: a 16384-amplitude
    // sine (RMS = a/√2 ⇒ ~354 milli of full scale), digital silence,
    // and a rail-to-rail square (RMS ~1000 milli, every sample clipped)
    val sr = 8000
    val secFrames = 1600 // 0.2 s
    def le(s: Int): Seq[Byte] = Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
    val sine = (0 until secFrames).flatMap(i =>
      le((16384 * math.sin(2 * math.Pi * 440 * i / sr)).toInt))
    val silence = Seq.fill(secFrames * 2)(0.toByte)
    val square = (0 until secFrames).flatMap(i =>
      le(if (i % 2 == 0) 32767 else -32768))
    val pcm = (sine ++ silence ++ square).toArray
    val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, (3 * secFrames).toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    import spark.implicits._
    val assets = Seq(
      MediaAsset(1L, "audio", wav, "s1"),
      MediaAsset(2L, "audio", Array[Byte](9, 9, 9), "s2")).toDS()
    val rows = MultiModal.audioEnergy(assets, windowMs = 100)
      .collect().map(a => a.asset_id -> a).toMap

    val e = rows(1L)
    assert(e.format == "wave" && e.windows == 6L, s"windows: $e")
    assert(e.silence_windows == 2L, s"the silent 0.2 s is 2 windows: $e")
    assert(e.rms_milli_peak >= 999L && e.rms_milli_peak <= 1000L,
      s"square peak must sit at full scale: $e")
    // discrete 440 Hz sine at a=16384: RMS within rounding of a/√2
    assert(e.clipped_samples == secFrames.toLong,
      s"every square sample hits a rail: $e")
    assert(e.rms_milli_mean > 400L && e.rms_milli_mean < 500L,
      s"mean over (sine, silence, square) windows: $e")
    assert(rows(2L).format == "stub" && rows(2L).windows == 0L,
      "undecodable bytes must degrade to the stub row")
  }

  test("resize clamps dimensions preserving aspect ratio; never upscales") {
    import spark.implicits._
    val feats = Seq(
      MediaFeatures(1L, "image", 10L, 1920, 1080, "png", Array(0f)),
      MediaFeatures(2L, "image", 10L, 100, 50, "png", Array(0f))).toDS()
    val out = MultiModal.resize(feats, 640, 480).collect().sortBy(_.asset_id)
    assert(out(0).width == 640 && out(0).height == 360) // 1920x1080 -> fit 640
    assert(out(1).width == 100 && out(1).height == 50) // small: untouched
  }

  test("frameSample keeps a deterministic subset of video, all non-video") {
    import spark.implicits._
    val assets = (1 to 100).map(i =>
      MediaAsset(i.toLong, if (i % 2 == 0) "video" else "image",
        s"frame-payload-$i".getBytes, "s")).toDS()
    val once = MultiModal.frameSample(assets, 4).collect().map(_.asset_id).toSet
    val again = MultiModal.frameSample(assets, 4).collect().map(_.asset_id).toSet
    assert(once == again) // deterministic
    val images = assets.collect().filter(_.modality == "image").map(_.asset_id).toSet
    assert(images.subsetOf(once)) // non-video passes through
    val videosKept = once.size - images.size
    assert(videosKept > 0 && videosKept < 50) // sampled, not all/none
  }

  test("resizePixels: real bilinear resample to clamped dims; passthrough outside scope") {
    import spark.implicits._
    def imageBytes(w: Int, h: Int): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        bi.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "png", bos))
      bos.toByteArray
    }
    val big = imageBytes(32, 16)
    val small = imageBytes(6, 4)
    val assets = Seq(
      MediaAsset(1L, "image", big, "s"),
      MediaAsset(2L, "image", small, "s"),
      MediaAsset(3L, "audio", Array[Byte](1, 2, 3), "s")).toDS()
    val out = MultiModal.resizePixels(assets, maxW = 8, maxH = 8)
      .collect().map(a => a.asset_id -> a).toMap
    // 32x16 clamped into 8x8 preserving aspect -> 8x4, REAL pixels
    val r = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).content))
    assert(r.getWidth == 8 && r.getHeight == 4,
      s"resampled dims ${r.getWidth}x${r.getHeight}, want 8x4")
    // and the metadata resize stage computes the SAME target dims
    val metaDims = {
      val f = MultiModal.decode(MediaAsset(1L, "image", big, "s"))
      val g = MultiModal.resize(Seq(f).toDS(), 8, 8).collect().head
      (g.width, g.height)
    }
    assert(metaDims == (8, 4), s"metadata resize disagreed: $metaDims")
    // already within bounds / undecodable: byte-identical passthrough
    assert(out(2L).content.sameElements(small))
    assert(out(3L).content.sameElements(Array[Byte](1, 2, 3)))
    // deterministic: same input bytes -> same output bytes
    val again = MultiModal.resizePixels(assets, 8, 8)
      .collect().map(a => a.asset_id -> a).toMap
    assert(out(1L).content.sameElements(again(1L).content))
  }

  test("decode stage plans as a map-only stage (no shuffle)") {
    import spark.implicits._
    val assets = Seq(MediaAsset(1L, "image", Array[Byte](1), "s")).toDS()
    val plan = MultiModal.decodeFeatures(assets).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("dHash: re-encode and 1-px shift are hash-invariant; perturb lands within Hamming 2") {
    // VERDICT r13 ask #3, fixture half: the perceptual hash must see
    // through the two transformations the content digest cannot — a
    // byte-different lossless re-encode (PNG→BMP) and a 1-px shift —
    // and place a genuine small edit in the near-dup band.
    def hashOf(id: Long, v: Int): Long =
      MultiModal.dHash64(MultiModal.synthImageBytes(id, v)).get
    (0L until 12L).foreach { id =>
      val base = hashOf(id, 0)
      assert(hashOf(id, 1) == base,
        s"BMP re-encode must hash identical (id=$id)")
      assert(hashOf(id, 2) == base,
        s"1-px shift must hash identical by the level-walk bound (id=$id)")
      val d = java.lang.Long.bitCount(base ^ hashOf(id, 3))
      assert(d <= 2, s"one-cell perturb must stay within Hamming 2, got $d")
    }
    // different base images are far apart — the no-false-positive side
    val bases = (0L until 12L).map(hashOf(_, 0))
    for (i <- bases.indices; j <- bases.indices if i < j) {
      val d = java.lang.Long.bitCount(bases(i) ^ bases(j))
      assert(d > MultiModal.DHashMaxHamming,
        s"distinct images too close: $i vs $j at Hamming $d")
    }
  }

  test("audioHash64: transcode and time shift are hash-invariant; perturb lands within Hamming 2") {
    // q202's fixture contract (the audio twin of the dHash test): the
    // envelope hash must see through a lossless container transcode
    // (WAV→AIFF) and a small cyclic time shift, and place a one-window
    // edit in the near-dup band — all through REAL JDK decode.
    def hashOf(id: Long, v: Int): Long =
      MultiModal.audioHash64(MultiModal.synthWavBytes(id, v)).get
    (0L until 10L).foreach { id =>
      val base = hashOf(id, 0)
      assert(hashOf(id, 1) == base,
        s"AIFF transcode must hash identical (id=$id)")
      assert(hashOf(id, 2) == base,
        s"32-sample shift must hash identical by the level-walk bound (id=$id)")
      val d = java.lang.Long.bitCount(base ^ hashOf(id, 3))
      assert(d <= 2, s"one-window perturb must stay within Hamming 2, got $d")
    }
    val bases = (0L until 10L).map(hashOf(_, 0))
    for (i <- bases.indices; j <- bases.indices if i < j) {
      val d = java.lang.Long.bitCount(bases(i) ^ bases(j))
      assert(d > MultiModal.DHashMaxHamming,
        s"distinct recordings too close: $i vs $j at Hamming $d")
    }
  }

  test("perceptualPairs: banded candidates + verify equal the all-pairs brute force") {
    // Pigeonhole completeness (4 bands × 16 bits, threshold 3 < 4):
    // banding must return EXACTLY the brute-force Hamming ≤ 3 pairs —
    // including near-threshold cases — on a hash set spanning
    // distances 0..8 around several far-apart seeds.
    import spark.implicits._
    val seeds = Seq(0x0123456789abcdefL, 0x7ea5a5a5c3c3ffL, -0x123456789abcdL)
    // variant k flips the k lowest of a spread bit pattern: distances
    // from the seed run 0,1,2,3,4,6,8 — both sides of the threshold
    def flipK(h: Long, k: Int): Long = {
      val bits = Seq(0, 13, 21, 34, 42, 55, 60, 7) // spread across bands
      bits.take(k).foldLeft(h)((acc, b) => acc ^ (1L << b))
    }
    val rows = for {
      (s, si) <- seeds.zipWithIndex
      k <- Seq(0, 1, 2, 3, 4, 6, 8)
    } yield (si * 100L + k, flipK(s, k))
    val hashes = rows.toDF("asset_id", "hash")
    val got = MultiModal.perceptualPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= MultiModal.DHashMaxHamming
    } yield (a, b, d.toLong)).toSet
    assert(got == brute,
      s"banding drifted from brute force: missing=${brute -- got}, " +
        s"extra=${got -- brute}")
    assert(brute.exists(_._3 == 3L),
      "fixture must exercise the exact threshold boundary")
    assert(brute.nonEmpty && brute.size < rows.size * (rows.size - 1) / 2,
      "fixture must be non-trivial on both sides of the threshold")
  }

  test("frame-stack container round-trips; malformed payloads decode to zero frames") {
    val frames = (0L until 4L)
      .map(i => MultiModal.synthImageBytes(5000 + i, 0))
    val packed = MultiModal.frameStackBytes(frames)
    val got = MultiModal.decodeFrameStack(packed)
    assert(got.length == 4 &&
      got.zip(frames).forall { case (a, b) =>
        java.util.Arrays.equals(a, b) },
      "frame payloads must round-trip byte-identical")
    // malformed: wrong magic, truncated header, truncated payload
    assert(MultiModal.decodeFrameStack("XYZ!rest".getBytes).isEmpty)
    assert(MultiModal.decodeFrameStack(packed.take(6)).isEmpty)
    assert(MultiModal.decodeFrameStack(packed.dropRight(10)).isEmpty)
    assert(MultiModal.decodeFrameStack(Array.emptyByteArray).isEmpty)
  }

  test("q209 fixture premise: distinct frame images sit beyond Hamming 3 of each other") {
    // the oracle's zero-cross / exact-containment arithmetic rests on
    // distinct level-walk images never banding together at radius 3 —
    // the fixture is deterministic, so this pins the premise for the
    // whole image-id population q209/q210 draw from (24 fixture ids +
    // 6 decoy ids, 8 slots each)
    val hs = (0L until 30L).flatMap(id => (0L until 8L).map(f =>
      MultiModal.dHash64(
        MultiModal.synthImageBytes(2000L + id * 8 + f, 0)).get))
    for (i <- hs.indices; j <- (i + 1) until hs.length)
      assert(java.lang.Long.bitCount(hs(i) ^ hs(j)) >
        MultiModal.DHashMaxHamming,
        s"fixture images $i and $j collide within the verify radius")
  }

  test("q214 fixture premise: shift re-encode is hash-identical; adjacent scene anchors differ") {
    // the scene-run arithmetic rests on two deterministic facts about
    // the synth fixture: (1) variant 2 (1-px shift) hashes
    // bit-identically to the base (the level-walk guarantee q209's
    // variant-1 leg already relies on), so intra-scene Hamming is
    // exactly 0; (2) ADJACENT scene anchors have distinct hashes, so
    // every boundary is a cut at threshold 0
    for (id <- 0L until 32L) {
      val sc = 1 + (id % 4).toInt
      val anchors = (0 until sc).map(j =>
        MultiModal.dHash64(
          MultiModal.synthImageBytes(3000L + id * 4 + j, 0)).get)
      for (j <- 0 until sc) {
        val shifted = MultiModal.dHash64(
          MultiModal.synthImageBytes(3000L + id * 4 + j, 2)).get
        assert(shifted == anchors(j),
          s"id=$id scene=$j: shift re-encode changed the hash")
      }
      for (j <- 1 until sc)
        assert(anchors(j) != anchors(j - 1),
          s"id=$id: adjacent scene anchors $j-1/$j collide — no cut")
    }
  }

  test("videoSceneRuns equals brute-force run segmentation, nonzero threshold included") {
    import spark.implicits._
    def flip(h: Long, bits: Int*): Long =
      bits.foldLeft(h)((acc, b) => acc ^ (1L << b))
    val base = 0x0123456789abcdefL
    // asset 1: cuts of Hamming 1 (sub-threshold at cutHamming=2) and
    // Hamming 5 (cut); asset 2: monotone drift, every step Hamming 3;
    // asset 3: single frame (one scene, zero cuts)
    val rows = Seq(
      (1L, 0L, base), (1L, 1L, flip(base, 7)),
      (1L, 2L, flip(base, 7, 10, 20, 30, 40)),
      (1L, 3L, flip(base, 7, 10, 20, 30, 40)),
      (2L, 0L, base), (2L, 1L, flip(base, 1, 2, 3)),
      (2L, 2L, flip(base, 1, 2, 3, 11, 12, 13)),
      (3L, 0L, flip(base, 63)))
    val fh = rows.toDF("asset_id", "frame_idx", "hash")
    for (thr <- Seq(0, 2)) {
      val got = MultiModal.videoSceneRuns(fh, thr).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val brute = rows.groupBy(_._1).map { case (aid, fr) =>
        val hs = fr.sortBy(_._2).map(_._3)
        val cutAt = hs.zip(hs.tail).map { case (a, b) =>
          java.lang.Long.bitCount(a ^ b) > thr }
        val runs = cutAt.foldLeft(List(1)) { (acc, cut) =>
          if (cut) 1 :: acc else (acc.head + 1) :: acc.tail }
        (aid, hs.length.toLong, runs.length.toLong,
          (runs.length - 1).toLong, runs.max.toLong)
      }.toSet
      assert(got == brute,
        s"thr=$thr: scene runs drifted from brute force:\n" +
          s" got  $got\n want $brute")
    }
  }

  test("videoPairs: banded containment rollup equals the brute-force frame matching") {
    import spark.implicits._
    // hand-built 64-bit frame hashes exercising ties, partial overlap,
    // and the distinct-frame rule (two frames of b matching ONE frame
    // of a count once)
    def flip(h: Long, bits: Int*): Long =
      bits.foldLeft(h)((acc, b) => acc ^ (1L << b))
    val base = 0x0123456789abcdefL
    val rows = Seq(
      // asset 1: three frames
      (1L, 0L, base), (1L, 1L, flip(base, 10, 20, 30, 40, 50)),
      (1L, 2L, flip(base, 1, 2, 3, 4, 5, 6, 7, 8)),
      // asset 2: frame 0 matches a1f0 exactly, frame 1 within 2,
      // frame 2 unrelated
      (2L, 0L, base), (2L, 1L, flip(base, 0, 63)),
      (2L, 2L, flip(base, 11, 22, 33, 44, 55, 60)),
      // asset 3: both frames match a1f1's hash (distinct-frame rule:
      // a1f1 counts ONCE toward (1,3))
      (3L, 0L, flip(base, 10, 20, 30, 40, 50)),
      (3L, 1L, flip(base, 10, 20, 30, 40, 50, 63)))
    val fh = rows.toDF("asset_id", "frame_idx", "hash")
    val got = MultiModal.videoPairs(fh).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (va, _, _) <- rows.map(r => (r._1, 0, 0)).distinct
      (vb, _, _) <- rows.map(r => (r._1, 0, 0)).distinct
      if va < vb
    } yield {
      val matched = rows.filter(_._1 == va).count { a =>
        rows.filter(_._1 == vb).exists(b =>
          java.lang.Long.bitCount(a._3 ^ b._3) <=
            MultiModal.DHashMaxHamming)
      }.toLong
      (va, vb, matched)
    }).filter(_._3 > 0).toSet
    assert(got == brute,
      s"containment drifted from brute force:\n got  $got\n want $brute")
    assert(brute.contains((1L, 3L, 1L)),
      "fixture must exercise the distinct-frame counting rule")
    // the higher-side variant (the ingest drop rule's statistic):
    // distinct frames of b matched in a
    val gotHi = MultiModal.videoPairsHigherSide(fh).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bruteHi = (for {
      (va, _, _) <- rows.map(r => (r._1, 0, 0)).distinct
      (vb, _, _) <- rows.map(r => (r._1, 0, 0)).distinct
      if va < vb
    } yield {
      val matched = rows.filter(_._1 == vb).count { b =>
        rows.filter(_._1 == va).exists(a =>
          java.lang.Long.bitCount(a._3 ^ b._3) <=
            MultiModal.DHashMaxHamming)
      }.toLong
      (va, vb, matched)
    }).filter(_._3 > 0).toSet
    assert(gotHi == bruteHi,
      s"higher-side containment drifted:\n got  $gotHi\n want $bruteHi")
    // both of asset 3's frames match asset 1's ONE frame — the two
    // sides genuinely differ on this fixture
    assert(bruteHi.contains((1L, 3L, 2L)) && brute.contains((1L, 3L, 1L)),
      "fixture must separate the two counting sides")
    // the packing bound: a frame at index >= maxFrames is excluded,
    // never aliased into the next asset's id space
    val aliased = rows :+ (1L, 4096L, rows.head._3)
    assert(MultiModal.videoPairs(aliased.toDF("asset_id", "frame_idx",
      "hash")).collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2))).toSet == brute,
      "an out-of-bound frame_idx must be excluded, not aliased")
  }

  test("videoTemporalPairs: exact bigram containment equals brute force; gaps break adjacency; reorder zeroes it") {
    import spark.implicits._
    val h = (0L until 6L).map(i => 0x1111111111110000L + i * 977L)
    val rows = Seq(
      // asset 1: frames 0..4 = h0..h4
      (1L, 0L, h(0)), (1L, 1L, h(1)), (1L, 2L, h(2)), (1L, 3L, h(3)),
      (1L, 4L, h(4)),
      // asset 2: same frames REVERSED — bag-identical, zero bigrams
      (2L, 0L, h(4)), (2L, 1L, h(3)), (2L, 2L, h(2)), (2L, 3L, h(1)),
      (2L, 4L, h(0)),
      // asset 3: frames 1..4 with a GAP at index 2 (undecodable frame
      // dropped) — bigram (h1,h2) must NOT span the gap
      (3L, 0L, h(1)), (3L, 1L, h(2)), (3L, 3L, h(3)), (3L, 4L, h(4)),
      // asset 4: clip 2..4, order kept
      (4L, 0L, h(2)), (4L, 1L, h(3)), (4L, 2L, h(4)))
    val fh = rows.toDF("asset_id", "frame_idx", "hash")
    val got = MultiModal.videoTemporalPairs(fh).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def bigrams(a: Long): Seq[(Long, Long, Long)] = {
      val fs = rows.filter(_._1 == a)
      fs.flatMap { case (_, p, x) =>
        fs.find(_._2 == p + 1).map(n => (p, x, n._3)) }
    }
    val brute = (for {
      a <- rows.map(_._1).distinct; b <- rows.map(_._1).distinct
      if a < b
    } yield {
      val bb = bigrams(b).map(g => (g._2, g._3)).toSet
      (a, b, bigrams(a).count(g => bb.contains((g._2, g._3))).toLong)
    }).filter(_._3 > 0).toSet
    assert(got == brute,
      s"temporal containment drifted:\n got  $got\n want $brute")
    assert(!got.exists(p => p._1 == 1L && p._2 == 2L),
      "reversed asset must share ZERO ordered bigrams")
    // the gap: asset 3's bigrams are (h1,h2) and (h3,h4) only — its
    // containment in 1 is 2, NOT 3
    assert(got.contains((1L, 3L, 2L)),
      s"gap handling wrong: $got")
    assert(got.contains((1L, 4L, 2L)), s"clip bigrams wrong: $got")
  }

  test("synthPerturbHamming: level-walk derivation equals the decoded base/perturb hash distance (q206's oracle literal)") {
    // the q206 oracle interpolates synthPerturbHamming(id) as ground
    // truth — it must equal what the REAL decode+dHash path measures,
    // for every fixture id, and the fixture must exercise more than
    // one distance value (a constant table would not sweep anything)
    val hs = (0L until 40L).map { id =>
      val base = MultiModal.dHash64(MultiModal.synthImageBytes(id, 0)).get
      val pert = MultiModal.dHash64(MultiModal.synthImageBytes(id, 3)).get
      val measured = java.lang.Long.bitCount(base ^ pert)
      val derived = MultiModal.synthPerturbHamming(id)
      assert(derived == measured,
        s"id=$id: derived=$derived != measured=$measured")
      measured
    }
    assert(hs.forall(_ <= 2), s"perturb must stay within Hamming 2: $hs")
    assert(hs.distinct.size > 1,
      s"fixture must produce a non-constant distance sweep: $hs")
  }
}
