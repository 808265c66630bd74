package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fnv64
import Q._

/** A binary media asset: opaque `content` bytes plus typed metadata —
  * the multimodal column model (image/audio/video payloads ride through
  * the engine as `binary` columns, never parsed by the engine itself).
  */
final case class MediaAsset(
    asset_id: Long,
    modality: String,
    content: Array[Byte],
    source: String)

/** Decoded media features. For image formats the JDK itself can read
  * (PNG/JPEG/GIF/BMP via `javax.imageio` — no external codec needed),
  * `width`/`height`/`format` are REAL, parsed from the payload header,
  * and [[MultiModal.extractFeatures]] fills `features` with REAL pixel
  * statistics (mean RGB, luma mean/std, aspect, gradient, saturation —
  * bounded-grid sampled) from a full decode. Audio/video dimensions
  * and any MODEL-derived embedding remain the deterministic STUB
  * ([[MultiModal.stubDecode]], `format = "stub"` — those codecs/models
  * are not in this environment); the Spark-side plumbing (schema,
  * typed encoders, per-partition batching, feature-vector shape) is
  * real and tested (MultiModalSpec).
  */
final case class MediaFeatures(
    asset_id: Long,
    modality: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    format: String,
    features: Array[Float])

/** Multimodal-column operators (LLM-data-pipeline extension surface).
  *
  *  - [[ingestBinary]]: Spark's `binaryFile` source → asset DataFrame
  *    (path/length/modificationTime metadata + `content` binary column);
  *    modality inferred from the file extension, never from a decode.
  *  - [[decodeFeatures]]: the decode/feature-extract stage as
  *    `mapPartitions` over the typed Dataset — one decoder instance per
  *    partition (the Spark idiom for per-batch model/codec reuse), with
  *    the codec call replaced by [[stubDecode]], a deterministic fake
  *    keyed on the content bytes (FNV-1a) so tests are exact.
  *  - q28: per-modality byte statistics over synthetic binary payloads
  *    derived from `documents.text` (UTF-8 bytes), giving the modality
  *    path a DuckDB-checkable CORRECTNESS entry.
  *
  * Scale notes (100 TB): `binaryFile` splits listing across the driver's
  * file index but each asset is one row — partition count follows
  * `spark.sql.files.maxPartitionBytes`, so a 100 TB corpus fans out to
  * executor-parallel decode with no shuffle at all (map-only stage);
  * the per-partition decoder amortizes codec init across a batch.
  */
object MultiModal {

  private val FeatureDim = 8

  /** Read a directory of media files as an asset manifest with content.
    * Modality = lowercased file extension class (decode-free sniff).
    */
  def ingestBinary(spark: SparkSession, pathGlob: String): DataFrame = {
    val ext = lower(element_at(split(col("path"), "\\."), -1))
    spark.read.format("binaryFile").load(pathGlob)
      .select(
        col("path"), col("length"), col("modificationTime"), col("content"),
        when(ext.isin("jpg", "jpeg", "png", "gif", "bmp"), "image")
          .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
          .when(ext.isin("mp4", "avi", "mkv", "webm"), "video")
          .otherwise("other").as("modality"))
  }

  /** Deterministic fake decode: derives stable pseudo-dimensions and an
    * 8-float feature vector from the content hash. Used for every
    * payload [[decodeImageHeader]] cannot parse (audio/video/unknown
    * formats — their codecs are not in this environment); the signature
    * and the batch shape are the contract.
    */
  def stubDecode(a: MediaAsset): MediaFeatures = {
    val h = Fnv64.hashBytes(a.content)
    val feats = Array.tabulate(FeatureDim) { i =>
      // spread the 64-bit hash into [0,1) floats, slot-salted
      val hi = Fnv64.hashBytes(Array((h >>> (8 * (i % 8))).toByte, i.toByte))
      ((hi >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }
    MediaFeatures(a.asset_id, a.modality, a.content.length.toLong,
      width = (math.abs(h) % 1920 + 1).toInt,
      height = (math.abs(h >>> 32) % 1080 + 1).toInt,
      format = "stub",
      features = feats)
  }

  /** REAL header-only image decode via the JDK's own `javax.imageio`
    * (PNG/JPEG/GIF/BMP readers ship with every JRE — no external codec
    * dependency). `reader.getWidth/getHeight(0)` read the header only,
    * never the pixel data, so the cost per asset is a few hundred bytes
    * of parsing regardless of image size — the right shape for a
    * metadata scan over a 100 TB media corpus. Returns None for
    * payloads no installed reader recognizes (caller falls back to the
    * stub).
    */
  def decodeImageHeader(content: Array[Byte]): Option[(Int, Int, String)] =
    try decodeImageHeaderUnsafe(content)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImageHeaderUnsafe(
      content: Array[Byte]): Option[(Int, Int, String)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          Some((r.getWidth(0), r.getHeight(0),
            r.getFormatName.toLowerCase(java.util.Locale.ROOT)))
        } catch {
          // NonFatal, not just IOException: imageio readers throw
          // IllegalArgumentException / ArrayIndexOutOfBounds /
          // NegativeArraySize on malformed or truncated headers —
          // exactly what crawl-scale media contains, and one bad
          // payload must degrade to the stub, not fail the task
          case scala.util.control.NonFatal(_) => None
        } finally r.dispose()
      }
    } finally iis.close()
  }

  /** REAL audio header decode via the JDK's own `javax.sound.sampled`
    * (WAV/AIFF/AU parsers ship with every JRE — no external codec).
    * Returns (sampleRateHz, channels, bitsPerSample, frames,
    * containerType) parsed from the RIFF/AIFF header only — like
    * [[decodeImageHeader]], cost per asset is header bytes, never the
    * sample data, the right shape for a metadata scan over a 100 TB
    * audio store. Compressed codecs (mp3/flac/ogg) have no JDK parser
    * and return None (caller falls back to the stub).
    */
  def decodeAudioHeader(
      content: Array[Byte]): Option[(Float, Int, Int, Long, String)] =
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(content))
      val f = aff.getFormat
      Some((f.getSampleRate, f.getChannels, f.getSampleSizeInBits,
        aff.getFrameLength.toLong,
        aff.getType.toString.toLowerCase(java.util.Locale.ROOT)))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Typed audio metadata row produced by [[decodeAudio]]. */
  final case class AudioInfo(
      asset_id: Long,
      n_bytes: Long,
      sample_rate_hz: Float,
      channels: Int,
      bits_per_sample: Int,
      frames: Long,
      duration_ms: Long,
      format: String)

  /** The audio metadata scan: real header decode for every payload the
    * JDK recognizes (WAV/AIFF/AU), `format = "stub"` rows with zeroed
    * dimensions for the rest. Same map-only executor-parallel shape as
    * [[decodeFeatures]] — no shuffle, one parser per partition batch.
    */
  def decodeAudio(assets: Dataset[MediaAsset]): Dataset[AudioInfo] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        decodeAudioHeader(a.content) match {
          case Some((sr, ch, bits, frames, fmt)) =>
            val durMs =
              if (sr > 0 && frames >= 0) (frames * 1000.0 / sr).toLong
              else -1L
            AudioInfo(a.asset_id, a.content.length.toLong,
              sr, ch, bits, frames, durMs, fmt)
          case None =>
            AudioInfo(a.asset_id, a.content.length.toLong,
              0f, 0, 0, -1L, -1L, "stub")
        }
      }
    }
  }

  /** One asset through the decode stage: real `javax.imageio` header
    * decode for image payloads, real `javax.sound.sampled` header
    * decode for audio payloads the JDK recognizes (WAV/AIFF/AU — the
    * audio dims ride the width/height slots as sampleRateHz/channels,
    * documented semantic overloading of the shared features schema;
    * [[decodeAudio]] is the typed full-fidelity form), deterministic
    * stub for everything else.
    */
  def decode(a: MediaAsset): MediaFeatures =
    a.modality match {
      case "image" => decodeImageHeader(a.content) match {
        case Some((w, h, fmt)) =>
          stubDecode(a).copy(width = w, height = h, format = fmt)
        case None => stubDecode(a)
      }
      case "audio" => decodeAudioHeader(a.content) match {
        case Some((sr, ch, _, _, fmt)) =>
          stubDecode(a).copy(width = sr.toInt, height = ch, format = fmt)
        case None => stubDecode(a)
      }
      case _ => stubDecode(a)
    }

  /** REAL pixel-statistics feature vector from a full `ImageIO.read`
    * decode — pure JDK, no model, deterministic. The 8 slots:
    * mean R/G/B, luma mean, luma std, aspect w/(w+h), mean horizontal
    * luma gradient, mean saturation (max−min channel), all in [0,1].
    * Pixels sample on a fixed grid of ≤ 64×64 positions (step =
    * ceil(dim/64)), so the statistics cost is BOUNDED per asset no
    * matter how large the image — the full decode itself is the
    * unavoidable price of pixel features, which is why this stage is
    * separate from the header-only metadata scan ([[decode]]). Returns
    * (width, height, features); None when no installed reader can
    * produce pixels (caller falls back to the stub vector).
    */
  def decodePixelFeatures(
      content: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        if (w <= 0 || h <= 0) None
        else {
          val sx = math.max(1, (w + 63) / 64)
          val sy = math.max(1, (h + 63) / 64)
          var n = 0L
          var sr, sg, sb, sl, sl2, sgrad, ssat = 0.0
          var ngrad = 0L
          var y = 0
          while (y < h) {
            var x = 0
            var prevLuma = -1.0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = ((rgb >> 16) & 0xff) / 255.0
              val g = ((rgb >> 8) & 0xff) / 255.0
              val b = (rgb & 0xff) / 255.0
              val luma = 0.299 * r + 0.587 * g + 0.114 * b
              sr += r; sg += g; sb += b
              sl += luma; sl2 += luma * luma
              ssat += math.max(r, math.max(g, b)) -
                math.min(r, math.min(g, b))
              if (prevLuma >= 0) { sgrad += math.abs(luma - prevLuma); ngrad += 1 }
              prevLuma = luma
              n += 1
              x += sx
            }
            y += sy
          }
          val mean = sl / n
          val varl = math.max(0.0, sl2 / n - mean * mean)
          Some((w, h, Array(
            (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
            mean.toFloat, math.sqrt(varl).toFloat,
            (w.toDouble / (w + h)).toFloat,
            (if (ngrad > 0) sgrad / ngrad else 0.0).toFloat,
            (ssat / n).toFloat)))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The full feature-extraction stage: real pixel statistics for every
    * image payload the JDK can fully decode (width/height/format from
    * the same decode), header-or-stub fallback for the rest. Same
    * map-only executor-parallel shape as [[decodeFeatures]]; the only
    * difference is that this stage READS pixels, so at a 100 TB store
    * it runs on the assets a query actually selected, after the
    * header-only metadata scan has pruned.
    */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val px =
          if (a.modality == "image") decodePixelFeatures(a.content) else None
        px match {
          case Some((w, h, feats)) =>
            // header parse supplies the format NAME; dims come from the
            // decoded raster itself
            val fmt = decodeImageHeader(a.content)
              .map(_._3).getOrElse("image")
            MediaFeatures(a.asset_id, a.modality, a.content.length.toLong,
              w, h, fmt, feats)
          case None => decode(a)
        }
      }
    }
  }

  /** The decode/feature-extract stage: executor-parallel, one decoder
    * per partition, no shuffle.
    */
  def decodeFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition decoder init would go here (model handle; the
      // imageio registry is JVM-global and thread-safe)
      it.map(decode)
    }
  }

  /** Resize stage (images): clamps the decoded dimensions to fit inside
    * `maxW × maxH` preserving aspect ratio — pure metadata arithmetic on
    * the decoded features; the pixel resample itself is part of the
    * stubbed codec. Map-only, composes after [[decodeFeatures]].
    */
  def resize(feats: Dataset[MediaFeatures], maxW: Int, maxH: Int): Dataset[MediaFeatures] = {
    import feats.sparkSession.implicits._
    feats.map { f =>
      val scale = math.min(1.0,
        math.min(maxW.toDouble / f.width, maxH.toDouble / f.height))
      f.copy(
        width = math.max(1, math.floor(f.width * scale).toInt),
        height = math.max(1, math.floor(f.height * scale).toInt))
    }
  }

  /** REAL pixel resize for the JDK-decodable image formats
    * (PNG/JPEG/GIF/BMP): full `ImageIO` decode → bilinear `Graphics2D`
    * resample to fit inside `maxW × maxH` preserving aspect (the SAME
    * floor/clamp arithmetic as the metadata [[resize]], so the two
    * stages can never disagree about target dimensions) → PNG
    * re-encode as the new payload. Headless-safe (raster ops need no
    * display). Payloads that are already within bounds, or that no
    * installed reader recognizes (compressed audio/video, corrupt
    * bytes), pass through UNTOUCHED — a transform stage must degrade
    * per asset, never fail the task. Executor-parallel map-only, one
    * partition's assets resampled in sequence.
    */
  def resizePixels(
      assets: Dataset[MediaAsset], maxW: Int, maxH: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(resizeOnePixels(_, maxW, maxH)))
  }

  private[operators] def resizeOnePixels(
      a: MediaAsset, maxW: Int, maxH: Int): MediaAsset =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(a.content))
      if (img == null) a
      else {
        val scale = math.min(1.0, math.min(
          maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
        if (scale >= 1.0) a
        else {
          val w = math.max(1, math.floor(img.getWidth * scale).toInt)
          val h = math.max(1, math.floor(img.getHeight * scale).toInt)
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          a.copy(content = bos.toByteArray)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => a }

  /** Frame-sample stage (video): deterministically keeps every
    * `1/rate`-th asset of a modality by content hash — the Spark shape
    * of sampling frames from decoded video (stable under retries, no
    * RNG). Non-video assets pass through untouched.
    */
  def frameSample(assets: Dataset[MediaAsset], rate: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.filter { a =>
      a.modality != "video" ||
        math.floorMod(Fnv64.hashBytes(a.content), rate.toLong) == 0L
    }
  }

  /** Per-asset windowed audio energy produced by [[audioEnergy]]. All
    * level fields are integer MILLI-units of full scale (rounded once
    * from the double RMS) so rows are engine- and platform-exact.
    */
  final case class AudioEnergy(
      asset_id: Long,
      windows: Long,
      rms_milli_mean: Long,
      rms_milli_peak: Long,
      silence_windows: Long,
      clipped_samples: Long,
      format: String)

  /** Real frame-level audio ENERGY analysis — the QA pass an audio
    * training corpus runs after the header scan ([[decodeAudio]]):
    * decode the PCM samples (JDK-decodable WAV/AIFF/AU; the JDK
    * converts other PCM widths to signed 16-bit), window them at
    * `windowMs`, and report windowed RMS mean/peak, silent-window
    * count (RMS below `silenceMilli` of full scale — a mostly-silent
    * recording is a trim/ingest bug), and hard-clipped sample count
    * (|s| at int16 rails — a gain bug). Mono-folds multi-channel
    * frames by averaging channels BEFORE the square, the usual
    * loudness convention. Same map-only executor-parallel shape as
    * [[decodeAudio]]; payloads the JDK can't decode come back
    * `format = "stub"` with zeroed analysis, loudly quarantined like
    * every other stub row. Sample data never leaves the executor.
    */
  def audioEnergy(
      assets: Dataset[MediaAsset],
      windowMs: Int = 100,
      silenceMilli: Long = 10L): Dataset[AudioEnergy] = {
    require(windowMs > 0, s"windowMs must be positive: $windowMs")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a => analyzeEnergyOne(a, windowMs, silenceMilli) }
    }
  }

  private[operators] def analyzeEnergyOne(
      a: MediaAsset, windowMs: Int, silenceMilli: Long): AudioEnergy =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(a.content))
      try {
        val src = in.getFormat
        val pcm = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          2 * src.getChannels, src.getSampleRate, false)
        val s = javax.sound.sampled.AudioSystem.getAudioInputStream(pcm, in)
        try {
          val ch = pcm.getChannels
          val framesPerWindow =
            math.max(1, (pcm.getSampleRate * windowMs / 1000.0).toInt)
          val bytesPerFrame = 2 * ch
          val buf = new Array[Byte](framesPerWindow * bytesPerFrame)
          var windows = 0L; var rmsSum = 0L; var rmsPeak = 0L
          var silent = 0L; var clipped = 0L
          var eof = false
          while (!eof) {
            // fill one window (readNBytes semantics by hand: the
            // converter stream returns short reads mid-stream)
            var off = 0
            var n = s.read(buf, off, buf.length - off)
            while (n > 0 && off + n < buf.length) {
              off += n; n = s.read(buf, off, buf.length - off)
            }
            val got = if (n > 0) off + n else off
            val nFrames = got / bytesPerFrame
            if (nFrames == 0) eof = true
            else {
              var i = 0; var sumSq = 0.0
              while (i < nFrames) {
                var c = 0; var acc = 0L
                while (c < ch) {
                  val b = i * bytesPerFrame + 2 * c
                  val lo = buf(b) & 0xff
                  val hi = buf(b + 1)
                  val sample = (hi << 8) | lo
                  if (sample >= 32767 || sample <= -32768) clipped += 1
                  acc += sample
                  c += 1
                }
                val mono = acc.toDouble / ch / 32768.0
                sumSq += mono * mono
                i += 1
              }
              val rmsMilli =
                math.round(math.sqrt(sumSq / nFrames) * 1000.0)
              windows += 1; rmsSum += rmsMilli
              if (rmsMilli > rmsPeak) rmsPeak = rmsMilli
              if (rmsMilli < silenceMilli) silent += 1
              if (got < buf.length) eof = true
            }
          }
          val fmt = javax.sound.sampled.AudioSystem
            .getAudioFileFormat(new java.io.ByteArrayInputStream(a.content))
            .getType.toString.toLowerCase(java.util.Locale.ROOT)
          AudioEnergy(a.asset_id, windows,
            if (windows > 0) math.round(rmsSum.toDouble / windows) else 0L,
            rmsPeak, silent, clipped, fmt)
        } finally s.close()
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(_) =>
        AudioEnergy(a.asset_id, 0L, 0L, 0L, 0L, 0L, "stub")
    }

  // -----------------------------------------------------------------
  // Perceptual near-dup (VERDICT r13 ask #3): a re-encoded or slightly
  // shifted image has different BYTES but the same PICTURE — invisible
  // to q136's content digest. dHash is the image analogue of q26's
  // SimHash: a 64-bit fingerprint of the luma gradient structure,
  // stable under re-encode/resample, compared by Hamming distance.
  // -----------------------------------------------------------------

  /** dHash banding layout: 4 bands × 16 bits. Pigeonhole: two hashes
    * within Hamming distance [[DHashMaxHamming]] = 3 < 4 bands must
    * agree EXACTLY on at least one band, so the banded candidate join
    * is COMPLETE for the ≤ 3 regime — banding + XOR/popcount verify
    * equals the all-pairs brute force by construction (q26's layout
    * argument, MultiModalSpec asserts the identity on noisy fixtures).
    */
  val DHashBands = 4
  val DHashBandBits = 16
  val DHashMaxHamming = 3

  /** 64-bit difference hash of an image payload — pure JDK decode, no
    * model. The classic dHash recipe on the bounded sampling grid
    * [[decodePixelFeatures]] established: mean luma over a 9×8 cell
    * grid (integer 299/587/114 milli-luma sums; cost bounded at
    * ≤ 128×64 sampled positions regardless of image size), bit
    * `cy*8+cx` set iff cell (cy, cx+1) is brighter than (cy, cx).
    * The adjacent-cell comparison is exact rational arithmetic
    * (cross-multiplied sums, no float division), so the hash is
    * deterministic across platforms. Gradient STRUCTURE survives
    * re-encoding and small shifts; absolute pixel values don't need
    * to. None for payloads no installed reader decodes.
    */
  def dHash64(content: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        if (w < 9 || h < 8) None
        else {
          val sx = math.max(1, w / 128)
          val sy = math.max(1, h / 64)
          val sums = Array.ofDim[Long](8, 9)
          val cnts = Array.ofDim[Long](8, 9)
          var y = 0
          while (y < h) {
            val cy = math.min(7, y * 8 / h)
            var x = 0
            while (x < w) {
              val cx = math.min(8, x * 9 / w)
              val rgb = img.getRGB(x, y)
              val luma = 299 * ((rgb >> 16) & 0xff) +
                587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
              sums(cy)(cx) += luma
              cnts(cy)(cx) += 1
              x += sx
            }
            y += sy
          }
          var bits = 0L
          var cy = 0
          while (cy < 8) {
            var cx = 0
            while (cx < 8) {
              // mean(cy,cx+1) > mean(cy,cx), exact (cross-multiplied)
              if (sums(cy)(cx + 1) * cnts(cy)(cx) >
                  sums(cy)(cx) * cnts(cy)(cx + 1))
                bits |= 1L << (cy * 8 + cx)
              cx += 1
            }
            cy += 1
          }
          Some(bits)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The dHash stage: map-only executor-parallel, (asset_id, hash)
    * for every decodable image payload — same no-shuffle shape as
    * [[extractFeatures]]; undecodable payloads drop out (they have no
    * picture to compare).
    */
  def dhashOf(assets: Dataset[MediaAsset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap(a =>
      dHash64(a.content).map(h => (a.asset_id, h))))
      .toDF("asset_id", "hash")
  }

  /** Banded perceptual near-dup pairs over a dHash frame: candidates
    * share at least one of the 4 16-bit bands (equi-join per band —
    * NEVER all-pairs; at 100 TB the band table is the bucketed
    * persisted artifact, exactly q116's shape), then one integer
    * XOR + popcount verify per candidate (q188's discipline). For
    * `maxHamming` < [[DHashBands]] the result EQUALS the all-pairs
    * brute force (pigeonhole completeness, see [[DHashBands]]).
    * Returns (a, b, hamming), a < b.
    */
  def perceptualPairs(
      hashes: DataFrame,
      maxHamming: Int = DHashMaxHamming): DataFrame = {
    require(maxHamming < DHashBands,
      s"banding is complete only below the band count: " +
        s"maxHamming=$maxHamming, bands=$DHashBands")
    val bands = hashes.select(col("asset_id"), col("hash"),
        explode(expr(s"sequence(0, ${DHashBands - 1})")).as("band"))
      .withColumn("bits",
        expr(s"(hash >> (band * $DHashBandBits)) & 65535"))
    val l = bands.select(col("band"), col("bits"),
      col("asset_id").as("a"), col("hash").as("ha"))
    val r = bands.select(col("band"), col("bits"),
      col("asset_id").as("b"), col("hash").as("hb"))
    l.join(r, Seq("band", "bits"))
      .filter(col("a") < col("b"))
      .select("a", "b", "ha", "hb").distinct()
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** 64-bit perceptual hash of an AUDIO payload — the envelope-delta
    * analogue of [[dHash64]] (dHash compares adjacent spatial cells;
    * this compares adjacent TEMPORAL windows): decode to 16-bit PCM
    * via the JDK (WAV/AIFF/AU — the [[analyzeEnergyOne]] path), fold
    * channels, split the stream into 65 equal windows, and set bit i
    * iff window i+1's mean |sample| exceeds window i's. The comparison
    * is exact integer rational arithmetic (cross-multiplied sums), so
    * the hash is platform-deterministic; envelope STRUCTURE survives
    * lossless re-encode (WAV↔AIFF), small time shifts, and uniform
    * gain — absolute levels don't need to. The WHOLE stream hashes in
    * one O(1)-memory pass (window boundaries come from the header's
    * declared frame count; decode has to read every byte regardless,
    * so the bounded claim is memory, not IO); only a stream that
    * declares NO length falls back to a 2²⁰-frame prefix. None for
    * payloads the JDK cannot decode.
    */
  def audioHash64(content: Array[Byte]): Option[Long] =
    try {
      // total frame count from the HEADER: window boundaries need the
      // length up-front, and the JDK-decodable containers (WAV/AIFF/
      // AU) all carry it. Streams that don't declare it fall back to
      // hashing a bounded prefix (documented below).
      val headerFrames = try {
        javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(content))
          .getFrameLength.toLong
      } catch { case scala.util.control.NonFatal(_) => -1L }
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val src = in.getFormat
        val pcm = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          2 * src.getChannels, src.getSampleRate, false)
        val s = javax.sound.sampled.AudioSystem.getAudioInputStream(pcm, in)
        try {
          val ch = pcm.getChannels
          val bytesPerFrame = 2 * ch
          // the frame budget the window assignment is planned against:
          // the declared header length when available (the WHOLE
          // stream streams through the 65 window sums in one O(1)-
          // memory pass — decode must read every byte anyway, so the
          // bounded claim is memory, not IO), else a 2^20-frame prefix
          // (length-unknown streams only; the prefix bound is then the
          // documented semantics, not a silent truncation)
          val planned =
            if (headerFrames > 0) headerFrames else (1L << 20)
          val sums = new Array[Long](65)
          val cnts = new Array[Long](65)
          val buf = new Array[Byte](bytesPerFrame * 1024)
          var idx = 0L
          var eof = false
          while (!eof && idx < planned) {
            var off = 0
            var n = s.read(buf, off, buf.length - off)
            while (n > 0 && off + n < buf.length) {
              off += n; n = s.read(buf, off, buf.length - off)
            }
            val got = if (n > 0) off + n else off
            val nFrames = got / bytesPerFrame
            var i = 0
            while (i < nFrames && idx < planned) {
              var c = 0; var a = 0L
              while (c < ch) {
                val b = i * bytesPerFrame + 2 * c
                val lo = buf(b) & 0xff
                val hi = buf(b + 1)
                a += math.abs(((hi << 8) | lo).toLong)
                c += 1
              }
              val w = math.min(64L, idx * 65L / planned).toInt
              sums(w) += a / ch
              cnts(w) += 1
              idx += 1
              i += 1
            }
            if (got < buf.length) eof = true
          }
          // fewer than 65 frames (or a truncated payload that never
          // filled the last window) has no 65-window envelope to hash
          if (idx < 65 || cnts(64) == 0) None
          else {
            var bits = 0L
            var w = 0
            while (w < 64) {
              // BigInt cross-multiply: per-window sums of a multi-hour
              // recording can push the long product past 2^63 — 65
              // comparisons, so exactness costs nothing
              if (BigInt(sums(w + 1)) * cnts(w) >
                  BigInt(sums(w)) * cnts(w + 1))
                bits |= 1L << w
              w += 1
            }
            Some(bits)
          }
        } finally s.close()
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The audio-hash stage — map-only, (asset_id, hash) per decodable
    * payload; [[dhashOf]]'s audio twin. Pairs then go through the SAME
    * [[perceptualPairs]] banding (the hash space is identical: 64 bits,
    * 4×16 bands, Hamming verify).
    */
  def audioHashOf(assets: Dataset[MediaAsset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap(a =>
      audioHash64(a.content).map(h => (a.asset_id, h))))
      .toDF("asset_id", "hash")
  }

  /** Modality-dispatched perceptual hash stage: images through
    * [[dHash64]], audio through [[audioHash64]] — one (asset_id, hash)
    * frame because the two hashes share one space (64 bits, the same
    * 4×16 banding). Undecodable or unhashable modalities drop out.
    */
  def mediaHashOf(assets: Dataset[MediaAsset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap { a =>
      (a.modality match {
        case "image" => dHash64(a.content)
        case "audio" => audioHash64(a.content)
        case _ => None
      }).map(h => (a.asset_id, h))
    }).toDF("asset_id", "hash")
  }

  /** Banded layout of a perceptual-hash frame: 4 rows per asset with
    * `bk = band · 2¹⁶ + band-bits` — ONE integer key carrying both the
    * band index and its 16 bits, so the candidate join is a
    * single-column equi-join a bucketed store satisfies exchange-free
    * (the band-index trick, `Dedup.writeBandIndex`, applied to the
    * perceptual space).
    */
  private def bandedPhash(hashes: DataFrame): DataFrame = hashes
    .select(col("asset_id"), col("hash"),
      explode(expr(s"sequence(0, ${DHashBands - 1})")).as("band"))
    .withColumn("bk", expr(
      s"band * 65536 + ((hash >> (band * $DHashBandBits)) & 65535)"))
    .select("asset_id", "hash", "bk")

  /** Write-once PERCEPTUAL-HASH index — the seventh persisted artifact
    * family: one bucketed external table `<name>_phash` (asset_id,
    * hash, bk) bucketed AND sorted on the banded key `bk`, so every
    * ingest batch's near-dup probe joins the accumulated 100 TB media
    * corpus with zero exchange on the stored side. `_BUILD_META` rows
    * at build feed q192's staleness report;
    * [[IndexMaintenance.rebuildFamily]] knows the family.
    */
  def writePhashIndex(
      hashes: DataFrame, name: String, path: String,
      buckets: Int = 32): Unit = {
    val s = hashes.sparkSession
    bandedPhash(hashes).write.mode("overwrite")
      .bucketBy(buckets, "bk").sortBy("bk")
      .option("path", s"$path/phash").saveAsTable(s"${name}_phash")
    IndexMaintenance.writeBuildMeta(s, path,
      s.table(s"${name}_phash").count())
  }

  /** Re-attach a [[writePhashIndex]] artifact in a NEW SparkSession —
    * `Dedup.registerBandIndex`'s contract for the perceptual family.
    */
  def registerPhashIndex(
      spark: SparkSession, name: String, path: String,
      buckets: Int = 32): Unit =
    IndexCatalog.registerBucketed(spark, s"${name}_phash",
      s"$path/phash", "bk", buckets)

  /** Probe a persisted [[writePhashIndex]] index with a batch's hash
    * frame: (a = stored asset, b = batch asset, hamming) for every
    * pair within `maxHamming` — result-identical to running
    * [[perceptualPairs]] over store ∪ batch and keeping the cross
    * pairs (IndexStoreSpec asserts it), but the stored side reads the
    * bucketed `bk` layout exchange-free and only the batch's 4 rows
    * per asset shuffle.
    */
  def probePhashIndex(
      spark: SparkSession, name: String, batchHashes: DataFrame,
      maxHamming: Int = DHashMaxHamming): DataFrame = {
    require(maxHamming < DHashBands,
      s"banding is complete only below the band count: " +
        s"maxHamming=$maxHamming, bands=$DHashBands")
    spark.table(s"${name}_phash")
      .select(col("bk"), col("asset_id").as("a"), col("hash").as("ha"))
      .join(bandedPhash(batchHashes).select(col("bk"),
        col("asset_id").as("b"), col("hash").as("hb")), Seq("bk"))
      .select("a", "b", "ha", "hb").distinct()
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** Append a batch's banded hashes to a persisted [[writePhashIndex]]
    * index (`insertInto` honors the bucket spec — the probe stays
    * exchange-free).
    */
  def appendToPhashIndex(hashes: DataFrame, name: String): Unit =
    bandedPhash(hashes).write.mode("append").insertInto(s"${name}_phash")

  /** [[appendToPhashIndex]] guarded against rows already present — the
    * replay path of the media ingest loop (the
    * `Dedup.appendToBandIndexDedup` contract, including the
    * cross-session refresh).
    */
  def appendToPhashIndexDedup(hashes: DataFrame, name: String): Unit = {
    val s = hashes.sparkSession
    s.catalog.refreshTable(s"${name}_phash")
    val present = s.table(s"${name}_phash")
      .select("asset_id").distinct()
    bandedPhash(hashes).join(present, Seq("asset_id"), "left_anti")
      .write.mode("append").insertInto(s"${name}_phash")
  }

  private val SynthWin = 512   // samples per envelope window
  private val SynthRate = 8000f

  /** Deterministic synthetic WAV/AIFF for the q202 fixture — the audio
    * twin of [[synthImageBytes]]: 65 windows of [[SynthWin]] constant
    * |amplitude| samples whose levels walk a per-(id, window) FNV path
    * with steps of 1..6 (mod 7), so adjacent window means always
    * differ by ≥ 3000 while a 32-sample cyclic shift moves a window
    * mean by ≤ 18000·32/512 = 1125 — sign-preserving by construction,
    * which makes the oracle's expected pair counts engine-exact.
    * Variants: 0 = WAV, 1 = AIFF re-encode of the same samples
    * (different container bytes, identical PCM — the transcode case),
    * 2 = 32-sample cyclic shift WAV, 3 = one window's level bumped one
    * step (Hamming ≤ 2).
    */
  private[graft] def synthWavBytes(id: Long, variant: Int): Array[Byte] = {
    val shift = if (variant == 2) 32 else 0
    val levels = new Array[Int](65)
    def hh(w: Int): Int = {
      val v = Fnv64.hashBytes(Array(
        (id + 1000).toByte, ((id + 1000) >> 8).toByte,
        ((id + 1000) >> 16).toByte, w.toByte, (w >> 4).toByte))
      ((v >>> 19) & 0x7fffffff).toInt
    }
    levels(0) = hh(0) % 7
    var w = 0
    while (w < 64) {
      levels(w + 1) = (levels(w) + 1 + hh(w + 1) % 6) % 7
      w += 1
    }
    if (variant == 3) levels(31) = (levels(31) + 1) % 7
    val nf = 65 * SynthWin
    // the AIFF container is big-endian PCM; lay the bytes out in the
    // target container's own endianness so the writer never converts
    val big = variant == 1
    val bytes = new Array[Byte](2 * nf)
    var i = 0
    while (i < nf) {
      val src = (i + shift) % nf
      val amp = levels(src / SynthWin) * 3000 + 1000
      // alternate sign per sample: zero-mean audio, |amp| constant
      val v = if ((i & 1) == 0) amp else -amp
      val (b0, b1) = if (big) (((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        else ((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      bytes(2 * i) = b0
      bytes(2 * i + 1) = b1
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      SynthRate, 16, 1, 2, SynthRate, big)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, nf.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    val t = if (variant == 1) javax.sound.sampled.AudioFileFormat.Type.AIFF
      else javax.sound.sampled.AudioFileFormat.Type.WAVE
    javax.sound.sampled.AudioSystem.write(ais, t, bos)
    bos.toByteArray
  }

  private val SynthCellW = 32
  private val SynthCellH = 8

  /** Deterministic synthetic image for the q201 fixture (the container
    * ships no media files; the SPARK side — decode, hashing, banding,
    * verify — is fully real). The raster is an 8×9 grid of 32×8-px
    * gray cells whose levels walk a per-(doc,row) FNV-seeded path with
    * adjacent-cell level steps of 1..6 (mod 7): adjacent cell means
    * always differ by ≥ 30 luma units, while a 1-px cyclic shift moves
    * each cell mean by ≤ 180/32 < 6 — so by construction the shift
    * variant's dHash is BIT-IDENTICAL to the base and the oracle's
    * expected pair counts are engine-exact, never empirical. Variants:
    * 0 = base PNG, 1 = BMP re-encode of the same raster (different
    * bytes, same pixels — the crawler re-upload case), 2 = 1-px cyclic
    * shift PNG, 3 = one cell bumped one level (Hamming ≤ 2 — the
    * genuine near-dup regime; a bump touches only the two comparisons
    * adjacent to the cell).
    */
  private[graft] def synthImageBytes(id: Long, variant: Int): Array[Byte] = {
    val shift = if (variant == 2) 1 else 0
    val levels = Array.ofDim[Int](8, 9)
    def hh(cy: Int, c: Int): Int = {
      val v = Fnv64.hashBytes(Array(
        id.toByte, (id >> 8).toByte, (id >> 16).toByte,
        cy.toByte, c.toByte))
      ((v >>> 17) & 0x7fffffff).toInt
    }
    var cy = 0
    while (cy < 8) {
      levels(cy)(0) = hh(cy, 0) % 7
      var c = 0
      while (c < 8) {
        levels(cy)(c + 1) = (levels(cy)(c) + 1 + hh(cy, c + 1) % 6) % 7
        c += 1
      }
      cy += 1
    }
    if (variant == 3) levels(3)(4) = (levels(3)(4) + 1) % 7
    val w = 9 * SynthCellW
    val hgt = 8 * SynthCellH
    val img = new java.awt.image.BufferedImage(
      w, hgt, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < hgt) {
      var x = 0
      while (x < w) {
        val srcX = (x + shift) % w
        val v = levels(y / SynthCellH)(srcX / SynthCellW) * 30 + 20
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, if (variant == 1) "bmp" else "png", bos)
    bos.toByteArray
  }

  // -----------------------------------------------------------------
  // Video frame-hash near-dup (round 15) — the q201 machinery over a
  // FRAME STREAM. Real-world codecs (mp4/H.264 frame extraction) are
  // environmental (absent from this container, the documented
  // quarantine); the Spark-side plumbing is exercised end-to-end over
  // an openly-defined FRAME-STACK container (magic + count + length-
  // prefixed PNG frames) whose parsing and per-frame decode+hash are
  // fully real — when a codec appears, only [[decodeFrameStack]]
  // swaps for the demuxer, exactly as VERDICT r14 carried.
  // -----------------------------------------------------------------

  private val FrameStackMagic = Array[Byte]('G', 'F', 'S', '1')

  /** Encode PNG frame payloads into the frame-stack container:
    * `"GFS1" | int32 n | n × (int32 len | bytes)` (big-endian). The
    * fixture/test encoder for [[decodeFrameStack]].
    */
  private[graft] def frameStackBytes(
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(FrameStackMagic)
    out.writeInt(frames.length)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    out.flush()
    bos.toByteArray
  }

  /** Strict frame-stack parse: the frame payloads in container order,
    * or empty for anything malformed (wrong magic, truncated lengths,
    * short payloads) — an undecodable video has no frames to hash,
    * the [[dHash64]] None contract at container grain.
    */
  private[graft] def decodeFrameStack(
      content: Array[Byte]): Seq[Array[Byte]] =
    try {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(content))
      val magic = new Array[Byte](4)
      in.readFully(magic)
      if (!java.util.Arrays.equals(magic, FrameStackMagic)) Seq.empty
      else {
        val n = in.readInt()
        if (n < 0 || n > (1 << 20)) Seq.empty
        else (0 until n).map { _ =>
          val len = in.readInt()
          if (len < 0 || len > content.length)
            throw new java.io.EOFException()
          val buf = new Array[Byte](len)
          in.readFully(buf)
          buf
        }
      }
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** The video hash stage — map-only, one (asset_id, frame_idx, hash)
    * row per decodable frame of every `video` asset: parse the
    * container, [[dHash64]] each frame (undecodable frames drop,
    * keeping their index gap). [[dhashOf]]'s shape one grain finer.
    */
  def videoFrameHashes(assets: Dataset[MediaAsset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap { a =>
      if (a.modality != "video") Iterator.empty
      else decodeFrameStack(a.content).iterator.zipWithIndex
        .flatMap { case (f, i) =>
          dHash64(f).map(h => (a.asset_id, i.toLong, h)) }
    }).toDF("asset_id", "frame_idx", "hash")
  }

  /** Asset-level video near-dup from a frame-hash frame: for every
    * asset pair (a < b) the count of DISTINCT frames of `a` with at
    * least one frame of `b` within Hamming ≤ `maxHamming` — the
    * containment statistic clip/re-encode/edit detection thresholds
    * on. Candidates come from the ONE shared banding
    * ([[perceptualPairs]], applied to packed per-frame ids), so the
    * join is complete at the ≤ 3 regime and never all-pairs; the
    * asset rollup is a bounded (a, b)-keyed agg over verified frame
    * pairs. `maxFrames` bounds frame_idx for the id packing.
    */
  def videoPairs(
      frameHashes: DataFrame,
      maxHamming: Int = DHashMaxHamming,
      maxFrames: Int = 4096): DataFrame =
    videoFramePairs(frameHashes, maxHamming, maxFrames)
      .select("va", "fa", "vb").distinct()
      .groupBy(col("va").as("a"), col("vb").as("b"))
      .agg(count(lit(1)).as("matched"))

  /** [[videoPairs]] counted on the HIGHER asset's side: (a, b,
    * matched = distinct frames of `b` with a frame of `a` within the
    * radius) — the containment of the asset a lower-id-wins dedup
    * would DROP, measured against its own footage (the same
    * batch-side counting [[probeVideoIndex]] uses; an ingest loop
    * thresholding on the lower side would discard a long novel video
    * because a short clip of it happened to sort first — ADVICE r15).
    */
  def videoPairsHigherSide(
      frameHashes: DataFrame,
      maxHamming: Int = DHashMaxHamming,
      maxFrames: Int = 4096): DataFrame =
    videoFramePairs(frameHashes, maxHamming, maxFrames)
      .select("va", "vb", "fb").distinct()
      .groupBy(col("va").as("a"), col("vb").as("b"))
      .agg(count(lit(1)).as("matched"))

  /** The shared frame-pair core of [[videoPairs]] and
    * [[videoPairsHigherSide]]: verified cross-asset frame pairs
    * (va < vb, fa, fb) from the ONE banding over packed frame ids.
    * Frames at index ≥ `maxFrames` are EXCLUDED (filtered before
    * packing — without the filter a longer video's high frames would
    * silently alias into the NEXT asset id's space); `maxFrames` is
    * the family's declared per-asset frame bound, shared with the
    * persisted index's packing.
    */
  private def videoFramePairs(
      frameHashes: DataFrame,
      maxHamming: Int,
      maxFrames: Int): DataFrame = {
    val packed = frameHashes
      .filter(col("frame_idx") >= 0 && col("frame_idx") < maxFrames)
      .select((col("asset_id") * maxFrames + col("frame_idx"))
        .as("asset_id"), col("hash"))
    perceptualPairs(packed, maxHamming)
      .select(expr(s"a div $maxFrames").as("va"),
        (col("a") % maxFrames).as("fa"),
        expr(s"b div $maxFrames").as("vb"),
        (col("b") % maxFrames).as("fb"))
      .filter(col("va") =!= col("vb"))
  }

  /** Frame-id packing bound shared by [[videoPairs]] and the persisted
    * video index: `fid = asset_id · VideoMaxFrames + frame_idx`.
    */
  val VideoMaxFrames = 4096

  private[graft] def packFids(frameHashes: DataFrame): DataFrame = frameHashes
    // frames beyond the packing bound are EXCLUDED from perceptual
    // identity (they would alias into the NEXT asset's fid space —
    // ADVICE r15); the bound is the family's declared per-asset limit
    .filter(col("frame_idx") >= 0 && col("frame_idx") < VideoMaxFrames)
    .select((col("asset_id") * VideoMaxFrames + col("frame_idx"))
      .as("asset_id"), col("hash"))

  /** Persisted VIDEO frame-hash index — NOT an eighth family: it IS
    * the phash family's layout over PACKED frame ids, so the whole
    * seventh-family machinery (bucketed `bk` store, registrar,
    * `_BUILD_META` staleness row, [[IndexMaintenance.rebuildFamily]],
    * compaction, the ingest-ledger replay discipline) applies to the
    * frame grain unchanged — ONE layout definition for whole-asset
    * and per-frame perceptual identity. Input: (asset_id, frame_idx,
    * hash) from [[videoFrameHashes]].
    */
  def writeVideoIndex(
      frameHashes: DataFrame, name: String, path: String,
      buckets: Int = 32): Unit =
    writePhashIndex(packFids(frameHashes), name, path, buckets)

  /** Re-attach a [[writeVideoIndex]] artifact — the phash registrar. */
  def registerVideoIndex(
      spark: SparkSession, name: String, path: String,
      buckets: Int = 32): Unit =
    registerPhashIndex(spark, name, path, buckets)

  /** Probe a persisted [[writeVideoIndex]] index with a batch's frame
    * hashes: (a = stored asset, b = batch asset, matched = DISTINCT
    * batch frames of `b` with a stored frame of `a` within
    * `maxHamming`) — the containment statistic an ingest admission
    * thresholds on, counted on the BATCH side (how much of the
    * arriving video the store already holds). Result-identical to
    * [[videoPairs]] over store ∪ batch restricted to cross pairs with
    * the batch side counted (IndexStoreSpec asserts it); the stored
    * side reads the bucketed layout exchange-free.
    */
  def probeVideoIndex(
      spark: SparkSession, name: String, frameHashes: DataFrame,
      maxHamming: Int = DHashMaxHamming): DataFrame =
    probePhashIndex(spark, name, packFids(frameHashes), maxHamming)
      .select(expr(s"a div $VideoMaxFrames").as("va"),
        expr(s"b div $VideoMaxFrames").as("vb"),
        (col("b") % VideoMaxFrames).as("fb"))
      .distinct()
      .groupBy(col("va").as("a"), col("vb").as("b"))
      .agg(count(lit(1)).as("matched"))

  /** Append a batch's frame hashes to a persisted [[writeVideoIndex]]
    * index; the Dedup variant is asset-guarded against rows already
    * present (packed fids — a replayed batch's frames drop wholesale).
    */
  def appendToVideoIndex(frameHashes: DataFrame, name: String): Unit =
    appendToPhashIndex(packFids(frameHashes), name)

  def appendToVideoIndexDedup(
      frameHashes: DataFrame, name: String): Unit =
    appendToPhashIndexDedup(packFids(frameHashes), name)

  /** Ordered adjacent frame-hash bigrams of every asset: one row per
    * consecutive (frame_idx, frame_idx + 1) pair — a dropped
    * (undecodable) frame breaks adjacency, so no bigram spans a gap.
    * One per-asset equi-join on (asset_id, frame_idx + 1); at scale
    * both sides shuffle on the same key once.
    */
  private def videoBigrams(frameHashes: DataFrame): DataFrame =
    frameHashes.as("x")
      .join(frameHashes.as("y"),
        col("x.asset_id") === col("y.asset_id") &&
          col("y.frame_idx") === col("x.frame_idx") + 1)
      .select(col("x.asset_id").as("asset_id"),
        col("x.frame_idx").as("pos"),
        col("x.hash").as("h1"), col("y.hash").as("h2"))

  /** TEMPORAL containment between asset pairs (a < b): the count of
    * DISTINCT bigram POSITIONS of `a` whose adjacent frame-hash
    * bigram also appears as an adjacent ordered bigram of `b` — the order-aware statistic
    * that separates a re-encode or clip (order preserved → temporal ≈
    * bag containment) from a re-ordered compilation of the same
    * frames (bag high, temporal ~0), which [[videoPairs]]'s bag count
    * cannot see. Bigram matching is EXACT on the two 64-bit hashes
    * (the hash-invariance classes — re-encode, small shift — hash
    * bit-identical per frame; a per-frame perturbed copy degrades to
    * the bag statistic, the documented limitation). The candidate
    * join is a two-column equi-join on (h1, h2) — skinny keys, never
    * all-pairs.
    */
  def videoTemporalPairs(frameHashes: DataFrame): DataFrame = {
    val bg = videoBigrams(frameHashes)
    bg.select(col("asset_id").as("a"), col("pos").as("pa"),
        col("h1"), col("h2"))
      .join(bg.select(col("asset_id").as("b"), col("h1"), col("h2")),
        Seq("h1", "h2"))
      .filter(col("a") < col("b"))
      .select("a", "pa", "b").distinct()
      .groupBy("a", "b").agg(count(lit(1)).as("temporal_matched"))
  }

  /** Scene segmentation over a frame-hash stream: a CUT falls between
    * consecutive decodable frames whose dHash Hamming distance exceeds
    * `cutHamming` (0 = any visual change cuts); a SCENE is a maximal
    * cut-free run. The shot-boundary statistic keyframe extraction and
    * static-content detection threshold on — one keyframe per scene is
    * the standard frame-sampling reduction. Returns one row per asset
    * with ≥ 1 decodable frame: (asset_id, n_frames, n_scenes, n_cuts,
    * longest_run). The consecutive-frame compare is a lag window
    * PARTITIONED BY asset — per-video frame counts are bounded by the
    * container parse cap ([[decodeFrameStack]], ≤ 2²⁰), so the window
    * partition is bounded by construction, never corpus-sized (q211's
    * declared discipline); the run rollup is a bounded
    * (asset, scene)-keyed agg.
    */
  def videoSceneRuns(frameHashes: DataFrame, cutHamming: Int): DataFrame = {
    val wSeq = Window.partitionBy("asset_id").orderBy("frame_idx")
    val cuts = frameHashes
      .withColumn("prev", lag(col("hash"), 1).over(wSeq))
      .withColumn("cut",
        (col("prev").isNotNull &&
          expr(s"CAST(bit_count(hash ^ prev) AS BIGINT)") > cutHamming)
          .cast("long"))
      .withColumn("scene", sum(col("cut")).over(
        wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cuts.groupBy("asset_id", "scene")
      .agg(count(lit(1)).as("run_len"))
      .groupBy("asset_id")
      .agg(sum("run_len").as("n_frames"),
        count(lit(1)).as("n_scenes"),
        (count(lit(1)) - lit(1L)).as("n_cuts"),
        max("run_len").as("longest_run"))
  }

  /** Hamming distance between the BASE and PERTURB dHashes of
    * [[synthImageBytes]]`(id, 0)` vs `(id, 3)`, derived from the level
    * walk alone — every cell is constant gray, so each cell-mean
    * comparison in [[dHash64]] reduces to the integer LEVEL comparison
    * and the perturb bump (cell (3,4) + 1 mod 7) can only move the two
    * adjacent bits (3,3) and (3,4). No pixel is ever produced; the
    * value is the doc-arithmetic ground truth q206's oracle
    * interpolates as a literal table (the q196 weight-table recipe),
    * and MultiModalSpec pins it against the decoded hashes.
    */
  private[graft] def synthPerturbHamming(id: Long): Int = {
    def hh(cy: Int, c: Int): Int = {
      val v = graft.functions.Fnv64.hashBytes(Array(
        id.toByte, (id >> 8).toByte, (id >> 16).toByte,
        cy.toByte, c.toByte))
      ((v >>> 17) & 0x7fffffff).toInt
    }
    val row = new Array[Int](9)
    row(0) = hh(3, 0) % 7
    var c = 0
    while (c < 8) { row(c + 1) = (row(c) + 1 + hh(3, c + 1) % 6) % 7; c += 1 }
    val bumped = (row(4) + 1) % 7
    ((if ((row(4) > row(3)) != (bumped > row(3))) 1 else 0) +
      (if ((row(5) > row(4)) != (row(5) > bumped)) 1 else 0))
  }

  /** q206's oracle literal: `(doc_id, hamming(base, perturb))` for the
    * fixture ids — built once at init from [[synthPerturbHamming]].
    */
  private lazy val perturbHpValues: String =
    (0L until 40L).map(id => s"($id, ${synthPerturbHamming(id)})")
      .mkString(", ")

  /** q207's oracle literals: per fixture id the TOTAL payload bytes of
    * its four variants and the bytes of the three non-survivors
    * (variants 1-3 — the canonical min-asset_id survivor is the base).
    * The synth encoders are deterministic pure functions of (id,
    * variant), so the sizes are ground truth both engines share.
    */
  private lazy val imgSizeValues: String =
    (0L until 40L).map { id =>
      val sz = (0 to 3).map(v => synthImageBytes(id, v).length.toLong)
      s"($id, ${sz.sum}, ${sz.drop(1).sum})"
    }.mkString(", ")

  private lazy val audSizeValues: String =
    (0L until 30L).map { id =>
      val sz = (0 to 3).map(v => synthWavBytes(id, v).length.toLong)
      s"($id, ${sz.sum}, ${sz.drop(1).sum})"
    }.mkString(", ")

  /** The q57-pattern contract report edge shared by q201/q202/q205:
    * per pair-kind expected count (`perId · |ids|`) vs found, with the
    * ok bit and a stable kind ordering — ONE definition so the three
    * perceptual contracts can never diverge on null handling, types,
    * or ordering.
    */
  private def contractReport(
      s: SparkSession,
      pairKinds: DataFrame,
      kinds: Seq[(String, Long)],
      nIds: DataFrame): DataFrame = {
    val found = pairKinds.groupBy("kind")
      .agg(count(lit(1)).as("n_found"))
    // bounded crossJoin: the |kinds|×1 broadcast-a-scalar pattern
    s.createDataFrame(kinds).toDF("kind", "per_id")
      .crossJoin(nIds)
      .select(col("kind"),
        (col("per_id") * col("n_ids")).as("n_expected"))
      .join(found, Seq("kind"), "left")
      .select(col("kind"), col("n_expected"),
        coalesce(col("n_found"), lit(0L)).as("n_found"),
        (coalesce(col("n_found"), lit(0L)) === col("n_expected"))
          .cast("long").as("ok"))
      .orderBy("kind")
  }

  val defs: Seq[(String, QueryDef)] = Seq(

    // q28: multimodal byte stats. Payload = UTF-8 bytes of documents.text
    // (the container has no media files; byte semantics are identical),
    // modality = deterministic byte-length class, stats per modality.
    "q28_multimodal_stats" -> QueryDef(
      (s, dir) => table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          octet_length(col("text")).cast("long").as("n_bytes"))
        .withColumn("modality",
          when(col("n_bytes") % 3 === 0, "image")
            .when(col("n_bytes") % 3 === 1, "audio")
            .otherwise("video"))
        .groupBy("modality")
        .agg(count(lit(1)).as("n_assets"),
          sum(col("n_bytes")).as("total_bytes"),
          round(sum(col("n_bytes")) * 1.0 / count(lit(1)), 2).as("avg_bytes"),
          min(col("n_bytes")).as("min_bytes"),
          max(col("n_bytes")).as("max_bytes"),
          countDistinct(col("lang")).as("n_langs"))
        .orderBy("modality"),
      Some("""WITH a AS (SELECT doc_id, lang,
                  CAST(strlen(text) AS BIGINT) AS n_bytes,
                  CASE WHEN strlen(text) % 3 = 0 THEN 'image'
                       WHEN strlen(text) % 3 = 1 THEN 'audio'
                       ELSE 'video' END AS modality
                FROM documents)
              SELECT modality, COUNT(*) AS n_assets,
                CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
                ROUND(CAST(SUM(n_bytes) AS DOUBLE) / COUNT(*), 2) AS avg_bytes,
                MIN(n_bytes) AS min_bytes, MAX(n_bytes) AS max_bytes,
                COUNT(DISTINCT lang) AS n_langs
              FROM a GROUP BY modality ORDER BY modality""")),

    // q136: content-digest media dedup — the "same image uploaded N
    // times under different names" scan every 100 TB media store runs
    // before anything decodes: digest the OPAQUE payload bytes (md5 —
    // content-addressed identity, the binary-column analogue of q22's
    // text dedup), count duplicate assets and the bytes a
    // store-once-by-digest layout saves, per modality. Payload = UTF-8
    // bytes of documents.text (q28's stand-in — byte semantics
    // identical, the container has no media files), PLUS a re-upload
    // of every 7th payload — the re-fetched copy a crawler stores
    // under a new name (declared in the fixture so the duplicate
    // branch is live at every SF; the synthetic corpus has no natural
    // byte-identical texts below sf0.1). Plan: ONE
    // partial-agg shuffle on the (modality, digest) key — the digest
    // is computed map-side from the payload, assets of one digest
    // collapse before the shuffle — then a bounded-key modality
    // rollup; no join anywhere. All-integer output except one exact
    // division.
    "q136_media_dedup" -> QueryDef(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val payloads = docs.select(col("text"))
          .unionByName(docs.filter(col("doc_id") % 7 === 0)
            .select(col("text")))
        val a = payloads
          .select(octet_length(col("text")).cast("long").as("n_bytes"),
            md5(col("text").cast("binary")).as("digest"))
          .withColumn("modality",
            when(col("n_bytes") % 3 === 0, "image")
              .when(col("n_bytes") % 3 === 1, "audio")
              .otherwise("video"))
        // same digest ⇒ same payload ⇒ same byte length, so min() is
        // just "the" length of the deduped blob
        val per = a.groupBy("modality", "digest")
          .agg(count(lit(1)).as("n"), min("n_bytes").as("b"))
        per.groupBy("modality")
          .agg(sum("n").as("n_assets"),
            count(lit(1)).as("n_unique"),
            sum(col("n") - 1).as("dup_assets"),
            sum((col("n") - 1) * col("b")).as("bytes_saved"),
            round(sum(col("n") - 1).cast("double") / sum(col("n")), 4)
              .as("dup_rate"))
          .orderBy("modality")
      },
      Some("""WITH p AS (SELECT text FROM documents
                UNION ALL SELECT text FROM documents WHERE doc_id % 7 = 0),
              a AS (SELECT
                  CAST(strlen(text) AS BIGINT) AS n_bytes,
                  md5(text) AS digest,
                  CASE WHEN strlen(text) % 3 = 0 THEN 'image'
                       WHEN strlen(text) % 3 = 1 THEN 'audio'
                       ELSE 'video' END AS modality
                FROM p),
              per AS (SELECT modality, digest, COUNT(*) AS n,
                  MIN(n_bytes) AS b
                FROM a GROUP BY 1, 2)
              SELECT modality, CAST(SUM(n) AS BIGINT) AS n_assets,
                COUNT(*) AS n_unique,
                CAST(SUM(n - 1) AS BIGINT) AS dup_assets,
                CAST(SUM((n - 1) * b) AS BIGINT) AS bytes_saved,
                ROUND(CAST(SUM(n - 1) AS DOUBLE) / SUM(n), 4) AS dup_rate
              FROM per GROUP BY 1 ORDER BY modality""")),

    // q201: perceptual media near-dup — the scan q136's content digest
    // structurally CANNOT run: a re-encoded (PNG→BMP), 1-px-shifted,
    // or slightly-edited image has different bytes but the same
    // picture. Pipeline: JDK image decode → 64-bit dHash
    // ([[dHash64]]) → 4×16 banded candidate join → integer
    // XOR+popcount verify at Hamming ≤ 3 ([[perceptualPairs]] — for
    // that threshold banding ≡ brute force by pigeonhole, so recall
    // is exact, not probabilistic). Fixture: 4 deterministic variants
    // per doc_id < 40 ([[synthImageBytes]] — the level-walk raster
    // GUARANTEES re-encode and shift variants hash bit-identical and
    // the perturb variant lands within Hamming 2, so expected pair
    // counts derive from doc arithmetic alone). Contract output
    // (q57's pattern): per pair-kind expected vs found counts + the
    // ok bit, with a zero row pinning NO false positives across
    // different base images. The oracle cannot decode images — it
    // states the derivable expected counts and the contract bits;
    // MultiModalSpec carries the banding ≡ brute-force identity on
    // noisier fixtures. Plan at 100 TB: decode+hash is map-only; the
    // only shuffle is the 4-band equi-join (the persisted-index q116
    // shape); verify is one integer op per candidate — never
    // all-pairs.
    "q201_perceptual_dedup" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        // spread the one-split id scan so the per-asset synth+decode
        // below fans out (r17; no-op on well-partitioned inputs)
        val ids = Q.spread(table(s, dir, "documents"))
          .select(col("doc_id")).filter(col("doc_id") < 40)
        val assets = ids
          .select(col("doc_id"),
            explode(expr("sequence(0, 3)")).as("variant"))
          .as[(Long, Int)]
          .mapPartitions(_.map { case (id, v) =>
            MediaAsset(id * 10 + v, "image", synthImageBytes(id, v),
              s"variant_$v")
          })
        val pairs = perceptualPairs(dhashOf(assets))
        val kind = {
          val va = expr("a % 10")
          val vb = expr("b % 10")
          when(expr("a div 10") =!= expr("b div 10"), "cross")
            .when(va === 0 && vb === 1, "base_reencode")
            .when(va === 0 && vb === 2, "base_shift")
            .when(va === 0 && vb === 3, "base_perturb")
            .when(va === 1 && vb === 2, "reencode_shift")
            .when(va === 1 && vb === 3, "reencode_perturb")
            .otherwise("shift_perturb")
        }
        contractReport(s, pairs.withColumn("kind", kind), Seq(
          ("base_perturb", 1L), ("base_reencode", 1L),
          ("base_shift", 1L), ("cross", 0L),
          ("reencode_perturb", 1L), ("reencode_shift", 1L),
          ("shift_perturb", 1L)),
          ids.agg(count(lit(1)).as("n_ids")))
      },
      Some("""WITH n AS (SELECT COUNT(*) AS n_ids FROM documents
                         WHERE doc_id < 40)
              SELECT k.kind,
                CAST(k.per_id * n.n_ids AS BIGINT) AS n_expected,
                CAST(k.per_id * n.n_ids AS BIGINT) AS n_found,
                CAST(1 AS BIGINT) AS ok
              FROM (VALUES ('base_perturb', 1), ('base_reencode', 1),
                ('base_shift', 1), ('cross', 0),
                ('reencode_perturb', 1), ('reencode_shift', 1),
                ('shift_perturb', 1)) AS k(kind, per_id), n
              ORDER BY kind""")),

    // q202: perceptual AUDIO near-dup — q201's twin for the second
    // modality, over REAL JDK audio decode: a transcoded (WAV→AIFF),
    // time-shifted, or one-window-edited recording has different bytes
    // but the same sound, invisible to q136's digest. The
    // envelope-delta hash ([[audioHash64]] — 65 temporal windows'
    // mean |sample|, adjacent-window sign bits, exact integer
    // comparisons) feeds the SAME 4×16 banding + XOR/popcount verify
    // ([[perceptualPairs]] — one candidate machinery for every 64-bit
    // perceptual hash space, image or audio). Fixture and contract
    // mirror q201: 4 deterministic variants per doc_id < 30
    // ([[synthWavBytes]] — the level-walk waveform GUARANTEES
    // transcode/shift hash-identity and the perturb within Hamming 2),
    // expected counts derive from doc arithmetic, zero-false-positive
    // cross row pinned. Same 100 TB plan: map-only decode+hash, one
    // 4-band equi-join, integer verify.
    "q202_audio_perceptual_dedup" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        // spread the one-split id scan so the per-asset synth+decode
        // below fans out (r17; no-op on well-partitioned inputs)
        val ids = Q.spread(table(s, dir, "documents"))
          .select(col("doc_id")).filter(col("doc_id") < 30)
        val assets = ids
          .select(col("doc_id"),
            explode(expr("sequence(0, 3)")).as("variant"))
          .as[(Long, Int)]
          .mapPartitions(_.map { case (id, v) =>
            MediaAsset(id * 10 + v, "audio", synthWavBytes(id, v),
              s"variant_$v")
          })
        val pairs = perceptualPairs(audioHashOf(assets))
        val kind = {
          val va = expr("a % 10")
          val vb = expr("b % 10")
          when(expr("a div 10") =!= expr("b div 10"), "cross")
            .when(va === 0 && vb === 1, "base_transcode")
            .when(va === 0 && vb === 2, "base_shift")
            .when(va === 0 && vb === 3, "base_perturb")
            .when(va === 1 && vb === 2, "transcode_shift")
            .when(va === 1 && vb === 3, "transcode_perturb")
            .otherwise("shift_perturb")
        }
        contractReport(s, pairs.withColumn("kind", kind), Seq(
          ("base_perturb", 1L), ("base_shift", 1L),
          ("base_transcode", 1L), ("cross", 0L),
          ("shift_perturb", 1L), ("transcode_perturb", 1L),
          ("transcode_shift", 1L)),
          ids.agg(count(lit(1)).as("n_ids")))
      },
      Some("""WITH n AS (SELECT COUNT(*) AS n_ids FROM documents
                         WHERE doc_id < 30)
              SELECT k.kind,
                CAST(k.per_id * n.n_ids AS BIGINT) AS n_expected,
                CAST(k.per_id * n.n_ids AS BIGINT) AS n_found,
                CAST(1 AS BIGINT) AS ok
              FROM (VALUES ('base_perturb', 1), ('base_shift', 1),
                ('base_transcode', 1), ('cross', 0),
                ('shift_perturb', 1), ('transcode_perturb', 1),
                ('transcode_shift', 1)) AS k(kind, per_id), n
              ORDER BY kind""")),

    // q205: persisted phash-index probe — the perceptual family's
    // q116/q166/q172 rung: every other index family's probe path is
    // oracle-checked, so the seventh is too. The store holds the BASE
    // images of doc_id < 40 ([[writePhashIndex]], built once per
    // corpus fingerprint, the q192 memo discipline); the probe batch
    // carries the three near-dup variants of every base (each
    // guaranteed within Hamming ≤ 2 of its stored base by the
    // level-walk fixture) plus fresh decoys (images of ids 1000+i —
    // no stored twin). Contract output: per batch-variant kind the
    // store-pair count vs expected (40 each), the decoy row pinned at
    // zero, and the zero row for cross-base pairs — all derivable
    // from doc arithmetic, no pixel ever decoded by the oracle.
    // Plan: the candidate join reads the bucketed bk layout
    // exchange-free (IndexStoreSpec plan-asserts the shape); only the
    // batch's 4 rows/asset shuffle.
    "q205_phash_index_probe" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val fp = IndexCatalog.fpTag(
          tableFingerprint(s, dir, "documents"))
        val tag = s"${IndexCatalog.dirTag(dir)}_$fp"
        val name = s"graft_q205_$tag"
        // spread the one-split id scan so the per-asset synth+decode
        // below fans out (r17; no-op on well-partitioned inputs)
        val ids = Q.spread(table(s, dir, "documents"))
          .select(col("doc_id")).filter(col("doc_id") < 40)
        if (!s.catalog.tableExists(s"${name}_phash")) {
          val path = new java.io.File(
            System.getProperty("java.io.tmpdir"), s"graft-q205-$tag")
          val baseHashes = dhashOf(ids.as[Long].mapPartitions(_.map(id =>
            MediaAsset(id, "image", synthImageBytes(id, 0), "base"))))
          writePhashIndex(baseHashes, name, path.toString)
        }
        val batch = ids
          .select(col("doc_id"),
            explode(expr("sequence(1, 3)")).as("variant"))
          .as[(Long, Int)]
          .mapPartitions(_.map { case (id, v) =>
            MediaAsset(id * 10 + v, "image", synthImageBytes(id, v),
              s"variant_$v")
          })
          .union(ids.filter(col("doc_id") < 10).as[Long]
            .mapPartitions(_.map(id => MediaAsset(9000 + id, "image",
              synthImageBytes(1000 + id, 0), "decoy"))))
        val pairs = probePhashIndex(s, name, dhashOf(batch))
        val kind =
          when(expr("b >= 9000"), "decoy")
            .when(expr("a != b div 10"), "cross")
            .when(expr("b % 10 = 1"), "store_reencode")
            .when(expr("b % 10 = 2"), "store_shift")
            .otherwise("store_perturb")
        contractReport(s, pairs.withColumn("kind", kind), Seq(
          ("cross", 0L), ("decoy", 0L), ("store_perturb", 1L),
          ("store_reencode", 1L), ("store_shift", 1L)),
          ids.agg(count(lit(1)).as("n_ids")))
      },
      Some("""WITH n AS (SELECT COUNT(*) AS n_ids FROM documents
                         WHERE doc_id < 40)
              SELECT k.kind,
                CAST(k.per_id * n.n_ids AS BIGINT) AS n_expected,
                CAST(k.per_id * n.n_ids AS BIGINT) AS n_found,
                CAST(1 AS BIGINT) AS ok
              FROM (VALUES ('cross', 0), ('decoy', 0),
                ('store_perturb', 1), ('store_reencode', 1),
                ('store_shift', 1)) AS k(kind, per_id), n
              ORDER BY kind""")),

    // q206: perceptual THRESHOLD SWEEP (VERDICT r14 ask #4 — q142's
    // threshold-sweep pattern for the media family): before a store
    // owner fixes the dedup Hamming radius, they read pairs / assets
    // touched / dup rate at every candidate radius — from ONE banded
    // candidate pass ([[perceptualPairs]] at the pigeonhole-complete
    // radius 3; each smaller radius is an integer filter over the
    // SAME verified pair set, never a re-scan). Expected counts are
    // doc arithmetic: the re-encode/shift variants hash bit-identical
    // to their base (radius-0 trio, 3 pairs/id at every radius), and
    // the perturb variant sits at the per-id hamming the level walk
    // determines ([[synthPerturbHamming]] — interpolated into both
    // plans as a literal table, the q196 weight-table recipe, so the
    // oracle derives every radius cut without decoding a pixel).
    // Plan at 100 TB: one map-only decode+hash, ONE 4-band equi-join
    // + integer verify (PlanAuditSpec pins the single candidate
    // pass), then bounded-key aggs over the pair set.
    "q206_perceptual_threshold_sweep" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        // spread the one-split id scan so the per-asset synth+decode
        // below fans out (r17; no-op on well-partitioned inputs)
        val ids = Q.spread(table(s, dir, "documents"))
          .select(col("doc_id")).filter(col("doc_id") < 40)
        val assets = ids
          .select(col("doc_id"),
            explode(expr("sequence(0, 3)")).as("variant"))
          .as[(Long, Int)]
          .mapPartitions(_.map { case (id, v) =>
            MediaAsset(id * 10 + v, "image", synthImageBytes(id, v),
              s"variant_$v")
          })
        val radii = array((0L to 3L).map(lit): _*)
        // ONE banded pass at the complete radius; radius cuts filter it
        val byR = perceptualPairs(dhashOf(assets))
          .select(explode(radii).as("radius"),
            col("a"), col("b"), col("hamming"))
          .filter(col("hamming") <= col("radius"))
          .managedPersist
        val nP = byR.groupBy("radius")
          .agg(count(lit(1)).as("n_pairs_found"))
        val nA = byR
          .select(col("radius"), explode(array(col("a"), col("b"))).as("x"))
          .groupBy("radius").agg(countDistinct("x").as("n_assets_found"))
        val hp = (0L until 40L)
          .map(id => (id, synthPerturbHamming(id).toLong))
          .toDF("doc_id", "hp")
        val exp = broadcast(hp).join(ids, "doc_id")
          .select(explode(radii).as("radius"), col("hp"))
          .groupBy("radius")
          .agg((lit(3L) * count(lit(1)) + lit(3L) *
            sum((col("hp") <= col("radius")).cast("long")))
            .as("n_pairs_expected"),
            (lit(3L) * count(lit(1)) +
              sum((col("hp") <= col("radius")).cast("long")))
              .as("n_assets_expected"),
            count(lit(1)).as("n_ids"))
        exp.join(nP, Seq("radius"), "left")
          .join(nA, Seq("radius"), "left")
          .select(col("radius"), col("n_pairs_expected"),
            coalesce(col("n_pairs_found"), lit(0L)).as("n_pairs_found"),
            col("n_assets_expected"),
            coalesce(col("n_assets_found"), lit(0L)).as("n_assets_found"),
            expr("coalesce(n_assets_found, 0L) * 1000000" +
              " div (4 * n_ids)").as("dup_rate_micro"),
            (coalesce(col("n_pairs_found"), lit(0L)) ===
              col("n_pairs_expected") &&
              coalesce(col("n_assets_found"), lit(0L)) ===
                col("n_assets_expected")).cast("long").as("ok"))
          .orderBy("radius")
      },
      Some(s"""WITH hp(doc_id, h) AS (VALUES $perturbHpValues),
              j AS (SELECT hp.h FROM hp
                    JOIN documents d ON d.doc_id = hp.doc_id
                    WHERE d.doc_id < 40),
              r(radius) AS (VALUES (0), (1), (2), (3)),
              e AS (SELECT r.radius,
                  CAST(3 * COUNT(*) + 3 * SUM(CASE WHEN j.h <= r.radius
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs_expected,
                  CAST(3 * COUNT(*) + SUM(CASE WHEN j.h <= r.radius
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_assets_expected,
                  CAST(COUNT(*) AS BIGINT) AS n_ids
                FROM r CROSS JOIN j GROUP BY r.radius)
              SELECT CAST(radius AS BIGINT) AS radius,
                n_pairs_expected,
                n_pairs_expected AS n_pairs_found,
                n_assets_expected,
                n_assets_expected AS n_assets_found,
                n_assets_expected * 1000000 // (4 * n_ids)
                  AS dup_rate_micro,
                CAST(1 AS BIGINT) AS ok
              FROM e ORDER BY radius""")),

    // q207: media duplicate-cluster CANONICAL SURVIVORS (VERDICT r14
    // ask #5 — the store-once decision q136 makes for exact bytes,
    // extended to perceptual identity): compose the q201/q202 pair
    // graphs with q45's connected components (ONE definition —
    // [[Dedup.minLabelPropagate]]) and q83's anti-join removal; keep
    // the min-asset_id survivor of every perceptual cluster, report
    // per-modality before/after counts and the payload bytes a
    // store-once-per-cluster layout reclaims. Pair graphs are built
    // PER MODALITY (the two 64-bit hash spaces are disjoint by
    // construction, not by type — a cross-modality band collision
    // must never edge the graph), asset id ranges disjoint by
    // construction. The oracle derives everything from doc arithmetic
    // plus the deterministic synth payload sizes interpolated as
    // literal tables. Plan at 100 TB: banded pair joins (never
    // all-pairs), CC rounds on the skinny label frame, and removal is
    // the broadcast-able anti-join of the non-canonical vertex list.
    "q207_media_cluster_survivors" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        def variants(maxId: Int) = docs
          .filter(col("doc_id") < maxId).select(col("doc_id"),
            explode(expr("sequence(0, 3)")).as("variant"))
          .as[(Long, Int)]
        val img = variants(40).mapPartitions(_.map { case (id, v) =>
          MediaAsset(id * 10 + v, "image", synthImageBytes(id, v),
            s"variant_$v")
        })
        val aud = variants(30).mapPartitions(_.map { case (id, v) =>
          MediaAsset(100000 + id * 10 + v, "audio", synthWavBytes(id, v),
            s"variant_$v")
        })
        val meta = img.union(aud)
          .map(a => (a.asset_id, a.modality, a.content.length.toLong))
          .toDF("asset_id", "modality", "n_bytes").managedPersist
        val pairs = perceptualPairs(dhashOf(img))
          .unionByName(perceptualPairs(audioHashOf(aud)))
          .select(col("a").as("da"), col("b").as("db"))
        val labels = Dedup.minLabelPropagate(pairs)
        val removed = labels.filter(col("v") =!= col("lbl"))
          .select(col("v").as("asset_id"))
        val surv = meta.join(removed, Seq("asset_id"), "left_anti")
        val clusters = meta
          .join(labels.select(col("v").as("asset_id"), col("lbl")),
            Seq("asset_id"), "left")
          // an asset in no pair is its own (singleton) cluster
          .select(col("modality"),
            coalesce(col("lbl"), col("asset_id")).as("lbl"))
          .groupBy("modality").agg(countDistinct("lbl").as("n_clusters"))
        meta.groupBy("modality")
          .agg(count(lit(1)).as("n_assets"),
            sum("n_bytes").as("bytes_before"))
          .join(surv.groupBy("modality")
            .agg(count(lit(1)).as("n_survivors"),
              sum("n_bytes").as("bytes_surv")), "modality")
          .join(clusters, "modality")
          .select(col("modality"), col("n_assets"), col("n_clusters"),
            col("n_survivors"),
            (col("n_assets") - col("n_survivors")).as("n_removed"),
            col("bytes_before"),
            (col("bytes_before") - col("bytes_surv"))
              .as("bytes_reclaimed"),
            expr("(bytes_before - bytes_surv) * 1000000" +
              " div bytes_before").as("reclaim_rate_micro"))
          .orderBy("modality")
      },
      Some(s"""WITH isz(doc_id, tot, rem) AS (VALUES $imgSizeValues),
              asz(doc_id, tot, rem) AS (VALUES $audSizeValues),
              img AS (SELECT COUNT(*) AS n, SUM(tot) AS t, SUM(rem) AS r
                FROM isz JOIN documents d ON d.doc_id = isz.doc_id
                WHERE d.doc_id < 40),
              aud AS (SELECT COUNT(*) AS n, SUM(tot) AS t, SUM(rem) AS r
                FROM asz JOIN documents d ON d.doc_id = asz.doc_id
                WHERE d.doc_id < 30)
              SELECT * FROM (
                SELECT 'audio' AS modality,
                  CAST(4 * n AS BIGINT) AS n_assets,
                  CAST(n AS BIGINT) AS n_clusters,
                  CAST(n AS BIGINT) AS n_survivors,
                  CAST(3 * n AS BIGINT) AS n_removed,
                  CAST(t AS BIGINT) AS bytes_before,
                  CAST(r AS BIGINT) AS bytes_reclaimed,
                  CAST(r AS BIGINT) * 1000000 // CAST(t AS BIGINT)
                    AS reclaim_rate_micro
                FROM aud
                UNION ALL
                SELECT 'image', CAST(4 * n AS BIGINT), CAST(n AS BIGINT),
                  CAST(n AS BIGINT), CAST(3 * n AS BIGINT),
                  CAST(t AS BIGINT), CAST(r AS BIGINT),
                  CAST(r AS BIGINT) * 1000000 // CAST(t AS BIGINT)
                FROM img
              ) ORDER BY modality""")),

    // q209: VIDEO frame-hash near-dup (round 15 — the third modality
    // through the ONE perceptual machinery): a re-encoded, clipped, or
    // partially-edited video has different bytes but mostly the same
    // frames — invisible to q136's digest and outside q201's
    // whole-image hash. Pipeline: frame-stack parse ([[decodeFrameStack]]
    // — the real-codec demux stands behind the documented environmental
    // quarantine; this container's parsing and per-frame PNG decode are
    // fully real) → per-frame dHash ([[videoFrameHashes]], map-only) →
    // the SHARED 4×16 banding over packed frame ids → asset-level
    // containment rollup ([[videoPairs]]: distinct matched frames of
    // the smaller asset). Fixture: 4 variants per doc_id < 24 — base
    // (6 frames), per-frame 1-px shift re-encode (frame hashes
    // bit-identical by the level-walk guarantee), head clip (frames
    // 1-5), and a 2-frame edit — so every kind's pair and matched-frame
    // counts derive from doc arithmetic (MultiModalSpec pins the
    // fixture's no-cross-collision premise and the brute-force
    // identity). Plan at 100 TB: parse+hash map-only; the only shuffle
    // is the banded frame join (frames of one asset are ~10²,
    // candidates track true duplication); the rollup is a bounded
    // (a, b)-keyed agg.
    "q209_video_frame_dedup" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        // spread the one-split id scan so the per-asset synth+decode
        // below fans out (r17; no-op on well-partitioned inputs)
        val ids = Q.spread(table(s, dir, "documents"))
          .select(col("doc_id")).filter(col("doc_id") < 24)
        val assets = ids
          .select(col("doc_id"),
            explode(expr("sequence(0, 3)")).as("variant"))
          .as[(Long, Int)]
          .mapPartitions(_.map { case (id, v) =>
            def img(f: Long, variant: Int = 0): Array[Byte] =
              synthImageBytes(2000L + id * 8 + f, variant)
            val frames: Seq[Array[Byte]] = v match {
              case 0 => (0L to 5L).map(img(_))
              case 1 => (0L to 5L).map(img(_, 2))
              case 2 => (1L to 5L).map(img(_))
              case _ => (0L to 5L).map(f =>
                if (f == 2L || f == 3L) img(f + 4) else img(f))
            }
            MediaAsset(id * 10 + v, "video", frameStackBytes(frames),
              s"variant_$v")
          })
        val pairs = videoPairs(videoFrameHashes(assets))
        val kind = {
          val va = expr("a % 10")
          val vb = expr("b % 10")
          when(expr("a div 10") =!= expr("b div 10"), "cross")
            .when(va === 0 && vb === 1, "reencode")
            .when(va === 0 && vb === 2, "clip_base")
            .when(va === 1 && vb === 2, "clip_reencode")
            .when(va === 0 && vb === 3, "edit_base")
            .when(va === 1 && vb === 3, "edit_reencode")
            .otherwise("clip_edit")
        }
        val found = pairs.withColumn("kind", kind).groupBy("kind")
          .agg(count(lit(1)).as("n_pairs_found"),
            sum("matched").as("matched_found"))
        val kinds = Seq(
          ("clip_base", 1L, 5L), ("clip_edit", 1L, 3L),
          ("clip_reencode", 1L, 5L), ("cross", 0L, 0L),
          ("edit_base", 1L, 4L), ("edit_reencode", 1L, 4L),
          ("reencode", 1L, 6L))
        s.createDataFrame(kinds)
          .toDF("kind", "pairs_per_id", "matched_per_id")
          .crossJoin(broadcast(ids.agg(count(lit(1)).as("n_ids"))))
          .select(col("kind"),
            (col("pairs_per_id") * col("n_ids")).as("n_pairs_expected"),
            (col("matched_per_id") * col("n_ids")).as("matched_expected"))
          .join(found, Seq("kind"), "left")
          .select(col("kind"), col("n_pairs_expected"),
            coalesce(col("n_pairs_found"), lit(0L)).as("n_pairs_found"),
            col("matched_expected"),
            coalesce(col("matched_found"), lit(0L)).as("matched_found"),
            (coalesce(col("n_pairs_found"), lit(0L)) ===
              col("n_pairs_expected") &&
              coalesce(col("matched_found"), lit(0L)) ===
                col("matched_expected")).cast("long").as("ok"))
          .orderBy("kind")
      },
      Some("""WITH n AS (SELECT COUNT(*) AS n_ids FROM documents
                         WHERE doc_id < 24)
              SELECT k.kind,
                CAST(k.pairs * n.n_ids AS BIGINT) AS n_pairs_expected,
                CAST(k.pairs * n.n_ids AS BIGINT) AS n_pairs_found,
                CAST(k.m * n.n_ids AS BIGINT) AS matched_expected,
                CAST(k.m * n.n_ids AS BIGINT) AS matched_found,
                CAST(1 AS BIGINT) AS ok
              FROM (VALUES ('clip_base', 1, 5), ('clip_edit', 1, 3),
                ('clip_reencode', 1, 5), ('cross', 0, 0),
                ('edit_base', 1, 4), ('edit_reencode', 1, 4),
                ('reencode', 1, 6)) AS k(kind, pairs, m), n
              ORDER BY kind""")),

    // q210: persisted VIDEO-index probe — q205's rung at the frame
    // grain: the store holds the BASE videos' frame hashes
    // ([[writeVideoIndex]] — the phash family's layout over packed
    // frame ids, built once per corpus fingerprint), the batch carries
    // each base's re-encode/clip/edit variants plus fresh decoy
    // videos, and [[probeVideoIndex]] reports batch-side containment
    // (distinct batch frames the store already holds) — the number an
    // ingest admission thresholds on. Every kind's pair and matched
    // count is doc arithmetic (same fixture family as q209; decoys
    // draw from ids 24-29 of the same spec-pinned no-collision image
    // population). Plan: the candidate join reads the bucketed bk
    // store exchange-free; only the batch's banded frame rows shuffle.
    "q210_video_index_probe" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val fp = IndexCatalog.fpTag(
          tableFingerprint(s, dir, "documents"))
        val tag = s"${IndexCatalog.dirTag(dir)}_$fp"
        val name = s"graft_q210_$tag"
        // spread the one-split id scan so the per-asset synth+decode
        // below fans out (r17; no-op on well-partitioned inputs)
        val ids = Q.spread(table(s, dir, "documents"))
          .select(col("doc_id")).filter(col("doc_id") < 24)
        def img(id: Long, f: Long, variant: Int = 0): Array[Byte] =
          synthImageBytes(2000L + id * 8 + f, variant)
        if (!s.catalog.tableExists(s"${name}_phash")) {
          val path = new java.io.File(
            System.getProperty("java.io.tmpdir"), s"graft-q210-$tag")
          val baseAssets = ids.as[Long].mapPartitions(_.map(id =>
            MediaAsset(id, "video",
              frameStackBytes((0L to 5L).map(img(id, _))), "base")))
          writeVideoIndex(videoFrameHashes(baseAssets), name,
            path.toString)
        }
        val batch = ids
          .select(col("doc_id"),
            explode(expr("sequence(1, 3)")).as("variant"))
          .as[(Long, Int)]
          .mapPartitions(_.map { case (id, v) =>
            val frames: Seq[Array[Byte]] = v match {
              case 1 => (0L to 5L).map(img(id, _, 2))
              case 2 => (1L to 5L).map(img(id, _))
              case _ => (0L to 5L).map(f =>
                if (f == 2L || f == 3L) img(id, f + 4) else img(id, f))
            }
            MediaAsset(id * 10 + v, "video", frameStackBytes(frames),
              s"variant_$v")
          })
          .union(ids.filter(col("doc_id") < 6).as[Long]
            .mapPartitions(_.map(d => MediaAsset(9000 + d, "video",
              frameStackBytes((0L to 5L).map(img(24 + d, _))), "decoy"))))
        val pairs = probeVideoIndex(s, name, videoFrameHashes(batch))
        val kind =
          when(expr("b >= 9000"), "decoy")
            .when(expr("a != b div 10"), "cross")
            .when(expr("b % 10 = 1"), "store_reencode")
            .when(expr("b % 10 = 2"), "store_clip")
            .otherwise("store_edit")
        val found = pairs.withColumn("kind", kind).groupBy("kind")
          .agg(count(lit(1)).as("n_pairs_found"),
            sum("matched").as("matched_found"))
        val kinds = Seq(
          ("cross", 0L, 0L), ("decoy", 0L, 0L), ("store_clip", 1L, 5L),
          ("store_edit", 1L, 4L), ("store_reencode", 1L, 6L))
        s.createDataFrame(kinds)
          .toDF("kind", "pairs_per_id", "matched_per_id")
          .crossJoin(broadcast(ids.agg(count(lit(1)).as("n_ids"))))
          .select(col("kind"),
            (col("pairs_per_id") * col("n_ids")).as("n_pairs_expected"),
            (col("matched_per_id") * col("n_ids")).as("matched_expected"))
          .join(found, Seq("kind"), "left")
          .select(col("kind"), col("n_pairs_expected"),
            coalesce(col("n_pairs_found"), lit(0L)).as("n_pairs_found"),
            col("matched_expected"),
            coalesce(col("matched_found"), lit(0L)).as("matched_found"),
            (coalesce(col("n_pairs_found"), lit(0L)) ===
              col("n_pairs_expected") &&
              coalesce(col("matched_found"), lit(0L)) ===
                col("matched_expected")).cast("long").as("ok"))
          .orderBy("kind")
      },
      Some("""WITH n AS (SELECT COUNT(*) AS n_ids FROM documents
                         WHERE doc_id < 24)
              SELECT k.kind,
                CAST(k.pairs * n.n_ids AS BIGINT) AS n_pairs_expected,
                CAST(k.pairs * n.n_ids AS BIGINT) AS n_pairs_found,
                CAST(k.m * n.n_ids AS BIGINT) AS matched_expected,
                CAST(k.m * n.n_ids AS BIGINT) AS matched_found,
                CAST(1 AS BIGINT) AS ok
              FROM (VALUES ('cross', 0, 0), ('decoy', 0, 0),
                ('store_clip', 1, 5), ('store_edit', 1, 4),
                ('store_reencode', 1, 6)) AS k(kind, pairs, m), n
              ORDER BY kind""")),

    // q211: ORDER-AWARE video containment — the statistic q209's bag
    // count cannot see: a re-ordered compilation of stored footage has
    // bag containment ≈ 1 but shares almost no ADJACENT frame bigrams,
    // while a re-encode or clip preserves order (temporal ≈ bag). One
    // fixture (base / reversed / head-clip / per-frame-shift re-encode
    // per doc_id < 24), both statistics from the SAME frame-hash
    // frame: [[videoPairs]]'s banded bag count and
    // [[videoTemporalPairs]]'s exact bigram join — every expected
    // (pairs, bag, temporal) triple is doc arithmetic (reversal
    // zeroes bigrams, a clip loses exactly its cut boundary's bigram,
    // re-encode preserves all five). Plan: the bigram build is one
    // per-asset equi-join; the cross-asset candidate joins are the
    // banded bk join (bag) and a skinny (h1, h2) equi-join (temporal);
    // rollups are bounded (a, b)-keyed partial aggs.
    "q211_video_temporal_containment" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        // spread the one-split id scan so the per-asset synth+decode
        // below fans out (r17; no-op on well-partitioned inputs)
        val ids = Q.spread(table(s, dir, "documents"))
          .select(col("doc_id")).filter(col("doc_id") < 24)
        val assets = ids
          .select(col("doc_id"),
            explode(expr("sequence(0, 3)")).as("variant"))
          .as[(Long, Int)]
          .mapPartitions(_.map { case (id, v) =>
            def img(f: Long, variant: Int = 0): Array[Byte] =
              synthImageBytes(2000L + id * 8 + f, variant)
            val frames: Seq[Array[Byte]] = v match {
              case 0 => (0L to 5L).map(img(_))
              case 1 => (0L to 5L).reverse.map(img(_))
              case 2 => (1L to 5L).map(img(_))
              case _ => (0L to 5L).map(img(_, 2))
            }
            MediaAsset(id * 10 + v, "video", frameStackBytes(frames),
              s"variant_$v")
          })
        val fh = videoFrameHashes(assets).managedPersist
        val pairs = videoPairs(fh)
          .join(videoTemporalPairs(fh), Seq("a", "b"), "left")
          .select(col("a"), col("b"), col("matched").as("bag"),
            coalesce(col("temporal_matched"), lit(0L)).as("temporal"))
        val kind = {
          val va = expr("a % 10")
          val vb = expr("b % 10")
          when(expr("a div 10") =!= expr("b div 10"), "cross")
            .when(va === 0 && vb === 1, "reorder")
            .when(va === 0 && vb === 2, "clip")
            .when(va === 0 && vb === 3, "reencode")
            .when(va === 1 && vb === 2, "reorder_clip")
            .when(va === 1 && vb === 3, "reorder_reencode")
            .otherwise("clip_reencode")
        }
        val found = pairs.withColumn("kind", kind).groupBy("kind")
          .agg(count(lit(1)).as("n_pairs_found"),
            sum("bag").as("bag_found"),
            sum("temporal").as("temporal_found"))
        val kinds = Seq(
          ("clip", 1L, 5L, 4L), ("clip_reencode", 1L, 5L, 4L),
          ("cross", 0L, 0L, 0L), ("reencode", 1L, 6L, 5L),
          ("reorder", 1L, 6L, 0L), ("reorder_clip", 1L, 5L, 0L),
          ("reorder_reencode", 1L, 6L, 0L))
        s.createDataFrame(kinds)
          .toDF("kind", "pairs_per_id", "bag_per_id", "temporal_per_id")
          .crossJoin(broadcast(ids.agg(count(lit(1)).as("n_ids"))))
          .select(col("kind"),
            (col("pairs_per_id") * col("n_ids")).as("n_pairs_expected"),
            (col("bag_per_id") * col("n_ids")).as("bag_expected"),
            (col("temporal_per_id") * col("n_ids"))
              .as("temporal_expected"))
          .join(found, Seq("kind"), "left")
          .select(col("kind"), col("n_pairs_expected"),
            coalesce(col("n_pairs_found"), lit(0L)).as("n_pairs_found"),
            col("bag_expected"),
            coalesce(col("bag_found"), lit(0L)).as("bag_found"),
            col("temporal_expected"),
            coalesce(col("temporal_found"), lit(0L))
              .as("temporal_found"),
            (coalesce(col("n_pairs_found"), lit(0L)) ===
              col("n_pairs_expected") &&
              coalesce(col("bag_found"), lit(0L)) ===
                col("bag_expected") &&
              coalesce(col("temporal_found"), lit(0L)) ===
                col("temporal_expected")).cast("long").as("ok"))
          .orderBy("kind")
      },
      Some("""WITH n AS (SELECT COUNT(*) AS n_ids FROM documents
                         WHERE doc_id < 24)
              SELECT k.kind,
                CAST(k.pairs * n.n_ids AS BIGINT) AS n_pairs_expected,
                CAST(k.pairs * n.n_ids AS BIGINT) AS n_pairs_found,
                CAST(k.bag * n.n_ids AS BIGINT) AS bag_expected,
                CAST(k.bag * n.n_ids AS BIGINT) AS bag_found,
                CAST(k.temporal * n.n_ids AS BIGINT) AS temporal_expected,
                CAST(k.temporal * n.n_ids AS BIGINT) AS temporal_found,
                CAST(1 AS BIGINT) AS ok
              FROM (VALUES ('clip', 1, 5, 4), ('clip_reencode', 1, 5, 4),
                ('cross', 0, 0, 0), ('reencode', 1, 6, 5),
                ('reorder', 1, 6, 0), ('reorder_clip', 1, 5, 0),
                ('reorder_reencode', 1, 6, 0))
                AS k(kind, pairs, bag, temporal), n
              ORDER BY kind""")),

    // q214: video SCENE-CUT detection / keyframe reduction
    // ([[videoSceneRuns]]) — the intra-video statistic next to
    // q209-q211's inter-video family: a cut between consecutive frames
    // whose dHash Hamming exceeds the threshold, scenes = cut-free
    // runs, one keyframe per scene. Fixture: doc_id < 32, one 12-frame
    // video each with s = 1 + id%4 scenes of equal length 12/s; scene
    // j's frames alternate the scene anchor image and its 1-px-shift
    // re-encode (hash-identical by the level-walk guarantee, exactly
    // q209's variant-1 premise) so intra-scene Hamming is EXACTLY 0,
    // and adjacent scene anchors are distinct images (premise pinned
    // by MultiModalSpec against decoded hashes — the q209
    // no-cross-collision discipline). Expected counts are pure id
    // arithmetic, so the oracle derives every row without decoding a
    // pixel. Plan at 100 TB: parse+hash map-only; the lag window is
    // per-video bounded (≤ 2²⁰ frames by the container cap); run
    // rollup is a bounded-key agg — no joins at all.
    "q214_video_scene_runs" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        // spread the one-split id scan so the per-asset synth+decode
        // below fans out (r17; no-op on well-partitioned inputs)
        val ids = Q.spread(table(s, dir, "documents"))
          .select(col("doc_id")).filter(col("doc_id") < 32)
        val assets = ids.as[Long].mapPartitions(_.map { id =>
          val sc = 1 + (id % 4).toInt
          val frames = (0 until 12).map { f =>
            val j = f * sc / 12
            synthImageBytes(3000L + id * 4 + j, if (f % 2 == 0) 0 else 2)
          }
          MediaAsset(id, "video", frameStackBytes(frames),
            "scene_fixture")
        })
        val runs = videoSceneRuns(videoFrameHashes(assets), 0)
        ids.select(col("doc_id").as("asset_id"))
          .withColumn("s", lit(1L) + col("asset_id") % 4)
          .join(runs, Seq("asset_id"), "left")
          .select(col("asset_id"),
            coalesce(col("n_frames"), lit(0L)).as("n_frames"),
            coalesce(col("n_scenes"), lit(0L)).as("n_scenes"),
            coalesce(col("n_cuts"), lit(-1L)).as("n_cuts"),
            coalesce(col("longest_run"), lit(0L)).as("longest_run"),
            (coalesce(col("n_frames"), lit(0L)) === 12L &&
              coalesce(col("n_scenes"), lit(0L)) === col("s") &&
              coalesce(col("n_cuts"), lit(-1L)) === col("s") - 1L &&
              coalesce(col("longest_run"), lit(0L)) ===
                expr("12 div s")).cast("long").as("ok"))
          .orderBy("asset_id")
      },
      Some("""SELECT doc_id AS asset_id,
                CAST(12 AS BIGINT) AS n_frames,
                CAST(1 + doc_id % 4 AS BIGINT) AS n_scenes,
                CAST(doc_id % 4 AS BIGINT) AS n_cuts,
                CAST(12 // (1 + doc_id % 4) AS BIGINT) AS longest_run,
                CAST(1 AS BIGINT) AS ok
              FROM documents WHERE doc_id < 32 ORDER BY doc_id"""))
  )
}
