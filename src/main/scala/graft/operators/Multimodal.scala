package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Opaque binary payload + typed metadata — row type of the multimodal
  * pipeline. `payload` stands in for image/audio/video bytes. */
case class MediaRow(
    doc_id: Long,
    format: String,
    width: Int,
    height: Int,
    payload: Array[Byte])

/** Decoded/feature-extracted output row. */
case class MediaFeatures(
    doc_id: Long,
    format: String,
    width: Int,
    height: Int,
    payload_len: Int,
    features: Array[Float],
    feat_norm: Double)

/** Multimodal-column pipeline: binary payloads with typed metadata,
  * decoded and feature-extracted partition-wise.
  *
  * The Spark-side plumbing is real and scale-correct: payloads travel as
  * parquet `binary` columns (never strings), metadata is a typed struct
  * that predicate-pushdown can prune on (e.g. `format = 'jpeg' AND
  * width >= 64` never decodes a single byte), and extraction runs via
  * `Dataset.mapPartitions` — the JVM analog of a batched `mapInPandas`
  * decode, amortizing per-batch model/codec setup across a partition and
  * keeping memory bounded by one partition's batch, not the table.
  *
  * ==DECODE PATH==
  * Image payloads (png/jpeg/bmp/gif, detected by magic bytes) decode FOR
  * REAL through `javax.imageio` — pure JVM, no native codec needed —
  * into an 8-dim feature vector (channel means, luma, contrast, dims);
  * MultimodalSpec drives this with generated PNG bytes. WAV/PCM audio
  * payloads (RIFF/WAVE sniff) also decode FOR REAL through
  * `javax.sound.sampled` — amplitude stats, zero-crossing rate,
  * duration, rate/channels — driven in MultimodalSpec with generated
  * sine-wave WAVs. Payloads with no JVM codec (video, compressed audio,
  * and this round's synthetic UTF-8 stand-ins) fall back to
  * [[Multimodal.decodeStub]], a deterministic byte-histogram fake
  * prominently declared as such (an explicit SURVEY §6 non-goal). On a
  * real cluster, that stub is the one spot to swap — the schema,
  * batching, and partitioning do not change.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** STUB: deterministic fake decoder for payloads without a JVM codec.
    * Real pipelines put the codec / feature model here (one instantiation
    * per partition, reused across rows — that is what mapPartitions buys
    * over per-row map). */
  private[graft] def decodeStub(payload: Array[Byte]): Array[Float] = {
    val feats = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      feats(i % 8) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    val n = math.max(1, payload.length / 8)
    feats.map(_ / n)
  }

  /** Cheap container sniff (magic bytes) — decides whether the payload is
    * worth handing to ImageIO at all, so non-image rows never pay a
    * reader lookup. */
  private[operators] def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') || // png
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) || // jpeg
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||                         // gif
      (p(0) == 'B' && p(1) == 'M'))                                          // bmp

  /** REAL pure-JVM image decode via javax.imageio: mean R/G/B, mean luma,
    * luma contrast (max-min), and pixel dimensions as an 8-dim feature
    * vector. Returns None when ImageIO has no reader for the bytes OR the
    * decode throws — real corpora contain truncated/corrupt files, and a
    * text payload that merely starts with "BM" passes the magic sniff but
    * makes the BMP reader throw mid-header; a bad row must fall back to
    * the stub, never kill the task. */
  private[operators] def decodeImage(payload: Array[Byte]): Option[Array[Float]] =
    try decodeImageUnsafe(payload)
    catch { case scala.util.control.NonFatal(_) => None }

  /** Decompression-bomb bound: a malicious container can declare huge
    * pixel dimensions in a tiny payload; a full decode then allocates
    * width×height×4 bytes and OOMs the executor (killing the task — the
    * one failure the NonFatal catch above cannot absorb). Dimensions are
    * read from the header FIRST (ImageReader.getWidth/getHeight decode no
    * pixel data) and anything over this cap falls back to the stub. */
  private[operators] val MaxDecodePixels: Long = 64L * 1024 * 1024 // 64 MP ≈ 256 MB ARGB

  private def decodeImageUnsafe(payload: Array[Byte]): Option[Array[Float]] =
    readImageBounded(payload).flatMap(featuresOf)

  /** Bounded full decode shared by feature extraction and dHash: header
    * dimensions first (no pixel data), bomb cap, then the real read. */
  private def readImageBounded(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    if (iis == null) return None
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        val dw = reader.getWidth(0); val dh = reader.getHeight(0)
        if (dw.toLong * dh > MaxDecodePixels || dw <= 0 || dh <= 0) None
        else Option(reader.read(0))
      } finally reader.dispose()
    } finally iis.close()
  }

  private def featuresOf(img: java.awt.image.BufferedImage): Option[Array[Float]] = {
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      var r = 0L; var g = 0L; var b = 0L
      var minL = 255.0; var maxL = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val px = img.getRGB(x, y)
          val pr = (px >> 16) & 0xFF; val pg = (px >> 8) & 0xFF; val pb = px & 0xFF
          r += pr; g += pg; b += pb
          val l = 0.299 * pr + 0.587 * pg + 0.114 * pb
          if (l < minL) minL = l
          if (l > maxL) maxL = l
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      val mr = r / n / 255.0; val mg = g / n / 255.0; val mb = b / n / 255.0
      Some(Array(mr.toFloat, mg.toFloat, mb.toFloat,
        (0.299 * mr + 0.587 * mg + 0.114 * mb).toFloat,
        ((maxL - minL) / 255.0).toFloat, w.toFloat, h.toFloat, (n / 1e6).toFloat))
    }
  }

  /** Container sniff for RIFF/WAVE audio (the one audio format the bare
    * JDK can decode). */
  private[operators] def looksLikeWav(p: Array[Byte]): Boolean =
    p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** Decode-bomb bound for audio (MaxDecodePixels' twin): a WAV header
    * can declare an absurd frame count; cap what we process. */
  private[operators] val MaxDecodeSamples: Long = 16L * 1024 * 1024

  /** REAL pure-JVM WAV/PCM decode via javax.sound.sampled: channel-0
    * amplitude stats (mean |x|, RMS, peak — samples normalized to
    * [-1,1]), zero-crossing rate, duration, sample rate, channel count
    * and frame count as the same 8-dim feature shape the image path
    * emits. PCM 8/16-bit signed/unsigned, any endianness; anything else
    * (compressed codecs, corrupt headers) returns None and the row
    * falls back to the stub — a bad payload must never kill the task. */
  /** Validated raw PCM payload: decoded frame bytes + the format facts
    * needed to read channel-0 samples by index — the shared core of the
    * stat path (decodeWav, which STREAMS over samples with O(1) extra
    * memory) and the spectral path (wavSamples, which materializes a
    * BOUNDED prefix). PCM 8/16-bit signed/unsigned, any endianness;
    * anything else (compressed codecs, corrupt headers) → None — a bad
    * payload must never kill the task. */
  private case class PcmData(bytes: Array[Byte], frameSize: Int, bits: Int,
      unsigned: Boolean, big: Boolean, sr: Double, ch: Int) {
    def nFrames: Int = bytes.length / frameSize
    /** Channel-0 sample i, normalized to [-1,1]. */
    def sample(i: Int): Double = {
      val off = i * frameSize // channel 0 leads each frame
      if (bits == 8) {
        if (unsigned) ((bytes(off) & 0xFF) - 128) / 128.0
        else bytes(off) / 128.0
      } else {
        val b0 = bytes(off) & 0xFF; val b1 = bytes(off + 1) & 0xFF
        val raw = if (big) (b0 << 8) | b1 else (b1 << 8) | b0
        if (unsigned) (raw - 32768) / 32768.0
        else ((raw << 16) >> 16) / 32768.0
      }
    }
  }

  /** The JDK audio codec PROVIDERS, resolved once per JVM. Every
    * `AudioSystem.getAudioInputStream` / `AudioSystem.write` call walks
    * the provider registry through `JDK13Services.getProviders`, which
    * is `static synchronized` — 32 decode tasks × one call per row
    * serialize on that one monitor, and the measured wall got WORSE
    * with scan parallelism (m04: 8.9 s single-task → 16.9 s on 32
    * tasks). Materializing the providers once and invoking the SAME
    * codec classes directly keeps the real encode→decode round trip
    * (the seam these operators model) with zero shared state on the
    * per-row path. */
  private lazy val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = List.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    // ATTEMPT ORDER matters twice over: the registry's order is Aiff,
    // Au, SoftMidi, Wave…, so every WAV payload pays three rejection
    // parses first — and the MIDI reader's rejection path goes through
    // the synchronized MidiSystem registry, which is the lock that made
    // decode run SLOWER on 32 threads than on one (measured 0.6×
    // speedup; WAV-reader-first decodes 14× faster serial and scales
    // linearly). WAV providers first, MIDI last; first-match semantics
    // only differ for payloads two providers both claim, which none do.
    b.result().sortBy { r =>
      val n = r.getClass.getName
      if (n.contains("Wave")) 0 else if (n.contains("Midi")) 2 else 1
    }
  }

  private lazy val audioWriters: List[javax.sound.sampled.spi.AudioFileWriter] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    val b = List.newBuilder[javax.sound.sampled.spi.AudioFileWriter]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Registry-free `AudioSystem.getAudioInputStream`: first provider
    * that recognizes the payload (the same first-match contract the
    * registry applies). */
  private def openAudioStream(payload: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val readers = audioReaders
    var rs = readers
    while (rs.nonEmpty) {
      try return rs.head.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
      rs = rs.tail
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no registered provider recognizes the payload")
  }

  private def pcmData(payload: Array[Byte]): Option[PcmData] =
    try {
      val ais = openAudioStream(payload)
      try {
        val fmt = ais.getFormat
        import javax.sound.sampled.AudioFormat.Encoding.{PCM_SIGNED, PCM_UNSIGNED}
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val ch = fmt.getChannels
        if ((enc != PCM_SIGNED && enc != PCM_UNSIGNED) ||
            (bits != 8 && bits != 16) || ch < 1 ||
            ais.getFrameLength > MaxDecodeSamples) None
        else {
          val bytes = ais.readAllBytes()
          if (bytes.length < fmt.getFrameSize) None
          else Some(PcmData(bytes, fmt.getFrameSize, bits,
            enc == PCM_UNSIGNED, fmt.isBigEndian, fmt.getSampleRate.toDouble, ch))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Channel-0 samples for the spectral path — materializes at most
    * `maxFrames` (the analysis frame), never the whole payload. */
  private[graft] def wavSamples(payload: Array[Byte],
      maxFrames: Int): Option[(Array[Double], Double, Int)] =
    pcmData(payload).map { p =>
      val n = math.min(p.nFrames, maxFrames)
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = p.sample(i); i += 1 }
      (out, p.sr, p.ch)
    }

  private[graft] def decodeWav(payload: Array[Byte]): Option[Array[Float]] =
    pcmData(payload).map { p =>
      val nFrames = p.nFrames
      var sumAbs = 0.0; var sumSq = 0.0; var peak = 0.0
      var zc = 0L; var prev = 0.0
      var i = 0
      while (i < nFrames) {
        val v = p.sample(i)
        sumAbs += math.abs(v); sumSq += v * v
        if (math.abs(v) > peak) peak = math.abs(v)
        if (i > 0 && (v > 0) != (prev > 0)) zc += 1
        prev = v
        i += 1
      }
      Array(
        (sumAbs / nFrames).toFloat,
        math.sqrt(sumSq / nFrames).toFloat,
        peak.toFloat,
        (zc.toDouble / math.max(1L, nFrames - 1L)).toFloat,
        (nFrames / p.sr).toFloat,
        (p.sr / 48000.0).toFloat,
        p.ch.toFloat,
        (nFrames / 1e6).toFloat)
    }

  /** Spectral features over ONE bounded analysis frame (first ≤1024
    * samples, zero-padded to FrameLen): (peak-bin Hz, magnitude-weighted
    * centroid Hz) via an in-place radix-2 Cooley-Tukey FFT — O(n log n),
    * ~10 k butterflies per payload regardless of duration (the first cut
    * was a naive O(n²/2) DFT: 0.5 M trig ops per payload made m04 the
    * slowest query on the whole bench at 61 s / 5000 rows; the FFT runs
    * the same analysis ~50× faster). DC (k=0) excluded. */
  private[graft] val FrameLen = 1024

  /** In-place iterative radix-2 FFT (Cooley & Tukey 1965); n must be a
    * power of two. */
  private def fftInPlace(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    var j = 0
    var i = 0
    while (i < n - 1) {
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      var m = n >> 1
      while (m >= 1 && j >= m) { j -= m; m >>= 1 }
      j += m
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cwr = 1.0; var cwi = 0.0
        var k = 0
        val half = len >> 1
        while (k < half) {
          val ur = re(base + k); val ui = im(base + k)
          val xr = re(base + k + half); val xi = im(base + k + half)
          val vr = xr * cwr - xi * cwi
          val vi = xr * cwi + xi * cwr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + half) = ur - vr; im(base + k + half) = ui - vi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr; cwr = nwr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  private[graft] def spectralFeatures(
      samples: Array[Double], sr: Double): (Double, Double) = {
    val n = FrameLen // power of two; shorter payloads zero-pad
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    val copy = math.min(samples.length, n)
    System.arraycopy(samples, 0, re, 0, copy)
    fftInPlace(re, im)
    val bins = n / 2
    var peakBin = 0; var peakMag = 0.0; var sumMag = 0.0; var sumFM = 0.0
    var k = 1
    while (k < bins) {
      val mag = math.sqrt(re(k) * re(k) + im(k) * im(k))
      sumMag += mag; sumFM += mag * k
      if (mag > peakMag) { peakMag = mag; peakBin = k }
      k += 1
    }
    val hzPerBin = sr / n
    (peakBin * hzPerBin,
      if (sumMag == 0.0) 0.0 else sumFM / sumMag * hzPerBin)
  }

  /** Deterministic 16-bit mono PCM sine through the JDK's own WAV
    * writer — the m04 payload generator and the spec's test fixture. */
  private[graft] def sineWav(
      freq: Double, amp: Double, sr: Float, nFrames: Int): Array[Byte] =
    gatedSineWav(freq, amp, sr, nFrames, nFrames, _ => true)

  /** [[sineWav]] with a per-block on/off gate (block = `blockLen`
    * frames; gated-off blocks are digital zero) — the m06 fixture:
    * bursts separated by true silence, phase continuous across gaps. */
  private[graft] def gatedSineWav(freq: Double, amp: Double, sr: Float,
      nFrames: Int, blockLen: Int, gate: Int => Boolean): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sr, 16, 1, true, false)
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val v = if (gate(i / blockLen))
        (amp * math.sin(2 * math.Pi * freq * i / sr) * 32767).toInt
      else 0
      data(2 * i) = (v & 0xFF).toByte
      data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    // Registry-free AudioSystem.write — same provider classes, no
    // synchronized registry walk per row (see audioWriters).
    val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
    audioWriters.find(_.isFileTypeSupported(wave, ais))
      .getOrElse(throw new IllegalStateException("no WAVE writer provider"))
      .write(ais, wave, bos)
    bos.toByteArray
  }

  /** Frame-energy silence segmentation over a decoded sample stream —
    * the VAD-shaped kernel behind m06: RMS per `frameLen`-sample frame
    * (full frames only), a frame is silent below `thr`, a segment is a
    * maximal silent run. One O(n) pass, O(1) extra memory (the
    * decodeWav discipline). Returns (n_frames, n_silent, n_segments). */
  private[graft] def silenceStats(
      samples: Array[Double], frameLen: Int, thr: Double): (Long, Long, Long) = {
    val n = samples.length / frameLen
    var silent = 0L; var segs = 0L; var prevSilent = false
    var f = 0
    while (f < n) {
      var sumSq = 0.0
      var i = f * frameLen
      val end = i + frameLen
      while (i < end) { sumSq += samples(i) * samples(i); i += 1 }
      val isS = math.sqrt(sumSq / frameLen) < thr
      if (isS) { silent += 1; if (!prevSilent) segs += 1 }
      prevSilent = isS
      f += 1
    }
    (n.toLong, silent, segs)
  }

  /** The decode dispatcher the pipeline runs: real ImageIO decode for
    * image containers, real javax.sound.sampled decode for WAV/PCM
    * audio, declared stub otherwise (video and non-PCM audio — no JVM
    * codec; SURVEY §6 non-goal). */
  private[operators] def decode(payload: Array[Byte]): Array[Float] =
    if (looksLikeImage(payload)) decodeImage(payload).getOrElse(decodeStub(payload))
    else if (looksLikeWav(payload)) decodeWav(payload).getOrElse(decodeStub(payload))
    else decodeStub(payload)

  // ---- patch grid (ViT-style patchify) ---------------------------------

  /** g×g per-patch mean luma in [0, 1] over a decoded image — the
    * patchify step a vision-transformer ingest runs before embedding
    * (each patch would feed a linear projection; here the mean stands in
    * for the projection so the PLUMBING — proportional tiling, bounded
    * decode, batch shape — is real and testable). Patch (r, c) covers
    * the half-open pixel box [⌊rh/g⌋, ⌊(r+1)h/g⌋) × [⌊cw/g⌋, ⌊(c+1)w/g⌋)
    * — exact cover, no gaps/overlap whatever the dimensions; a
    * degenerate empty box (image smaller than the grid) yields 0. */
  private[graft] def patchGridOf(
      img: java.awt.image.BufferedImage, g: Int): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Float](g * g)
    var pr = 0
    while (pr < g) {
      val y0 = (pr.toLong * h / g).toInt; val y1 = ((pr + 1).toLong * h / g).toInt
      var pc = 0
      while (pc < g) {
        val x0 = (pc.toLong * w / g).toInt; val x1 = ((pc + 1).toLong * w / g).toInt
        var s = 0.0; var cnt = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = img.getRGB(x, y)
            s += 0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) +
              0.114 * (p & 0xFF)
            cnt += 1; x += 1
          }
          y += 1
        }
        out(pr * g + pc) = if (cnt == 0) 0f else (s / cnt / 255.0).toFloat
        pc += 1
      }
      pr += 1
    }
    out
  }

  /** Deterministic patch stub for non-decodable payloads: the byte
    * stream proportionally tiled into g² slices, per-slice mean byte
    * value in [0, 1] — same shape contract as the real path, so the
    * pipeline plumbing is exercised end-to-end on any input. */
  private[graft] def patchStub(payload: Array[Byte], g: Int): Array[Float] = {
    val n = g * g; val len = payload.length
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val s0 = (i.toLong * len / n).toInt; val s1 = ((i + 1).toLong * len / n).toInt
      var s = 0L; var j = s0
      while (j < s1) { s += payload(j) & 0xFF; j += 1 }
      out(i) = if (s1 == s0) 0f else (s.toDouble / (s1 - s0) / 255.0).toFloat
      i += 1
    }
    out
  }

  /** Patchify dispatcher: real bounded decode for image containers
    * (bomb cap shared with every other decode path), byte stub
    * otherwise. */
  private[graft] def patchify(payload: Array[Byte], g: Int): Array[Float] =
    if (looksLikeImage(payload))
      (try readImageBounded(payload)
       catch { case scala.util.control.NonFatal(_) => None })
        .map(patchGridOf(_, g)).getOrElse(patchStub(payload, g))
    else patchStub(payload, g)

  // ---- perceptual hash (dHash) ----------------------------------------

  /** 64-bit difference hash over a decoded image: luma means on a 9×8
    * proportional block grid; bit (r,c) = mean(r,c) > mean(r,c+1). The
    * standard perceptual near-dup signature — stable under re-encode,
    * resize, and brightness shifts (only RELATIVE horizontal gradients
    * matter), which is exactly what byte-level dedup (d01) cannot see. */
  private[operators] def dHashOf(img: java.awt.image.BufferedImage): Long = {
    val gw = 9; val gh = 8
    val w = img.getWidth; val h = img.getHeight
    val means = Array.ofDim[Double](gh, gw)
    var r = 0
    while (r < gh) {
      var c = 0
      while (c < gw) {
        val x0 = c * w / gw; val x1 = math.min(math.max(x0 + 1, (c + 1) * w / gw), w)
        val y0 = r * h / gh; val y1 = math.min(math.max(y0 + 1, (r + 1) * h / gh), h)
        var s = 0.0; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val px = img.getRGB(x, y)
            s += 0.299 * ((px >> 16) & 0xFF) + 0.587 * ((px >> 8) & 0xFF) + 0.114 * (px & 0xFF)
            n += 1; x += 1
          }
          y += 1
        }
        means(r)(c) = if (n == 0) 0.0 else s / n
        c += 1
      }
      r += 1
    }
    var bits = 0L; var i = 0; r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (means(r)(c) > means(r)(c + 1)) bits |= 1L << i
        i += 1; c += 1
      }
      r += 1
    }
    bits
  }

  /** STUB hash for payloads without a JVM codec (same contract as
    * [[decodeStub]]): a deterministic chained byte hash standing in for
    * the real media fingerprint. */
  private[graft] def stubHash(payload: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      h = org.apache.spark.sql.graft.TextHash.mix(h * 0x100000001B3L ^ (payload(i) & 0xFFL))
      i += 1
    }
    h
  }

  /** Perceptual hash dispatcher: real dHash for decodable images, the
    * declared stub hash otherwise (bomb-capped like the feature path). */
  private[graft] def phash(payload: Array[Byte]): Long =
    if (looksLikeImage(payload))
      (try readImageBounded(payload).map(dHashOf)
       catch { case scala.util.control.NonFatal(_) => None }).getOrElse(stubHash(payload))
    else stubHash(payload)

  /** Pairs within `maxHamming` over (doc_id, phash) — d03's pigeonhole
    * band join via the SHARED Lsh.hammingPairs. Media-specific twist:
    * degenerate images (blank thumbnails, solid placeholders, tracking
    * pixels — all dHash 0 or near it) would pile one band bucket into
    * m²/2 output pairs, so a bucket-population cap routes those through
    * the exact-equality grouping path instead of pairwise emission. */
  def phashPairs(sig: DataFrame, maxHamming: Int = 3,
      bucketCap: Long = 1024L): DataFrame =
    Lsh.hammingPairs(sig.withColumnRenamed("phash", "sig"),
      bandBits = 16, nBands = 4, maxHamming = maxHamming,
      bucketCap = Some(bucketCap))

  /** The decode seam: a (metadata-filtered) MediaRow dataset →
    * MediaFeatures, partition-wise. Shared by m01 and MultimodalSpec's
    * real-PNG test so the tested path IS the production path. */
  def extractFeatures(ds: org.apache.spark.sql.Dataset[MediaRow]):
      org.apache.spark.sql.Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // Per-partition setup would happen here (model weights, audio codec).
      rows.map { m =>
        val feats = decode(m.payload)
        MediaFeatures(m.doc_id, m.format, m.width, m.height,
          m.payload.length, feats,
          math.sqrt(feats.map(f => f.toDouble * f).sum))
      }
    }
  }

  /** Ingest repack: rows from Spark's `binaryFile` source
    * (Io.readBinaryFiles — path, modificationTime, length, content) into
    * the MediaRow contract every m-op consumes. doc_id is the stable
    * xxhash64 of the file path (re-ingesting the same tree reproduces the
    * same ids); format is the lowercased file extension; dims are 0 at
    * ingest — the decode stage discovers the real ones (featuresOf emits
    * them), after which the corpus lives as parquet binary columns and
    * the raw files are never touched again. Pure column expressions: the
    * payload is never deserialized on the ingest path. */
  def fromBinaryFiles(files: DataFrame): org.apache.spark.sql.Dataset[MediaRow] = {
    import files.sparkSession.implicits._
    files.select(
      xxhash64(col("path")).as("doc_id"),
      lower(element_at(split(col("path"), "\\."), -1)).as("format"),
      lit(0).as("width"), lit(0).as("height"),
      col("content").as("payload")).as[MediaRow]
  }

  /** documents → MediaRow dataset: payload = UTF-8 bytes standing in for
    * media bytes; format/width/height are deterministic typed metadata. */
  private def mediaTable(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"),
        element_at(array(lit("jpeg"), lit("png"), lit("wav")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        (col("n_chars") % 640 + 32).cast("int").as("width"),
        (col("n_chars") % 480 + 24).cast("int").as("height"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // ---- m01: metadata-pruned decode + feature extraction -------------
    // Filter on typed metadata FIRST (pushdown prunes before any decode),
    // then mapPartitions-extract features, then a small rollup proving the
    // decoded output is a first-class DataFrame again. Oracle-checked via
    // the export pattern: the per-doc decoded features travel as an
    // export, while the oracle independently re-derives the metadata
    // FILTER (format/width are doc_id/n_chars arithmetic) and every
    // payload length (octet_length of the UTF-8 payload) from the raw
    // documents table — the join on (doc_id, format, payload_len)
    // cross-checks the pruning predicate and the byte plumbing; only the
    // decode kernel's norm value rides the export (spec-owned).
    ("m01_multimodal_meta",
      (s, d) => {
        import s.implicits._
        // Filter with COLUMN expressions, not a typed lambda: a lambda
        // filter is opaque to Catalyst (it would deserialize every row,
        // payload included); column predicates stay in the optimizer and
        // push down/prune before any payload is materialized.
        val decoded = extractFeatures(mediaTable(s, d)
          .filter(col("format") =!= "wav" && col("width") >= 64))
        val perDoc = decoded.toDF()
          .select(col("doc_id"), col("format"), col("payload_len"),
            floor(col("feat_norm") * 1000000 + 0.5).cast("long").as("nm"))
        OracleExport.writeOnce(perDoc, OracleExport.MediaFeatPath,
          OracleExport.docKeyFor(Tables.documents(s, d), d))
        perDoc
          .groupBy(col("format"))
          .agg(count(lit(1)).as("n_media"),
               sum(col("payload_len")).cast("long").as("total_bytes"),
               floor(sum(col("nm")) / count(lit(1)).cast("double") + 0.5)
                 .cast("long").as("avg_norm_micros"))
      },
      Some(s"""WITH exp AS MATERIALIZED (
                 SELECT doc_id, format, payload_len, nm
                 FROM ${OracleExport.readSql(OracleExport.MediaFeatPath)}
                 WHERE corpus_key = ${OracleExport.docKeySql}),
               meta AS (
                 SELECT doc_id,
                        CASE CAST(doc_id % 3 AS INTEGER)
                          WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'wav'
                        END AS format,
                        CAST(n_chars % 640 + 32 AS INTEGER) AS width,
                        octet_length(encode(text)) AS len
                 FROM documents),
               sel AS (
                 SELECT doc_id, format, len FROM meta
                 WHERE format <> 'wav' AND width >= 64),
               -- counts/bytes from the oracle's OWN arithmetic row set
               -- (catches engine over- AND under-filtering); only the
               -- norm average needs the exported kernel values.
               agg AS (
                 SELECT format, count(*) AS n_media, sum(len) AS total_bytes
                 FROM sel GROUP BY format),
               av AS (
                 SELECT s.format,
                        FLOOR(SUM(e.nm) / CAST(count(*) AS DOUBLE) + 0.5) AS avg_norm_micros
                 FROM sel s JOIN exp e
                   ON s.doc_id = e.doc_id AND s.format = e.format
                      AND s.len = e.payload_len
                 GROUP BY s.format)
               SELECT a.format, CAST(a.n_media AS BIGINT) AS n_media,
                      CAST(a.total_bytes AS BIGINT) AS total_bytes,
                      CAST(av.avg_norm_micros AS BIGINT) AS avg_norm_micros
               FROM agg a JOIN av ON a.format = av.format""")),

    // ---- m02: frame sampling ------------------------------------------
    // The video-shaped access pattern: explode each payload into fixed-
    // size blocks ("frames"), keep every 4th, compute a per-frame feature.
    // flatMap fans out rows *within* a partition — no shuffle; output
    // parallelism equals input parallelism, and frame rows carry only the
    // sampled bytes (a real decoder would emit decoded tensors here).
    // Oracle-checked via the export pattern, with a twist that makes the
    // check genuinely independent: block SELECTION is pure integer
    // arithmetic on the payload length, which DuckDB re-derives from the
    // raw documents table itself (octet_length of the UTF-8 payload) —
    // the oracle joins its own arithmetic frame set against the exported
    // per-frame table on (doc_id, frame_idx, frame_len), so an engine
    // bug in frame fan-out (extra/missing/mis-sized frames) breaks the
    // join and fails the row compare. Only the per-frame brightness
    // VALUE rides the export (byte-content kernel, spec-owned).
    ("m02_frame_sample",
      (s, d) => {
        import s.implicits._
        val block = 64; val stride = 4
        val frames = mediaTable(s, d)
          .flatMap { m =>
            val nBlocks = (m.payload.length + block - 1) / block
            (0 until nBlocks by stride).map { b =>
              val bytes = m.payload.slice(b * block,
                math.min((b + 1) * block, m.payload.length))
              val brightness =
                bytes.foldLeft(0.0)((a, x) => a + (x & 0xFF)) /
                  math.max(1, bytes.length) / 255.0
              (m.doc_id, b / stride, bytes.length,
                math.floor(brightness * 1000000 + 0.5).toLong)
            }
          }
          .toDF("doc_id", "frame_idx", "frame_len", "bm")
        OracleExport.writeOnce(frames, OracleExport.FramePath,
          OracleExport.docKeyFor(Tables.documents(s, d), d))
        // Exact-integer aggregation on both sides: sum of per-frame
        // brightness-micros longs, divided once — no float accumulation
        // order to diverge on.
        frames.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_frames"),
               sum(col("frame_len")).cast("long").as("sampled_bytes"),
               floor(sum(col("bm")) / count(lit(1)).cast("double") + 0.5)
                 .cast("long").as("avg_brightness_micros"))
      },
      Some(s"""WITH exp AS MATERIALIZED (
                 SELECT doc_id, frame_idx, frame_len, bm
                 FROM ${OracleExport.readSql(OracleExport.FramePath)}
                 WHERE corpus_key = ${OracleExport.docKeySql}),
               lens AS (
                 SELECT doc_id, octet_length(encode(text)) AS len,
                        CAST(CEIL(octet_length(encode(text)) / 64.0) AS BIGINT) AS nb
                 FROM documents),
               arith AS (
                 SELECT doc_id, len,
                        unnest(generate_series(0, nb - 1, 4)) AS b
                 FROM lens WHERE len > 0),
               frames AS (
                 SELECT doc_id, b // 4 AS frame_idx,
                        LEAST(64, len - b * 64) AS frame_len
                 FROM arith),
               -- frame COUNT and byte totals from the oracle's own
               -- integer arithmetic alone (catches both extra and
               -- missing engine frames); only the brightness value
               -- needs the exported kernel rows.
               agg AS (
                 SELECT doc_id, count(*) AS n_frames,
                        sum(frame_len) AS sampled_bytes
                 FROM frames GROUP BY doc_id),
               av AS (
                 SELECT f.doc_id,
                        FLOOR(SUM(e.bm) / CAST(count(*) AS DOUBLE) + 0.5) AS abm
                 FROM frames f JOIN exp e
                   ON f.doc_id = e.doc_id AND f.frame_idx = e.frame_idx
                      AND f.frame_len = e.frame_len
                 GROUP BY f.doc_id)
               SELECT a.doc_id, CAST(a.n_frames AS BIGINT) AS n_frames,
                      CAST(a.sampled_bytes AS BIGINT) AS sampled_bytes,
                      CAST(av.abm AS BIGINT) AS avg_brightness_micros
               FROM agg a JOIN av ON a.doc_id = av.doc_id""")),

    // ---- m03: perceptual-hash image near-dup ---------------------------
    // Media dedup a training pipeline actually needs: byte-identical
    // copies are d01's job, but RE-ENCODED / resized / brightness-shifted
    // images need a perceptual signature. One mapPartitions decode pass
    // emits (doc_id, dHash64); near-dups fall out of the SAME pigeonhole
    // band join as text SimHash (d03) — the decode is the only
    // modality-specific stage. Oracle-checked via the d03
    // signature-export pattern: the computed 64-bit hashes are exported
    // under the corpus fingerprint and DuckDB re-derives the ENTIRE
    // dedup answer — band slicing, bucket-population cap, pair join,
    // Hamming filter, per-pair dedup — independently. Only the hash
    // kernel itself stays spec-owned (real-PNG perceptual behavior in
    // MultimodalSpec).
    ("m03_phash_dedup",
      (s, d) => {
        import s.implicits._
        // Same planted re-crawl fixture as d01: every 10th payload is
        // re-ingested under a new id (a re-encoded image hashes near, an
        // identical payload hashes equal — hamming 0 here since the
        // synthetic stand-ins are byte-identical). Real-image perceptual
        // behavior (re-encode / resize / brightness) is pinned in
        // MultimodalSpec with generated PNGs.
        val media = mediaTable(s, d)
        val recrawl = media.filter(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000).as[MediaRow]
        val sig = media.union(recrawl)
          .mapPartitions(rows => rows.map(m => (m.doc_id, phash(m.payload))))
          .toDF("doc_id", "phash")
        OracleExport.writeOnce(sig, OracleExport.PhashPath,
          OracleExport.docKeyFor(Tables.documents(s, d), d))
        phashPairs(sig, maxHamming = 3)
      },
      // DuckDB replays phashPairs' exact capped-band semantics from the
      // exported signatures: 4×16-bit band slices, buckets holding more
      // than 1024 members excluded from pair generation, popcount ≤ 3,
      // DISTINCT pairs (the capped path's dedup rule).
      Some(s"""WITH sigs AS MATERIALIZED (
                 SELECT doc_id, phash
                 FROM ${OracleExport.readSql(OracleExport.PhashPath)}
                 WHERE corpus_key = ${OracleExport.docKeySql}),
               banded AS (
                 SELECT s.doc_id, s.phash, b.band,
                        (s.phash >> (b.band * 16)) & 65535 AS bv
                 FROM sigs s CROSS JOIN (VALUES (0), (1), (2), (3)) AS b(band)),
               ok AS (
                 SELECT * FROM banded
                 QUALIFY count(*) OVER (PARTITION BY band, bv) <= 1024)
               SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                      CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
               FROM ok a JOIN ok b
                 ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
               WHERE bit_count(xor(a.phash, b.phash)) <= 3""")),

    // ---- m04: audio spectral features over the REAL codec path ---------
    // The audio analog of m01's image features: per-payload sine WAVs
    // (freq keyed off doc_id — deterministic), decoded through the SAME
    // javax.sound.sampled path real audio takes, then a radix-2 FFT
    // over one bounded frame → (peak Hz, spectral centroid). The
    // generate→encode→decode→analyze round trip exercises the actual
    // codec, not a fixture. One mapPartitions pass, per-row cost
    // O(FrameLen·log FrameLen) regardless of duration (the naive-DFT
    // first cut was FrameLen²/2 — 61 s on the full bench, caught and
    // replaced); output collapses to the 8-class rollup. Oracle-checked
    // via the export pattern: per-doc spectral values (millihz longs,
    // rounded once at the kernel boundary) ride the export; the oracle
    // re-derives the class assignment (doc_id % 8) and the rollup from
    // the raw documents table independently, so a mis-classed doc or a
    // wrong aggregate breaks the compare. The FFT kernel itself stays
    // spec-owned (bin accuracy pinned in MultimodalSpec against the
    // known sine frequencies).
    ("m04_audio_spectral",
      (s, d) => {
        import s.implicits._
        val perDoc = Tables.documents(s, d)
          .select(col("doc_id"), (col("doc_id") % 8).cast("int").as("freq_class"))
          .as[(Long, Int)]
          .mapPartitions(_.map { case (id, cls) =>
            val freq = 500.0 + cls * 400.0 // 500..3300 Hz, sr 8000 (Nyquist 4000)
            val wav = sineWav(freq, 0.8, 8000f, FrameLen)
            val (peakHz, centroidHz) = wavSamples(wav, FrameLen) match {
              case Some((samples, sr, _)) => spectralFeatures(samples, sr)
              case None => (-1.0, -1.0)
            }
            (id, cls, math.floor(peakHz * 1000 + 0.5).toLong,
              math.floor(centroidHz * 1000 + 0.5).toLong)
          })
          .toDF("doc_id", "freq_class", "pm", "cm")
        OracleExport.writeOnce(perDoc.select(col("doc_id"), col("pm"), col("cm")),
          OracleExport.SpectralPath,
          OracleExport.docKeyFor(Tables.documents(s, d), d))
        perDoc
          .groupBy(col("freq_class"))
          .agg(count(lit(1)).as("n"),
            floor(sum(col("pm")) / count(lit(1)).cast("double") + 0.5)
              .cast("long").as("avg_peak_millihz"),
            floor(sum(col("cm")) / count(lit(1)).cast("double") + 0.5)
              .cast("long").as("avg_centroid_millihz"))
      },
      Some(s"""WITH exp AS MATERIALIZED (
                 SELECT doc_id, pm, cm
                 FROM ${OracleExport.readSql(OracleExport.SpectralPath)}
                 WHERE corpus_key = ${OracleExport.docKeySql}),
               cls AS (
                 SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS freq_class
                 FROM documents),
               -- class population from the arithmetic side alone
               -- (catches dropped docs); averages from the join.
               agg AS (
                 SELECT freq_class, count(*) AS n FROM cls GROUP BY freq_class),
               av AS (
                 SELECT c.freq_class,
                        FLOOR(SUM(e.pm) / CAST(count(*) AS DOUBLE) + 0.5) AS apm,
                        FLOOR(SUM(e.cm) / CAST(count(*) AS DOUBLE) + 0.5) AS acm
                 FROM cls c JOIN exp e ON c.doc_id = e.doc_id
                 GROUP BY c.freq_class)
               SELECT a.freq_class, CAST(a.n AS BIGINT) AS n,
                      CAST(av.apm AS BIGINT) AS avg_peak_millihz,
                      CAST(av.acm AS BIGINT) AS avg_centroid_millihz
               FROM agg a JOIN av ON a.freq_class = av.freq_class""")),

    // ---- m05: patch-grid extraction (ViT patchify plumbing) -------------
    // The vision-pretraining ingest step: tile every image into a g×g
    // patch grid and emit per-patch statistics — the batch a patch
    // embedder consumes. Decode + tiling run in ONE typed map pass
    // (no shuffle; output parallelism = scan parallelism, the m02
    // contract), and only the g²-float patch vector leaves the decode —
    // never pixels. The rollup proves the patch batch is a first-class
    // frame again: per-format patch-contrast profile (max−min patch
    // luma) and mean luma. Real proportional tiling pinned on generated
    // PNGs in MultimodalSpec (two-tone halves → exact patch means).
    // Oracle-checked via the export pattern: per-doc patch stats ride
    // the export; the oracle re-derives the format mapping + wav filter
    // from doc_id arithmetic (population counts from its own side, so
    // dropped/extra docs are caught) and replays the rollup in exact
    // integer arithmetic. The tiling kernel stays spec-owned.
    ("m05_patch_grid",
      (s, d) => {
        import s.implicits._
        val g = 4
        val perDoc = mediaTable(s, d)
          .filter(col("format") =!= "wav")
          .map { m =>
            val p = patchify(m.payload, g)
            var mn = 1f; var mx = 0f; var sum = 0.0
            var i = 0
            while (i < p.length) {
              if (p(i) < mn) mn = p(i)
              if (p(i) > mx) mx = p(i)
              sum += p(i); i += 1
            }
            (m.doc_id, m.format, p.length.toLong,
              ((mx - mn).toDouble * 1000000).round, (sum / p.length * 1000000).round)
          }
          .toDF("doc_id", "format", "n_patches", "contrast_micros", "mean_micros")
        OracleExport.writeOnce(perDoc, OracleExport.PatchPath,
          OracleExport.docKeyFor(Tables.documents(s, d), d))
        perDoc
          .groupBy(col("format"))
          .agg(count(lit(1)).as("n_media"),
            max(col("n_patches")).as("n_patches"),
            floor(sum(col("contrast_micros")) / count(lit(1)).cast("double") + 0.5)
              .cast("long").as("avg_contrast_micros"),
            floor(sum(col("mean_micros")) / count(lit(1)).cast("double") + 0.5)
              .cast("long").as("avg_mean_micros"))
      },
      Some(s"""WITH exp AS MATERIALIZED (
                 SELECT doc_id, format, n_patches, contrast_micros, mean_micros
                 FROM ${OracleExport.readSql(OracleExport.PatchPath)}
                 WHERE corpus_key = ${OracleExport.docKeySql}),
               meta AS (
                 SELECT doc_id,
                        CASE CAST(doc_id % 3 AS INTEGER)
                          WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'wav'
                        END AS format
                 FROM documents),
               sel AS (SELECT doc_id, format FROM meta WHERE format <> 'wav'),
               agg AS (SELECT format, count(*) AS n_media FROM sel GROUP BY format),
               av AS (
                 SELECT s.format, max(e.n_patches) AS n_patches,
                        FLOOR(SUM(e.contrast_micros) / CAST(count(*) AS DOUBLE) + 0.5) AS acm,
                        FLOOR(SUM(e.mean_micros) / CAST(count(*) AS DOUBLE) + 0.5) AS amm
                 FROM sel s JOIN exp e
                   ON s.doc_id = e.doc_id AND s.format = e.format
                 GROUP BY s.format)
               SELECT a.format, CAST(a.n_media AS BIGINT) AS n_media,
                      CAST(av.n_patches AS BIGINT) AS n_patches,
                      CAST(av.acm AS BIGINT) AS avg_contrast_micros,
                      CAST(av.amm AS BIGINT) AS avg_mean_micros
               FROM agg a JOIN av ON a.format = av.format""")),

    // ---- m06: silence segmentation (VAD plumbing) -----------------------
    // The audio-curation step before any speech model sees a clip: how
    // much of each payload is actually signal, and in how many bursts —
    // silence fraction gates junk clips, segment boundaries drive
    // chunking. Payloads are deterministic gated sines (burst pattern
    // keyed off doc_id — real silence, phase-continuous bursts) pushed
    // through the SAME javax.sound.sampled round trip real audio takes,
    // then ONE O(n) frame-RMS pass (silenceStats) — no FFT, no second
    // scan. Same distribution contract as m04: one mapPartitions map,
    // no shuffle before the 4-class rollup. Oracle-checked with a FULLY
    // INDEPENDENT arithmetic oracle, no export at all: the gate pattern
    // is integer arithmetic on (doc_id, frame, class), so DuckDB
    // re-derives every silent frame and segment run from the documents
    // table alone — the compare therefore asserts that the WAV
    // encode→decode→frame-RMS round trip through the real JDK codec
    // reproduces the planted gate exactly (a codec or framing bug
    // changes the counts). Exact counts for known gate patterns are
    // also pinned in MultimodalSpec.
    ("m06_silence_segments",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("doc_id"), (col("doc_id") % 4).cast("int").as("pattern_class"))
          .as[(Long, Int)]
          .mapPartitions(_.map { case (id, cls) =>
            // Block b of 256 frames is silent iff (id + b) ≡ 0 mod
            // (cls + 2): per-class silence densities 1/2 .. 1/5.
            val wav = gatedSineWav(900.0, 0.8, 8000f, 4096, 256,
              b => (id + b) % (cls + 2) != 0)
            // The payload is self-generated: a decode failure here is a
            // codec regression, not bad data — fail loud rather than let
            // a sentinel corrupt the exact counts this operator exists
            // to report.
            val (nf, ns, seg) = wavSamples(wav, 4096) match {
              case Some((smp, _, _)) => silenceStats(smp, 256, 0.01)
              case None => sys.error(s"m06: WAV decode failed for doc $id")
            }
            (id, cls, nf, ns, seg)
          })
          .toDF("doc_id", "pattern_class", "n_frames", "n_silent", "n_segments")
          .groupBy(col("pattern_class"))
          .agg(count(lit(1)).as("n_payloads"),
            sum(col("n_silent")).as("silent_frames"),
            sum(col("n_segments")).as("silence_segments"),
            // exact-integer form: one double division per group, so the
            // independent oracle lands on the identical value
            floor(sum(col("n_silent")) * lit(1000000.0)
              / sum(col("n_frames")) + 0.5).cast("long").as("avg_silence_micros"))
      },
      // Silent frame f of doc (16 frames/payload) ⟺ gate block f is off
      // ⟺ (doc_id + f) ≡ 0 mod (pattern_class + 2); segments = maximal
      // silent runs via a LAG over the frame index.
      Some("""WITH docs AS (
                SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS pattern_class
                FROM documents),
              fr AS (
                SELECT doc_id, pattern_class,
                       unnest(generate_series(0, 15)) AS f
                FROM docs),
              flags AS (
                SELECT doc_id, pattern_class, f,
                       CASE WHEN (doc_id + f) % (pattern_class + 2) = 0
                            THEN 1 ELSE 0 END AS silent
                FROM fr),
              lagged AS (
                SELECT *, LAG(silent) OVER
                  (PARTITION BY doc_id ORDER BY f) AS prev
                FROM flags),
              perdoc AS (
                SELECT doc_id, pattern_class,
                       SUM(silent) AS n_silent,
                       SUM(CASE WHEN silent = 1 AND COALESCE(prev, 0) = 0
                                THEN 1 ELSE 0 END) AS n_segments,
                       16 AS n_frames
                FROM lagged GROUP BY doc_id, pattern_class)
              SELECT pattern_class,
                     CAST(count(*) AS BIGINT) AS n_payloads,
                     CAST(SUM(n_silent) AS BIGINT) AS silent_frames,
                     CAST(SUM(n_segments) AS BIGINT) AS silence_segments,
                     CAST(FLOOR(SUM(n_silent) * 1000000.0 / SUM(n_frames) + 0.5)
                       AS BIGINT) AS avg_silence_micros
              FROM perdoc GROUP BY pattern_class"""))
  )
}
