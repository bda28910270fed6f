package graft

import graft.image.{ImageFixtures, ImagePipeline}
import graft.multimodal.Multimodal
import java.nio.file.Files
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val files = ImagePipeline.readBinaryImages(
    spark, ImageFixtures.generate(Files.createTempDirectory("graft_mm").toString))

  test("fromBinaryFiles produces the media schema with real image metadata") {
    val media = Multimodal.fromBinaryFiles(files, "image")
    assert(media.schema == Multimodal.mediaSchema)
    val m = media.where(col("meta.width") > 0)
    assert(m.count() == files.count(), "every image decodes real width/height")
  }

  test("audio/video stubs carry modality-typed metadata") {
    val audio = Multimodal.fromBinaryFiles(files.limit(3), "audio").select("meta.*").head()
    assert(audio.getString(0) == "audio/wav" && audio.getInt(4) == 16000)
    val video = Multimodal.fromBinaryFiles(files.limit(3), "video").select("meta.*").head()
    assert(video.getString(0) == "video/mp4" && video.getLong(3) >= 0)
  }

  test("extractFeatures yields fixed-dim finite vectors per modality") {
    val media = Multimodal.fromBinaryFiles(files.limit(4), "image")
      .unionAll(Multimodal.fromBinaryFiles(files.limit(4), "audio"))
      .unionAll(Multimodal.fromBinaryFiles(files.limit(4), "video"))
    val feats = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(feats.length == 12)
    feats.foreach { r =>
      val f = r.getSeq[Float](2)
      assert(f.length == 16, s"${r.getString(1)} dim")
      assert(f.forall(v => !v.isNaN && !v.isInfinite))
    }
  }

  test("corrupt image payloads degrade to opaque metadata, not job failure") {
    import spark.implicits._
    val corrupt = Seq(("mem://bad", Array[Byte](1, 2, 3))).toDF("path", "content")
    val media = Multimodal.fromBinaryFiles(corrupt, "image").collect()
    assert(media.length == 1)
    assert(media.head.getStruct(3).getString(0) == "application/octet-stream")
  }

  test("null payloads degrade to opaque metadata in EVERY modality branch") {
    import spark.implicits._
    val nulls = Seq(("mem://gone", Option.empty[Array[Byte]])).toDF("path", "content")
    Seq("image", "audio", "video").foreach { m =>
      val row = Multimodal.fromBinaryFiles(nulls, m).collect()
      assert(row.length == 1 && row.head.getStruct(3).getString(0) == "application/octet-stream",
        s"modality $m must tolerate null content")
    }
  }

  /** 16-bit mono little-endian WAV with the given samples, via the JDK's
    * own writer (round-trip independence: writer and [[Multimodal.decodeWav]]
    * share only the format spec). */
  private def wavBytes(samples: Array[Short], sampleRate: Float = 16000f): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt  = new AudioFormat(sampleRate, 16, 1, true, false)
    val data = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      data(2 * i) = (s & 0xff).toByte; data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val in  = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, samples.length)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audioSpectralFeatures recovers a bin-aligned tone's signature") {
    val sr = 8000
    // bin-aligned tone (bin 112 of 2048 at 8 kHz = 437.5 Hz) → negligible
    // spectral leakage, so both dominant bin and centroid sit on the tone
    val f   = 112 * sr / 2048.0
    val wav = Multimodal.sineWav(f, sr, 2048, amplitude = 0.8)
    val pcm = Multimodal.decodeWav(wav)
    val (rms, zcr, centroid, dom) = Multimodal.audioSpectralFeatures(pcm, sr)
    // sine RMS = amplitude/√2; 16-bit quantization keeps it within 1%
    assert(math.abs(rms - 0.8 / math.sqrt(2.0)) < 0.01, s"rms $rms")
    // two crossings per cycle: 2·437.5/8000 ≈ 0.109
    assert(math.abs(zcr - 2 * f / sr) < 0.01, s"zcr $zcr")
    assert(dom == f, s"dominant $dom")
    assert(math.abs(centroid - f) < 5.0, s"centroid $centroid")
    // silence → all-zero features (no phantom dominant bin)
    assert(Multimodal.audioSpectralFeatures(new Array[Float](2048), sr) ==
      ((0.0, 0.0, 0.0, 0.0)))
  }

  test("decodeWav recovers known 16-bit PCM samples from a generated WAV") {
    val samples = Array[Short](0, 16384, -16384, 32767, -32768, 100, -1)
    val decoded = Multimodal.decodeWav(wavBytes(samples))
    assert(decoded.length == samples.length)
    decoded.zip(samples).foreach { case (f, s) =>
      assert(math.abs(f - s / 32768.0f) < 1e-6, s"sample $s decoded as $f")
    }
  }

  test("decodeWav averages stereo channels to mono") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt  = new AudioFormat(8000f, 16, 2, true, false)
    // frames: (L=8192, R=-8192) -> 0; (L=16384, R=16384) -> 0.5
    val pcm  = Array[Short](8192, -8192, 16384, 16384)
    val data = new Array[Byte](pcm.length * 2)
    pcm.zipWithIndex.foreach { case (s, i) =>
      data(2 * i) = (s & 0xff).toByte; data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val in  = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, 2)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    val decoded = Multimodal.decodeWav(out.toByteArray)
    assert(decoded.length == 2)
    assert(math.abs(decoded(0)) < 1e-6 && math.abs(decoded(1) - 0.5f) < 1e-6)
  }

  test("wavMeta reads real sample rate and duration; audio branch uses them") {
    import spark.implicits._
    val bytes = wavBytes(new Array[Short](8000), sampleRate = 16000f) // 0.5s of silence
    assert(Multimodal.wavMeta(bytes).contains((16000, 500L)))
    val media = Multimodal.fromBinaryFiles(
      Seq(("mem://a.wav", bytes)).toDF("path", "content"), "audio").select("meta.*").head()
    assert(media.getString(0) == "audio/wav")
    assert(media.getLong(3) == 500L && media.getInt(4) == 16000)
    // non-WAV payloads still fall back to the stub heuristic, not a failure
    val junk = Multimodal.fromBinaryFiles(
      Seq(("mem://x.mp3", Array.tabulate[Byte](320)(_.toByte))).toDF("path", "content"),
      "audio").select("meta.*").head()
    assert(junk.getString(0) == "audio/wav" && junk.getInt(4) == 16000)
  }

  test("decodeAudio: real decode for WAV, deterministic stub for junk, empty for null") {
    val samples = Array[Short](1000, -1000, 2000)
    val real = Multimodal.decodeAudio(wavBytes(samples))
    assert(real.length == 3 && math.abs(real(0) - 1000 / 32768.0f) < 1e-6)
    val junk = Array.tabulate[Byte](64)(i => (i * 3).toByte)
    assert(Multimodal.decodeAudio(junk).sameElements(Multimodal.decodeAudioStub(junk)))
    assert(Multimodal.decodeAudio(null).isEmpty && Multimodal.decodeAudio(Array[Byte]()).isEmpty)
  }

  test("stub decoders are deterministic") {
    val bytes = Array.tabulate[Byte](300)(i => (i * 7).toByte)
    assert(Multimodal.decodeAudioStub(bytes).sameElements(Multimodal.decodeAudioStub(bytes)))
    val f1 = Multimodal.sampleFramesStub(bytes, 4)
    val f2 = Multimodal.sampleFramesStub(bytes, 4)
    assert(f1.length == 4 && f1.zip(f2).forall { case (a, b) => a.sameElements(b) })
  }

  // -------------------------------------------------------- GIF (real) --

  /** Animated GIF with uniform-gray frames of level 40·i (exactly palette-
    * representable, so decode recovers the exact value). */
  private def grayGif(nFrames: Int, w: Int = 8, h: Int = 6): Array[Byte] = {
    import javax.imageio.ImageIO
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val baos   = new java.io.ByteArrayOutputStream()
    val ios    = ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until nFrames).foreach { i =>
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g   = img.createGraphics()
      g.setColor(new java.awt.Color(40 * i, 40 * i, 40 * i))
      g.fillRect(0, 0, w, h)
      g.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
        writer.getDefaultWriteParam)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    baos.toByteArray
  }

  private def pngBrightness(png: Array[Byte]): Double = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val vals = for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) yield {
      val rgb = img.getRGB(x, y)
      (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
    }
    vals.sum / vals.length
  }

  test("sampleGifFrames: real decode, even sampling, exact frame content recovered") {
    val gif = grayGif(6)
    assert(Multimodal.gifMeta(gif).contains((8, 6, 6)))
    val sampled = Multimodal.sampleGifFrames(gif, 3) // frames 0, 2, 4
    assert(sampled.length == 3)
    assert(sampled.map(pngBrightness).toSeq == Seq(0.0, 80.0, 160.0))
    // asking for more frames than exist returns every frame once
    assert(Multimodal.sampleGifFrames(gif, 10).length == 6)
  }

  test("GIF payloads get real video metadata; extractFeatures uses decoded frames") {
    import spark.implicits._
    val gif = grayGif(4)
    val df  = Seq(("mem://anim.gif", gif)).toDF("path", "content")
    val meta = Multimodal.fromBinaryFiles(df, "video").select("meta.*").head()
    assert(meta.getString(0) == "image/gif")
    assert(meta.getInt(1) == 8 && meta.getInt(2) == 6)
    assert(meta.getLong(3) == 400L) // 4 frames x 100 ms nominal tick
    val media = Multimodal.fromBinaryFiles(df, "video")
    val feats = Multimodal.extractFeatures(media, dim = 4).head().getSeq[Float](2)
    // per-frame mean brightness of gray levels 0,40,80,120 over 255
    val want = Seq(0f, 40f, 80f, 120f).map(_ / 255f)
    assert(feats.length == 4)
    feats.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-6, s"$g vs $w") }
  }

  // -------------------------------------------------- MJPEG-AVI (real) --

  private def grayFrame(level: Int, w: Int = 16, h: Int = 12): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g   = img.createGraphics()
    g.setColor(new java.awt.Color(level, level, level))
    g.fillRect(0, 0, w, h)
    g.dispose()
    img
  }

  test("sampleAviFrames: real RIFF/AVI walk, even sampling, per-frame brightness recovered") {
    val avi = Multimodal.mjpegAvi((0 until 6).map(i => grayFrame(40 * i)), fps = 10)
    assert(Multimodal.aviMeta(avi).contains((16, 12, 6, 100000)))
    val sampled = Multimodal.sampleAviFrames(avi, 3) // frames 0, 2, 4
    assert(sampled.length == 3)
    // JPEG is lossy but uniform gray survives within a couple of levels
    sampled.map(pngBrightness).zip(Seq(0.0, 80.0, 160.0)).foreach { case (got, want) =>
      assert(math.abs(got - want) <= 2.5, s"$got vs $want")
    }
    assert(Multimodal.sampleAviFrames(avi, 10).length == 6)
    // decodeVideoFrames routes AVI to the real decoder (stub would return
    // n raw byte slices, not decodable PNGs)
    val viaChain = Multimodal.decodeVideoFrames(avi, 2)
    assert(viaChain.length == 2 && math.abs(pngBrightness(viaChain(0))) <= 2.5)
  }

  test("AVI payloads get real video metadata; non-MJPEG codec falls back to the stub") {
    import spark.implicits._
    val avi = Multimodal.mjpegAvi((0 until 4).map(i => grayFrame(30 * i)), fps = 20)
    val df  = Seq(("mem://clip.avi", avi)).toDF("path", "content")
    val meta = Multimodal.fromBinaryFiles(df, "video").select("meta.*").head()
    assert(meta.getString(0) == "video/x-msvideo")
    assert(meta.getInt(1) == 16 && meta.getInt(2) == 12)
    assert(meta.getLong(3) == 200L) // 4 frames x 50 ms
    val media = Multimodal.fromBinaryFiles(df, "video")
    val feats = Multimodal.extractFeatures(media, dim = 4).head().getSeq[Float](2)
    val want  = Seq(0f, 30f, 60f, 90f).map(_ / 255f)
    assert(feats.length == 4)
    feats.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 2.5f / 255f, s"$g vs $w") }
    // an AVI whose frame chunks are NOT JPEG (H.264-style) must NOT fake a
    // decode: sampleAviFrames refuses, decodeVideoFrames yields stub slices
    val junk  = Array.fill[Byte](64)(7)
    val fake  = Multimodal.mjpegAvi(Seq(grayFrame(10)), fps = 10)
    // splice junk over the jpeg payload: rebuild a minimal AVI by hand
    val bo = new java.io.ByteArrayOutputStream()
    def le(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val movi = "LIST".getBytes ++ le(4 + 8 + junk.length) ++ "movi".getBytes ++
      "00dc".getBytes ++ le(junk.length) ++ junk
    bo.write("RIFF".getBytes); bo.write(le(4 + movi.length)); bo.write("AVI ".getBytes)
    bo.write(movi)
    val h264ish = bo.toByteArray
    intercept[IllegalArgumentException] { Multimodal.sampleAviFrames(h264ish, 2) }
    val stubbed = Multimodal.decodeVideoFrames(h264ish, 2)
    assert(stubbed.length == 2, "stub fallback must still honor the shape contract")
    assert(stubbed.forall(f =>
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f)) == null),
      "stub output must not masquerade as decoded frames")
  }

  test("truncated AVI yields the complete frames and drops the cut-off tail") {
    val avi = Multimodal.mjpegAvi((0 until 4).map(i => grayFrame(40 * i)), fps = 10)
    // chop mid-way through the LAST frame's payload (the idx1 tail and half
    // a JPEG vanish — a partial download)
    val lastJpegStart = {
      // find the 4th 00dc marker
      var pos = -1; var found = 0; var i = 0
      while (i < avi.length - 4 && found < 4) {
        if (avi(i) == '0' && avi(i + 1) == '0' && avi(i + 2) == 'd' && avi(i + 3) == 'c') {
          found += 1; pos = i
        }
        i += 1
      }
      pos
    }
    assert(lastJpegStart > 0)
    val truncated = java.util.Arrays.copyOfRange(avi, 0, lastJpegStart + 20)
    val frames = Multimodal.sampleAviFrames(truncated, 10)
    assert(frames.length == 3, s"3 complete frames must survive, got ${frames.length}")
    frames.map(pngBrightness).zip(Seq(0.0, 40.0, 80.0)).foreach { case (got, want) =>
      assert(math.abs(got - want) <= 2.5, s"$got vs $want")
    }
  }

  test("speechSegments recovers tone-burst geometry exactly") {
    for (bursts <- 0 to 3) {
      val wav  = Multimodal.toneBurstWav(bursts, 8000, toneMs = 150, gapMs = 150)
      val segs = Multimodal.speechSegments(wav)
      assert(segs.length == bursts, s"$bursts bursts → ${segs.length} segments")
      segs.zipWithIndex.foreach { case (seg, i) =>
        val expectStart = 150L + i * 300L
        assert(math.abs(seg.start_ms - expectStart) <= 20,
          s"burst $i start ${seg.start_ms} vs ~$expectStart")
        assert(math.abs((seg.end_ms - seg.start_ms) - 150L) <= 20,
          s"burst $i length ${seg.end_ms - seg.start_ms} vs ~150")
        // a 0.8-amplitude sine sits near -4.9 dBFS
        assert(seg.rms_db > -8 && seg.rms_db < 0, s"burst rms ${seg.rms_db}")
      }
    }
  }

  test("speechSegments: pcmToWav round-trip, min-length filter, junk input") {
    // 30ms blip below the 50ms floor must be filtered out
    val rate = 8000
    val pcm = new Array[Float](rate) // 1s silence
    var i = 0
    while (i < rate * 30 / 1000) { pcm(400 + i) = 0.5f; i += 1 }
    assert(Multimodal.speechSegments(Multimodal.pcmToWav(pcm, rate)).isEmpty)
    // the same blip passes with the floor lowered
    assert(Multimodal.speechSegments(Multimodal.pcmToWav(pcm, rate), minMs = 10).length == 1)
    // decodeWav(pcmToWav(x)) ≈ x (16-bit quantization)
    val tone = (0 until 800).map(t => (math.sin(t * 0.1) * 0.5).toFloat).toArray
    val back = Multimodal.decodeWav(Multimodal.pcmToWav(tone, rate))
    assert(back.length == tone.length)
    tone.zip(back).foreach { case (a, b) => assert(math.abs(a - b) < 1e-3) }
    // non-WAV payloads yield no segments, never throw
    assert(Multimodal.speechSegments("junk".getBytes).isEmpty)
  }
}
