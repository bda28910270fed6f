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
}
