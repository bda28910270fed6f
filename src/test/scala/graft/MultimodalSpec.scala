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

  test("stub decoders are deterministic") {
    val bytes = Array.tabulate[Byte](300)(i => (i * 7).toByte)
    assert(Multimodal.decodeAudioStub(bytes).sameElements(Multimodal.decodeAudioStub(bytes)))
    val f1 = Multimodal.sampleFramesStub(bytes, 4)
    val f2 = Multimodal.sampleFramesStub(bytes, 4)
    assert(f1.length == 4 && f1.zip(f2).forall { case (a, b) => a.sameElements(b) })
  }
}
