package graft

import graft.image.{ImageFixtures, ImagePipeline, ImageUdfs, Kernels, LinearScoringModel}
import java.nio.file.Files
import org.apache.spark.sql.functions._

class ImagePipelineSpec extends SparkSpec {

  private lazy val fixtureDir: String =
    ImageFixtures.generate(Files.createTempDirectory("graft_img_spec").toString)

  test("binaryFile scan excludes non-jpg via pathGlobFilter (S2/P8)") {
    val df = ImagePipeline.readBinaryImages(spark, fixtureDir)
    assert(df.count() == ImageFixtures.Classes.size * 6)
    assert(df.where(col("path").endsWith(".txt")).count() == 0)
    assert(df.columns.toSet == Set("path", "modificationTime", "length", "content"))
  }

  test("image source yields the nested image struct (S1)") {
    val df = ImagePipeline.readImageSource(spark, fixtureDir)
    val f  = df.schema("image").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(f.fieldNames.toSet == Set("origin", "height", "width", "nChannels", "mode", "data"))
    assert(df.count() > 0)
  }

  test("partition-dir scan prunes to one label (S3)") {
    val one = spark.read.format("binaryFile").option("pathGlobFilter", "*.jpg")
      .load(s"$fixtureDir/label=roses")
    assert(one.count() == 6)
  }

  test("ingest: labels, lex-rank indices, sizes, grayscale attached end-to-end") {
    val out = ImagePipeline.ingest(spark, fixtureDir).cache()
    assert(out.count() == ImageFixtures.Classes.size * 6)
    // A4: label_index = 0-based lexicographic rank
    val idx = out.select("label", "label_index").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(idx == ImageFixtures.Classes.sorted.zipWithIndex.map { case (c, i) => c -> i.toLong }.toMap)
    // I1: size matches actual decode
    val row = out.where(col("path").endsWith("label=daisy/img_000.jpg"))
      .select("size.width", "size.height", "content", "grayscale_image", "grayscale_format").head()
    val (w, h) = Kernels.size(row.getAs[Array[Byte]]("content"))
    assert(row.getInt(0) == w && row.getInt(1) == h)
    // I3 via grouped-map + J1 re-attach: grayscale decodes to same dims
    val gray = Kernels.decode(row.getAs[Array[Byte]]("grayscale_image"))
    assert(gray.getWidth == w && gray.getHeight == h)
    assert(row.getString(4) == "png")
    out.unpersist()
  }

  test("trainingPrep writes split parquet caches with uncompressed codec (S11/S12)") {
    val cache = Files.createTempDirectory("graft_cache").toString
    val (train, va) = ImagePipeline.trainingPrep(
      ImagePipeline.ingest(spark, fixtureDir), cache, limit = 20)
    assert(train.count() + va.count() == 20)
    assert(train.columns.toSet == Set("content", "label_index"))
    // codec restored after the bracketed write
    assert(spark.conf.get("spark.sql.parquet.compression.codec") != "uncompressed")
  }

  test("batchInference produces (origin, prediction, probabilities) (I6)") {
    val model = new LinearScoringModel(ImageFixtures.Classes.toList)
    val out = ImagePipeline.batchInference(
      ImagePipeline.readBinaryImages(spark, fixtureDir).limit(5), model)
    val rows = out.collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(ImageFixtures.Classes.contains(r.getString(1)))
      assert(r.getString(2).startsWith("{"))
    }
  }
}
