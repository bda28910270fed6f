package graft

import graft.image.{ImageFixtures, ImageUdfs, Kernels, LinearScoringModel}
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

class ImageKernelsSpec extends SparkSpec {

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, ((x * 37) << 16) | ((y * 11) << 8) | 128)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  test("size decodes exact dimensions (I1)") {
    assert(Kernels.size(jpeg(8, 6)) == (8, 6))
    assert(Kernels.size(jpeg(64, 48)) == (64, 48))
  }

  test("grayscale preserves dimensions and is single-channel PNG (I3)") {
    val png = Kernels.grayscalePng(jpeg(16, 9))
    val img = Kernels.decode(png)
    assert(img.getWidth == 16 && img.getHeight == 9)
    assert(img.getColorModel.getNumComponents == 1)
    // grayscale means R==G==B when read back as RGB
    val rgb = img.getRGB(3, 3)
    val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
    assert(r == g && g == b)
  }

  test("resize hits target dimensions (I2)") {
    val out = Kernels.decode(Kernels.resizeJpg(jpeg(30, 20), 224, 224))
    assert(out.getWidth == 224 && out.getHeight == 224)
  }

  test("centerCrop yields a square of the requested side") {
    val out = Kernels.decode(Kernels.centerCropJpg(jpeg(50, 30), 24))
    assert(out.getWidth == 24 && out.getHeight == 24)
  }

  test("randomCropFlip is deterministic per seed, varies across seeds (I5)") {
    val src = jpeg(40, 40)
    val a   = Kernels.randomCropFlipJpg(src, 16, seed = 1L)
    val b   = Kernels.randomCropFlipJpg(src, 16, seed = 1L)
    val c   = Kernels.randomCropFlipJpg(src, 16, seed = 2L)
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
  }

  test("normalizedFeatures has HWC*3 length and finite values (I4)") {
    val f = Kernels.normalizedFeatures(jpeg(10, 10), 8, 8)
    assert(f.length == 8 * 8 * 3)
    assert(f.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("scoring model returns [prediction, probabilities-json] (I6)") {
    val model = new LinearScoringModel(ImageFixtures.Classes)
    val out   = model.predict(Kernels.normalizedFeatures(jpeg(12, 12), 8, 8))
    assert(out.length == 2)
    assert(ImageFixtures.Classes.contains(out(0)))
    assert(out(1).startsWith("{") && ImageFixtures.Classes.forall(c => out(1).contains(s""""$c"""")))
    // deterministic
    assert(model.predict(Kernels.normalizedFeatures(jpeg(12, 12), 8, 8)).sameElements(out))
  }

  test("image UDFs null-propagate (left-outer re-attach yields null content)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq((1L, Option.empty[Array[Byte]])).toDF("id", "content")
    val row = df.select(
      ImageUdfs.imageSize(col("content")).as("s"),
      ImageUdfs.grayscalePng(col("content")).as("g"),
      ImageUdfs.pixelChecksum(col("content")).as("c")).head()
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2))
  }
}
