package graft.image

import java.awt.image.BufferedImage
import java.nio.file.{Files, Path, Paths}
import javax.imageio.ImageIO

/** Deterministic image-fixture generator (FIXTURES.md §B): stands in for the
  * reference's flowers dataset (`00. Explore.py:21-28`) — this environment
  * has no network and no image corpus, so tests and the image queries
  * synthesize a Hive-style `flower_photos/label=<class>/` tree of small
  * seeded JPEGs, plus one non-jpg file that `pathGlobFilter` must exclude
  * (`01. Ingest.py:35`).
  */
object ImageFixtures {

  val Classes: Seq[String] = Seq("daisy", "dandelion", "roses", "sunflowers", "tulips")

  /** Deterministic RGB at (x,y) for image `i` of class `c`. */
  private def pixel(c: Int, i: Int, x: Int, y: Int): Int = {
    val r = (31 * c + 7 * i + 13 * x + 3 * y) % 256
    val g = (17 * c + 11 * i + 5 * x + 7 * y) % 256
    val b = (23 * c + 3 * i + 2 * x + 11 * y) % 256
    (r << 16) | (g << 8) | b
  }

  /** Generate (idempotently) `perClass` JPEGs per class under
    * `root/flower_photos/label=<class>/img_<i>.jpg` with varying sizes, and
    * a `note.txt`. Returns the `flower_photos` directory path. */
  def generate(root: String, perClass: Int = 6): String = {
    val base = Paths.get(root, "flower_photos")
    val done = base.resolve(".done")
    if (Files.exists(done)) return base.toString
    Classes.zipWithIndex.foreach { case (cls, c) =>
      val dir = base.resolve(s"label=$cls")
      Files.createDirectories(dir)
      (0 until perClass).foreach { i =>
        val w   = 8 + (i % 4) * 12 // 8..44
        val h   = 6 + ((i + c) % 3) * 10 // 6..26
        val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, pixel(c, i, x, y)); x += 1 }; y += 1 }
        ImageIO.write(img, "jpg", dir.resolve(f"img_$i%03d.jpg").toFile)
      }
    }
    // The excluded-by-glob file (FIXTURES.md §B).
    Files.writeString(base.resolve("label=daisy").resolve("note.txt"), "not an image")
    Files.createFile(done)
    base.toString
  }

  /** Shared fixture under java.io.tmpdir for the SparkEntry image queries. */
  def shared(): String =
    generate(Paths.get(sys.props("java.io.tmpdir"), "graft_image_fixture").toString)
}
