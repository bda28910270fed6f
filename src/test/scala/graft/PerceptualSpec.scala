package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.image.{Kernels, Perceptual}

class PerceptualSpec extends SparkSpec {

  private def png(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Seeded noise image — the adversarial case for structured fixtures
    * (linear gradients make many dHash bits degenerate). */
  private def noiseImage(seed: Long, w: Int = 64, h: Int = 48): BufferedImage = {
    val rnd = new scala.util.Random(seed)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rnd.nextInt(1 << 24)); x += 1 }
      y += 1
    }
    img
  }

  test("dHash is deterministic and survives brightness shift + JPEG re-encode") {
    val img   = noiseImage(7)
    val bytes = png(img)
    val h1 = Perceptual.dHash64(bytes)
    assert(h1 == Perceptual.dHash64(bytes), "hash must be deterministic")
    val shifted = Kernels.brightnessShiftJpg(bytes, 8)
    assert(!java.util.Arrays.equals(bytes, shifted))
    val hamming = java.lang.Long.bitCount(h1 ^ Perceptual.dHash64(shifted))
    assert(hamming <= 6, s"brightness shift moved the hash by $hamming bits")
  }

  test("distinct images hash far apart; tiny images still hash") {
    val a = Perceptual.dHash64(png(noiseImage(1)))
    val b = Perceptual.dHash64(png(noiseImage(2)))
    assert(java.lang.Long.bitCount(a ^ b) >= 16,
      s"independent noise images too close: ${java.lang.Long.bitCount(a ^ b)} bits")
    // 3x2 image: smaller than the 9x8 grid — clamped cells, no crash
    Perceptual.dHash64(png(noiseImage(3, w = 3, h = 2)))
  }

  test("nearDupGroups pairs shifted copies with originals, keeps distinct images apart") {
    import spark.implicits._
    val imgs = (0 until 6).map { i =>
      val b = png(noiseImage(100 + i))
      Seq((s"img_$i", b), (s"img_$i#b", Kernels.brightnessShiftJpg(b, 8)))
    }.flatten
    val df  = imgs.toDF("img_id", "content")
    val out = Perceptual.nearDupGroups(df, "content", "img_id", maxHamming = 6, bands = 8)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    (0 until 6).foreach { i =>
      assert(out(s"img_$i#b") == s"img_$i", s"shifted copy of img_$i did not pair")
      assert(out(s"img_$i") == s"img_$i", s"img_$i should represent its own group")
    }
  }

  test("nearDupGroups works when the caller's id column is literally named 'id'") {
    import spark.implicits._
    val b = png(noiseImage(42))
    val df = Seq(("x", b), ("y", Kernels.brightnessShiftJpg(b, 8))).toDF("id", "content")
    val out = Perceptual.nearDupGroups(df, "content", "id", maxHamming = 6, bands = 8)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out == Map("x" -> "x", "y" -> "x"))
  }

  test("property: banding finds EVERY pair within maxHamming on random hashes (pigeonhole)") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd  = new scala.util.Random(seed)
      val base = Array.fill(30)(rnd.nextLong())
      // plant near-pairs at hamming 1..7 off random bases
      val planted = base.zipWithIndex.map { case (h, i) =>
        var x = h
        val flips = i % 8
        val bits  = rnd.shuffle((0 until 64).toList).take(flips)
        bits.foreach(b => x ^= (1L << b))
        (s"p$i", x, s"b$i", h, flips)
      }
      val hashes = (planted.map(p => (p._1, p._2)) ++ planted.map(p => (p._3, p._4)))
        .toSeq.toDF("img_id", "phash")
      val pairs = Perceptual.nearDupPairs(hashes, "img_id", maxHamming = 7, bands = 8)
        .collect().map(r => Set(r.getString(0), r.getString(1)) -> r.getInt(2).toLong).toMap
      planted.foreach { case (a, _, b, _, flips) =>
        if (flips <= 7)
          assert(pairs.get(Set(a, b)).contains(flips.toLong),
            s"seed $seed: planted pair ($a,$b) at hamming $flips missed")
      }
      // and nothing beyond the threshold leaks through
      assert(pairs.values.forall(_ <= 7))
    }
  }

  test("band recall guarantee is enforced and the bucket cap drops mega-buckets") {
    import spark.implicits._
    val hashes = Seq(("a", 0L), ("b", 1L), ("c", 2L), ("d", 3L)).toDF("img_id", "phash")
    val ex = intercept[IllegalArgumentException] {
      Perceptual.nearDupPairs(hashes, "img_id", maxHamming = 4, bands = 4)
    }
    assert(ex.getMessage.contains("recall"))
    // all four share every band bucket; cap 3 < 4 members → no pairs at all
    val capped = Perceptual.nearDupPairs(hashes, "img_id", maxHamming = 3, bands = 4,
      maxBucketSize = 3)
    assert(capped.count() == 0)
    // with the cap lifted the same bucket yields all 6 verified pairs
    val open = Perceptual.nearDupPairs(hashes, "img_id", maxHamming = 3, bands = 4)
    assert(open.count() == 6)
  }
}
