package graft.image

import java.awt.RenderingHints
import java.awt.geom.AffineTransform
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** JVM-native image kernels (SURVEY.md §2g I1–I5) — the reference runs these
  * as PIL/pandas code inside Python workers
  * (`01. Ingest.py:54-62,102-114`, `02.b Train - PyTorch Distributed.py:231-247`);
  * here they are plain Scala functions on `Array[Byte]` executed inside the
  * task thread, exposed through [[ImageUdfs]]. No native deps: `javax.imageio`
  * + AWT in headless mode (`GraftSession` sets `java.awt.headless`).
  *
  * Design rule carried from the reference (`02.a …:151`): decode late — these
  * kernels run inside the consuming operator; decoded pixel/float tensors are
  * never persisted to a table.
  */
object Kernels {

  def decode(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    img
  }

  private[graft] def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def encodeJpg(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    // JPEG writer requires no alpha channel.
    val rgb = toType(img, BufferedImage.TYPE_3BYTE_BGR)
    ImageIO.write(rgb, "jpg", out)
    out.toByteArray
  }

  private def toType(img: BufferedImage, imageType: Int): BufferedImage =
    if (img.getType == imageType) img
    else {
      val converted = new BufferedImage(img.getWidth, img.getHeight, imageType)
      val g = converted.createGraphics()
      g.drawImage(img, 0, 0, null)
      g.dispose()
      converted
    }

  /** I1: decode + size — the reference's `Image.open(BytesIO(content)).size`
    * (`01. Ingest.py:54-62`). Like PIL's lazy open, this parses only the
    * image HEADER via an ImageReader — a full `ImageIO.read` would decode
    * every pixel just to report dimensions (~10-100x the work, paid per row
    * of the ingest scan). */
  def size(bytes: Array[Byte]): (Int, Int) = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, "undecodable image payload")
      val r = readers.next()
      try { r.setInput(iis); (r.getWidth(0), r.getHeight(0)) }
      finally r.dispose()
    } finally iis.close()
  }

  /** I3: grayscale conversion + PNG encode — `convert('L')` + `save(format=
    * "png")` (`01. Ingest.py:102-114`). Output is a single-channel PNG. */
  def grayscalePng(bytes: Array[Byte]): Array[Byte] = {
    val src  = decode(bytes)
    val gray = new BufferedImage(src.getWidth, src.getHeight, BufferedImage.TYPE_BYTE_GRAY)
    val g    = gray.createGraphics()
    g.drawImage(src, 0, 0, null)
    g.dispose()
    encodePng(gray)
  }

  /** I2: decode + bilinear resize — `Image.open(...).resize([w, h])`
    * (`02.a …:157-163`). Returns JPEG bytes (input payloads are JPEG). */
  def resizeJpg(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    encodeJpg(resize(decode(bytes), w, h))

  def resize(src: BufferedImage, w: Int, h: Int): BufferedImage = {
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val g   = dst.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_INTERPOLATION, RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(src, 0, 0, w, h, null)
    g.dispose()
    dst
  }

  /** ImageNet channel statistics used by the reference's normalization
    * (`02.a …:163`, `02.b …:244`). */
  val ImageNetMean: Array[Float] = Array(0.485f, 0.456f, 0.406f)
  val ImageNetStd: Array[Float]  = Array(0.229f, 0.224f, 0.225f)

  /** I4: decode → resize → normalized float tensor in HWC layout, channel
    * order RGB, values `(x/255 - mean) / std`. The float tensor is produced
    * inside the consuming operator only — never persisted (§4 design rule). */
  def normalizedFeatures(bytes: Array[Byte], w: Int = 224, h: Int = 224): Array[Float] = {
    val img = resize(decode(bytes), w, h)
    // bulk getRGB: one array fetch instead of w*h per-pixel calls (each of
    // which pays ColorModel conversion + bounds checks) — this sits inside
    // the per-row inference hot loop
    val rgbs = img.getRGB(0, 0, w, h, null, 0, w)
    val out  = new Array[Float](w * h * 3)
    var p = 0
    var i = 0
    while (p < rgbs.length) {
      val rgb = rgbs(p)
      val r   = ((rgb >> 16) & 0xff) / 255.0f
      val gC  = ((rgb >> 8) & 0xff) / 255.0f
      val b   = (rgb & 0xff) / 255.0f
      out(i) = (r - ImageNetMean(0)) / ImageNetStd(0)
      out(i + 1) = (gC - ImageNetMean(1)) / ImageNetStd(1)
      out(i + 2) = (b - ImageNetMean(2)) / ImageNetStd(2)
      i += 3
      p += 1
    }
    out
  }

  /** Center crop to a square of `side` (after shorter-edge resize), as in
    * the reference's eval transform `Resize(256) → CenterCrop(224)`
    * (`02.b …:243-247`). */
  def centerCropJpg(bytes: Array[Byte], side: Int): Array[Byte] = {
    val src     = decode(bytes)
    val (w, h)  = (src.getWidth, src.getHeight)
    val scale   = math.max(side.toDouble / w, side.toDouble / h)
    val (rw, rh) = (math.max(side, math.round(w * scale).toInt), math.max(side, math.round(h * scale).toInt))
    val resized = resize(src, rw, rh)
    val cropped = resized.getSubimage((rw - side) / 2, (rh - side) / 2, side, side)
    encodeJpg(cropped)
  }

  /** I5: seeded random-resized-crop + horizontal flip — the reference's
    * train-time augmentation `RandomResizedCrop(224)` + `RandomHorizontalFlip`
    * (`02.b …:231-241`), made deterministic per row by an explicit seed
    * (callers derive it from a stable row key, e.g. `xxhash64(path)`). */
  def randomCropFlipJpg(bytes: Array[Byte], side: Int, seed: Long): Array[Byte] = {
    val rnd     = new scala.util.Random(seed)
    val src     = decode(bytes)
    val (w, h)  = (src.getWidth, src.getHeight)
    val minSide = math.min(w, h)
    val cropSide = math.max(1, (minSide * (0.6 + 0.4 * rnd.nextDouble())).toInt)
    val x       = rnd.nextInt(math.max(1, w - cropSide + 1))
    val y       = rnd.nextInt(math.max(1, h - cropSide + 1))
    val flip    = rnd.nextBoolean()
    val cropped = src.getSubimage(x, y, cropSide, cropSide)
    val resized = resize(cropped, side, side)
    val outImg =
      if (!flip) resized
      else {
        val tx = AffineTransform.getScaleInstance(-1, 1)
        tx.translate(-resized.getWidth, 0)
        val flipped = new BufferedImage(resized.getWidth, resized.getHeight, BufferedImage.TYPE_3BYTE_BGR)
        val g       = flipped.createGraphics()
        g.drawImage(resized, tx, null)
        g.dispose()
        flipped
      }
    encodeJpg(outImg)
  }

  /** Uniform brightness shift (each channel +delta, clamped to [0,255]),
    * re-encoded as JPEG — a deterministic "near-duplicate generator" for
    * the perceptual-hash pipeline: every output byte differs from the
    * input, but luma GRADIENTS are preserved except at clamp saturation,
    * so the dHash moves by at most a few bits. */
  def brightnessShiftJpg(bytes: Array[Byte], delta: Int): Array[Byte] = {
    val src = toType(decode(bytes), BufferedImage.TYPE_3BYTE_BGR)
    val w   = src.getWidth
    val h   = src.getHeight
    val rgbs = src.getRGB(0, 0, w, h, null, 0, w)
    var p = 0
    while (p < rgbs.length) {
      val rgb = rgbs(p)
      def c(v: Int) = math.min(255, math.max(0, v + delta))
      rgbs(p) = (c((rgb >> 16) & 0xff) << 16) | (c((rgb >> 8) & 0xff) << 8) | c(rgb & 0xff)
      p += 1
    }
    val out = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    out.setRGB(0, 0, w, h, rgbs, 0, w)
    encodeJpg(out)
  }

  /** Decoded grayscale pixel checksum — for tests/queries that must compare
    * image results without depending on encoder byte-stability (SURVEY.md §5
    * hazard 4: assert on decoded pixels, never encoded bytes). */
  def decodedPixelChecksum(bytes: Array[Byte]): Long = {
    val img  = decode(bytes)
    val w    = img.getWidth
    val rgbs = img.getRGB(0, 0, w, img.getHeight, null, 0, w) // bulk fetch, row-major
    var acc = 1469598103934665603L // FNV offset
    var p   = 0
    while (p < rgbs.length) {
      acc = (acc ^ (rgbs(p) & 0xffffff)) * 1099511628211L
      p += 1
    }
    acc
  }
}
