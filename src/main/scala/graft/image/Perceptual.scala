package graft.image

import java.awt.image.BufferedImage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Perceptual image hashing + near-duplicate detection — the image-side
  * sibling of the text MinHash/SimHash family (`operators/Dedup.scala`).
  * Web-scale multimodal corpora (LAION-style) dedup images by a small
  * perceptual fingerprint, never by raw bytes: re-encodes, quality changes,
  * and brightness shifts alter every byte but barely move the hash.
  *
  * The fingerprint is dHash: box-average the decoded image onto a 9×8 luma
  * grid and emit one bit per horizontal neighbor comparison (64 bits).
  * Implemented with exact integer arithmetic (long luma sums, cross-
  * multiplied averages) — no float resize in the loop — so the hash is a
  * pure function of decoded pixels on any JVM.
  *
  * Near-dup candidate generation follows the repo's LSH discipline: the
  * 64-bit hash splits into `bands` contiguous slices; images sharing any
  * band bucket become candidates (pigeonhole: hamming ≤ bands-1 is
  * recall-complete), then candidates verify exactly via `bit_count(a^b)`.
  * Only (band_key, id) pairs shuffle — image bytes stay in the scan, and
  * a bucket-size cap bounds the pair fan-out before any list materializes
  * (the 100 TB hazard: a mono-color meme bucket with 10^6 members).
  */
object Perceptual {

  /** 64-bit difference hash over a 9×8 integer box-filtered luma grid.
    * Bit (y*8+x) is set iff cell(x+1, y) is strictly brighter than
    * cell(x, y); luma = 299·R + 587·G + 114·B (scaled, exact ints). */
  def dHash64(bytes: Array[Byte]): Long = dHashOf(Kernels.decode(bytes))

  private[image] def dHashOf(img: BufferedImage): Long = {
    val w    = img.getWidth
    val h    = img.getHeight
    val rgbs = img.getRGB(0, 0, w, h, null, 0, w)
    val sums = new Array[Long](9 * 8)
    val cnts = new Array[Long](9 * 8)
    // cell → pixel-range mapping with a nonempty-range clamp, so tiny
    // images (w < 9 or h < 8) still populate every cell
    var gy = 0
    while (gy < 8) {
      val y0 = math.min(gy * h / 8, h - 1)
      val y1 = math.max(y0 + 1, (gy + 1) * h / 8)
      var gx = 0
      while (gx < 9) {
        val x0 = math.min(gx * w / 9, w - 1)
        val x1 = math.max(x0 + 1, (gx + 1) * w / 9)
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = rgbs(y * w + x)
            s += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        sums(gy * 9 + gx) = s
        cnts(gy * 9 + gx) = (y1 - y0).toLong * (x1 - x0)
        gx += 1
      }
      gy += 1
    }
    var hash = 0L
    var b = 0
    while (b < 64) {
      val gyb = b / 8
      val gxb = b % 8
      val i   = gyb * 9 + gxb
      // avg(x+1) > avg(x) via cross-multiplication: exact, no division
      if (sums(i + 1) * cnts(i) > sums(i) * cnts(i + 1)) hash |= (1L << b)
      b += 1
    }
    hash
  }

  private val dHashUdf = udf((bytes: Array[Byte]) => dHash64(bytes))

  /** (idCol, phash) for every row — the map-side fingerprint pass (a
    * plan-spec'd contract: image bytes never shuffle INSIDE this
    * operator). A caller whose scan is under-partitioned for the decode
    * cost raises parallelism explicitly before calling
    * (Tables.parallelizeScan — see q_image_phash/q_stream_image_dedup). */
  def phashDf(df: DataFrame, bytesCol: String, idCol: String): DataFrame =
    df.select(col(idCol), dHashUdf(col(bytesCol)).as("phash"))

  private def bandKey(phash: Column, j: Int, bandBits: Int): Column =
    shiftrightunsigned(phash, j * bandBits).bitwiseAND(lit((1L << bandBits) - 1))

  /** Near-duplicate pairs (id_a < id_b, hamming ≤ maxHamming) from a
    * (idCol, phash) frame. Recall-complete for `maxHamming ≤ bands - 1`
    * (enforced); `maxBucketSize` caps degenerate buckets loudly-skippable
    * BEFORE the pair cartesian, same contract as the MinHash path. */
  def nearDupPairs(hashes: DataFrame, idCol: String,
      maxHamming: Int = 3, bands: Int = 4, maxBucketSize: Int = 10000): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxHamming < bands,
      s"recall guarantee needs bands > maxHamming (got bands=$bands, maxHamming=$maxHamming): " +
        s"a pair differing in $maxHamming bits could touch every band")
    val bandBits = 64 / bands
    val banded = hashes.select(col(idCol).as("id"), col("phash"),
        explode(array((0 until bands).map(j =>
          struct(lit(j).as("b"), bandKey(col("phash"), j, bandBits).as("k"))): _*)).as("bk"))
      .select(col("id"), col("phash"), col("bk.b").as("b"), col("bk.k").as("k"))
    val keep = banded.groupBy("b", "k").agg(count(lit(1)).as("__n"))
      .where(col("__n").between(2, maxBucketSize))
      .select("b", "k")
    val kept = banded.join(keep, Seq("b", "k"))
    kept.select(col("b"), col("k"), col("id").as("id_a"), col("phash").as("h_a"))
      .join(kept.select(col("b"), col("k"), col("id").as("id_b"), col("phash").as("h_b")),
        Seq("b", "k"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Arrival-order batch dedup against a persisted hash index — the image
    * side of `Dedup.nearDedupAgainstIndex`: a batch row drops when its
    * dHash is within `maxHamming` of ANY history hash (the index carries
    * (id, phash) only — 16 bytes/image; payloads never re-read) or of a
    * LOWER-id batch sibling (within-batch min-id-wins). Returns the batch
    * survivors with their hashes; the caller appends `survivors.select(id,
    * phash)` to the index. Same banding + bucket-cap discipline as
    * [[nearDupPairs]]. */
  def dedupAgainstIndex(batch: DataFrame, bytesCol: String, idCol: String,
      index: DataFrame, maxHamming: Int = 6, bands: Int = 8,
      maxBucketSize: Int = 10000): DataFrame = {
    val hashes = phashDf(batch, bytesCol, idCol).localCheckpoint(true) // decode once
    require(64 % bands == 0 && maxHamming < bands, "see nearDupPairs contract")
    val bandBits = 64 / bands
    def banded(df: DataFrame, id: String, h: String) =
      df.select(col(id), col(h),
          explode(array((0 until bands).map(j =>
            struct(lit(j).as("b"), bandKey(col(h), j, bandBits).as("k"))): _*)).as("bk"))
        .select(col(id), col(h), col("bk.b").as("b"), col("bk.k").as("k"))
    // ONE unified band join generates both drop legs (r19; previously a
    // capped within-batch self-join plus a separate history join): the
    // batch side probes (history ∪ lower-id under-cap batch siblings).
    // Cap semantics unchanged pair-for-pair — a within-batch pair (a,b)
    // exists iff its shared (b,k) bucket's BATCH count is ≤ maxBucketSize
    // (both endpoints share the bucket, so gating the probe-side row `a`
    // gates the pair exactly as nearDupPairs' keep-gate did; the old ≥2
    // bound is implied by the pair itself), while history candidates stay
    // uncapped exactly as before (the index side never explodes: one
    // probe row per (band, history hash)).
    val bBanded = banded(hashes.select(col(idCol).as("__bid"), col("phash")), "__bid", "phash")
    val overCap = bBanded.groupBy("b", "k").agg(count(lit(1)).as("__n"))
      .where(col("__n") > maxBucketSize).select("b", "k")
    val others = banded(index.select(col(idCol).as("__oid"), col("phash").as("__oh")),
        "__oid", "__oh")
      .withColumn("__hist", lit(true))
      .unionByName(bBanded.join(overCap, Seq("b", "k"), "left_anti")
        .select(col("__bid").as("__oid"), col("phash").as("__oh"), col("b"), col("k"),
          lit(false).as("__hist")))
    val drops = bBanded.join(others, Seq("b", "k"))
      .where((col("__hist") || col("__oid") < col("__bid")) &&
        bit_count(col("phash").bitwiseXOR(col("__oh"))) <= maxHamming)
      .select(col("__bid").as("__drop_id")).distinct()
    hashes.join(drops, col(idCol) === col("__drop_id"), "left_anti")
      .join(batch, Seq(idCol))
  }

  /** One row per input id with its hash and a near-dup group representative
    * (the min id among direct band-neighbors within `maxHamming`, or the id
    * itself). Direct-neighbor grouping, not transitive closure — the
    * standard one-hop image-dedup keep rule; chain-merging belongs to
    * `Dedup.connectedComponents` when needed. */
  def nearDupGroups(df: DataFrame, bytesCol: String, idCol: String,
      maxHamming: Int = 3, bands: Int = 4, maxBucketSize: Int = 10000): DataFrame = {
    val hashes = phashDf(df, bytesCol, idCol).localCheckpoint(true) // decode once: banding + output
    val pairs  = nearDupPairs(hashes, idCol, maxHamming, bands, maxBucketSize)
    // "__nbr_id", not "id": a caller whose id column IS named "id" would
    // otherwise make the join condition ambiguous
    val minNbr = pairs.select(col("id_a").as("__nbr_id"), col("id_b").as("nbr"))
      .union(pairs.select(col("id_b").as("__nbr_id"), col("id_a").as("nbr")))
      .groupBy("__nbr_id").agg(min("nbr").as("__min_nbr"))
    hashes.join(minNbr, col(idCol) === col("__nbr_id"), "left_outer")
      .select(col(idCol), col("phash"),
        least(coalesce(col("__min_nbr"), col(idCol)), col(idCol)).as("rep"))
  }
}
