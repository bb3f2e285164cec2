package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.SimHash

/** Image near-duplicate detection — perceptual difference-hash (dHash)
  * over REAL decoded pixels, then the shared 64-bit Hamming banding.
  *
  * The image-side twin of text SimHash (D3): a corpus of re-encoded /
  * resized / lightly-edited copies of the same picture dedups by pixel
  * structure, not by byte equality — byte-level exact dedup misses every
  * re-encode. dHash is the standard cheap perceptual hash: downsample to
  * a 9×8 grayscale grid (area averaging kills high-frequency detail, so
  * compression artifacts wash out), then one bit per horizontally
  * adjacent pixel pair — brightness GRADIENTS survive resize/re-encode
  * while absolute levels don't.
  *
  * Scale shape: hashing is one batched map-side decode pass (same
  * partition-iterator shape as [[Binary.decodeImageMeta]]); candidate
  * pairing reuses [[SimHash.nearDupPairsFromSigs]] — the 3-of-6 block
  * pigeonhole tables, capped buckets, and fused Hamming verify are
  * hash-agnostic, so images ride the exact machinery the text path
  * proved at 50×/100×. Nothing wider than (id, table key) ever shuffles;
  * pixels never leave their scan.
  */
object ImageDedup {

  /** dHash grid: 9 columns × 8 rows → 8 comparisons per row × 8 rows =
    * 64 bits. Bit (y·8 + x) is set iff lum(x+1, y) > lum(x, y). */
  val GridW = 9
  val GridH = 8

  /** Integer luminance (the Rec.601 weights over 1000 — exact integer
    * arithmetic, so an engine with no codec can reproduce it). */
  private def lum(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  private[multimodal] def dHashOf(im: java.awt.image.BufferedImage): Long = {
    val grid =
      if (im.getWidth == GridW && im.getHeight == GridH) im
      else {
        val scaled = im.getScaledInstance(GridW, GridH,
          java.awt.Image.SCALE_AREA_AVERAGING)
        val out = new java.awt.image.BufferedImage(GridW, GridH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try g.drawImage(scaled, 0, 0, null) finally g.dispose()
        out
      }
    var hash = 0L
    var y = 0
    while (y < GridH) {
      var x = 0
      while (x < GridW - 1) {
        if (lum(grid.getRGB(x + 1, y)) > lum(grid.getRGB(x, y)))
          hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Per-image dHash over the binary payload column: (doc_id, ok, phash,
    * phash_bits). `phash` packs bit i at 1L << i; `phash_bits` is the
    * same 64 bits as a '0'/'1' string, bit 0 first — the oracle-facing
    * rendering (a 64-char string needs no unsigned-shift parity between
    * engines). Undecodable payloads degrade to ok = false, hash 0 — the
    * corrupt-input contract of [[Binary.decodeImageMeta]]. */
  def dHash(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val img =
              try Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes)))
              catch { case _: java.io.IOException => None }
            img match {
              case Some(im) =>
                val h = dHashOf(im)
                val bits = new StringBuilder(64)
                var i = 0
                while (i < 64) { bits.append(if (((h >>> i) & 1L) == 1L) '1' else '0'); i += 1 }
                (id, true, h, bits.toString)
              case None => (id, false, 0L, "0" * 64)
            }
          }
        }
      }
      .toDF("doc_id", "ok", "phash", "phash_bits")
  }

  /** Near-duplicate image pairs: dHash + the shared Hamming banding
    * (complete for hamming ≤ 3 by the 3-of-6 pigeonhole). Output
    * (id_a, id_b, hamming), id_a < id_b, distinct. */
  def nearDupPairs(media: DataFrame, maxHamming: Int = 3,
      maxBucketSize: Int = 10000, batchSize: Int = 64): DataFrame =
    SimHash.nearDupPairsFromSigs(
      dHash(media, batchSize).filter(col("ok")), "doc_id", "phash",
      maxHamming, maxBucketSize)

  /** Deterministic REAL-image table for the oracle face: one 9×8
    * grayscale-gradient PNG per row, luminance(x, y) = (id·31 + x·7 +
    * y·13) mod 256 at every pixel (r = g = b, so the Rec.601 luminance is
    * exactly that value). Real bytes through the real encoder; because
    * PNG is lossless and the grid is already 9×8 (no resample), the
    * decoded dHash is plain integer arithmetic an engine with no codec
    * can compute — [[dHash]]'s oracle-checkable face (q_image_phash /
    * q_image_neardup), the dedup sibling of
    * [[Binary.syntheticImageTable]]. */
  def syntheticGradientImageTable(df: DataFrame, idCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.grouped(batchSize).flatMap { batch =>
          batch.map { id =>
            val im = new java.awt.image.BufferedImage(GridW, GridH,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < GridH) {
              var x = 0
              while (x < GridW) {
                val v = math.floorMod(id * 31 + x * 7 + y * 13, 256).toInt
                im.setRGB(x, y, (v << 16) | (v << 8) | v)
                x += 1
              }
              y += 1
            }
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(im, "png", buf)
            (id, buf.toByteArray)
          }
        }
      }
      .toDF("doc_id", "payload")
  }
}
