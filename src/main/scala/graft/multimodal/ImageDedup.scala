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
    * (id_a, id_b, hamming), id_a < id_b, distinct.
    *
    * The signature frame is MATERIALIZED once (localCheckpoint —
    * lineage-truncating, storage reclaimed by the context cleaner when
    * the frame is unreferenced) before it fans out into the banding
    * plan: the capped self-join legitimately re-derives its banded
    * input ~5× (stats, clique sides, star branches — cheap for text,
    * where a signature is a split+hash), but HERE each re-derivation
    * would be a full image-decode pass of the corpus. Measured 2.7s →
    * sub-second at sf0.1 for exactly that reason. */
  def nearDupPairs(media: DataFrame, maxHamming: Int = 3,
      maxBucketSize: Int = 10000, batchSize: Int = 64): DataFrame =
    SimHash.nearDupPairsFromSigs(
      dHash(media, batchSize).filter(col("ok"))
        .select("doc_id", "phash").transform(graft.engine.Materialized.checkpoint),
      "doc_id", "phash", maxHamming, maxBucketSize)

  /** Group width of the planted near-dup structure in
    * [[syntheticPlantedImageTable]]: ids sharing `id / 16` form a group;
    * members `id % 16 < 3` of each group are planted near-dups. */
  val PlantGroup = 16

  /** The 64-bit dHash each row of [[syntheticPlantedImageTable]] decodes
    * to, as pure wrapping-Long arithmetic (so an engine with no image
    * codec — the DuckDB oracle — reproduces it bit for bit):
    *
    *  - background rows (`id % 16 >= 3`): `(id+1) · K mod 2⁶⁴` for an
    *    odd 64-bit constant K — a multiplicative scatter, so DISTINCT
    *    ids give hashes ~32 bits apart (two scatters land within
    *    hamming ≤ 3 only if their id-difference times K hits a ≤3-bit
    *    residue — probability ~2⁻⁴⁴ per pair; no accidental near-dups
    *    at any realistic corpus size);
    *  - planted rows (`id % 16 < 3`): a per-group base scatter
    *    `(2g+1) · K₂ mod 2⁶⁴` (g = id/16; the 2g+1 domain is odd, so it
    *    cannot collide with a background id's scatter pattern) with 0,
    *    1, or 2 group-determined bits flipped — members sit at hamming
    *    1/2/3 of each other, yielding EXACTLY 3 near-dup pairs per
    *    complete group: output grows linearly in corpus size (~3n/16),
    *    the shape a real near-dup corpus has. (The previous gradient
    *    corpus admitted only 256 distinct images, making the TRUE
    *    answer quadratic — a bench pathology no banding could fix.)
    */
  private[multimodal] def plantedHash(id: Long): Long = {
    val m = (id % PlantGroup).toInt
    val g = id / PlantGroup
    if (m < 3) {
      val base = (2 * g + 1) * 0xC2B2AE3D27D4EB4FL
      m match {
        case 0 => base
        case 1 => base ^ (1L << (g % 64))
        case _ => base ^ (1L << ((g + 7) % 64)) ^ (1L << ((g + 23) % 64))
      }
    } else (id + 1) * 0x9E3779B97F4A7C15L
  }

  /** Deterministic REAL-image table for the oracle face: one 9×8
    * grayscale PNG per row whose decoded dHash is EXACTLY
    * [[plantedHash]] — each row of the grid starts at luminance 128 and
    * steps ±5 per target bit (bit y·8+x set ⇒ lum(x+1,y) = lum(x,y)+5),
    * so the gradient comparison recovers the bit. r = g = b keeps the
    * Rec.601 luminance equal to the ramp value, PNG is lossless, and the
    * grid is already 9×8 (no resample), so the whole encode→decode→hash
    * path is integer arithmetic the DuckDB oracle computes with no
    * codec — [[dHash]]'s oracle-checkable face (q_image_phash /
    * q_image_neardup), the dedup sibling of
    * [[Binary.syntheticImageTable]]. */
  def syntheticPlantedImageTable(df: DataFrame, idCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.grouped(batchSize).flatMap { batch =>
          batch.map { id =>
            val h = plantedHash(id)
            val im = new java.awt.image.BufferedImage(GridW, GridH,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < GridH) {
              var v = 128
              im.setRGB(0, y, (v << 16) | (v << 8) | v)
              var x = 0
              while (x < GridW - 1) {
                v += (if (((h >>> (y * 8 + x)) & 1L) == 1L) 5 else -5)
                im.setRGB(x + 1, y, (v << 16) | (v << 8) | v)
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
