package graft.multimodal

import graft.SparkSpec
import graft.queries.LlmOps
import org.apache.spark.sql.functions._

class ImageDedupSpec extends SparkSpec {

  private def pngOf(w: Int, h: Int)(lum: (Int, Int) => Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = lum(x, y) & 0xff
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", buf)
    buf.toByteArray
  }

  test("re-encoded clone hashes identically; corrupt payload degrades") {
    import spark.implicits._
    val a = pngOf(9, 8)((x, y) => 20 * x + 5 * y)
    val b = pngOf(9, 8)((x, y) => 20 * x + 5 * y) // independent encode
    val media = Seq((1L, a), (2L, b), (3L, "not a png".getBytes))
      .toDF("doc_id", "payload")
    val rows = ImageDedup.dHash(media).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("ok"), r.getAs[Long]("phash"))).toMap
    assert(rows(1L)._1 && rows(2L)._1 && !rows(3L)._1)
    assert(rows(1L)._2 == rows(2L)._2, "same pixels must hash identically")
  }

  test("a 10x-upscaled copy stays within small hamming; distinct images are far") {
    import spark.implicits._
    def ramp(x: Int, y: Int) = 13 * x + 7 * y
    val small = pngOf(9, 8)(ramp)
    // same picture rendered at 90x80: the resample must recover the
    // gradient structure (dHash's whole point — survive resize/re-encode)
    val big = pngOf(90, 80)((x, y) => ramp(x / 10, y / 10))
    val other = pngOf(9, 8)((x, y) => (x * 41 + y * 97 + (x * y) % 7) * 31)
    val media = Seq((1L, small), (2L, big), (3L, other)).toDF("doc_id", "payload")
    val h = ImageDedup.dHash(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phash")).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(2L)) <= 6,
      s"resized copy drifted ${ham(h(1L), h(2L))} bits")
    assert(ham(h(1L), h(3L)) > 10,
      s"distinct images too close: ${ham(h(1L), h(3L))} bits")
  }

  test("phash_bits string is the long's bits, bit 0 first") {
    import spark.implicits._
    val media = Seq((1L, pngOf(9, 8)((x, y) => 20 * x + 5 * y)))
      .toDF("doc_id", "payload")
    val r = ImageDedup.dHash(media).head()
    val h = r.getAs[Long]("phash")
    val bits = r.getAs[String]("phash_bits")
    assert(bits.length == 64)
    assert((0 until 64).forall(i => (bits(i) == '1') == (((h >>> i) & 1L) == 1L)))
  }

  test("near-dup pairs: exactly the planted triples, linear in corpus size") {
    import spark.implicits._
    val ids = (0L until 320L).toDF("doc_id") // 20 complete groups of 16
    val media = ImageDedup.syntheticPlantedImageTable(ids, "doc_id")
    val pairs = ImageDedup.nearDupPairs(media, maxHamming = 3).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming")))
    // each group of 16 plants members {16g, 16g+1, 16g+2} at pairwise
    // hamming 1/2/3; background scatters must contribute NOTHING
    val expected = (0L until 20L).flatMap { g =>
      val b = 16 * g
      Seq((b, b + 1, 1), (b, b + 2, 2), (b + 1, b + 2, 3))
    }.toSet
    assert(pairs.toSet == expected.map { case (a, b, h) => (a, b, h) },
      s"got ${pairs.length} pairs, expected exactly the ${expected.size} planted")
  }

  test("decoded dHash equals plantedHash for every member kind") {
    import spark.implicits._
    // one background id, one of each planted member, and a bit-63 flip
    // group (g % 64 == 63 exercises the top-bit mask edge)
    val ids = Seq(5L, 16L, 17L, 18L, 63L * 16, 63L * 16 + 1).toDF("doc_id")
    val media = ImageDedup.syntheticPlantedImageTable(ids, "doc_id")
    val got = ImageDedup.dHash(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phash")).toMap
    got.foreach { case (id, h) =>
      assert(h == ImageDedup.plantedHash(id),
        s"id $id decoded hash != arithmetic plantedHash")
    }
  }

  test("over-cap clone bucket degrades to canonical stars") {
    import spark.implicits._
    // 40 byte-identical images: every banding table collapses to one
    // 40-member bucket, far above the cap of 10 — the pair generator
    // must emit the n-1 star pairs on the canonical min id, never the
    // 780-pair clique (the path a real monochrome/logo corpus hits)
    val clone = pngOf(9, 8)((x, y) => 20 * x + 5 * y)
    val media = (0L until 40L).map(i => (i, clone)).toDF("doc_id", "payload")
    val pairs = ImageDedup.nearDupPairs(media, maxHamming = 3, maxBucketSize = 10)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming")))
    val expected = (1L until 40L).map(i => (0L, i, 0)).toSet
    assert(pairs.toSet == expected,
      s"expected ${expected.size} star pairs on id 0, got ${pairs.length}")
  }

  test("q_image_phash / q_image_neardup run on the sf dir") {
    val ph = LlmOps.qImagePhash(spark, sfDir).collect()
    assert(ph.nonEmpty && ph.forall(_.getAs[String]("phash_bits").length == 64))
    val nd = LlmOps.qImageNearDup(spark, sfDir).collect()
    assert(nd.nonEmpty)
    assert(nd.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
  }

  test("image dedup apply (G3k): kept set = all ids minus union-find losers") {
    val kept = LlmOps.qImageDedupApply(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val all = graft.sources.Tables.table(spark, sfDir, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // driver union-find over the face's own (oracle-checked) pair set
    val pairs = LlmOps.qImageNearDup(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val losers = members.filter(m => find(m) != m).toSet
    assert(losers.nonEmpty, "planted corpus must produce clusters")
    assert(kept == all -- losers,
      "apply keeps exactly the canonical member per cluster + untouched rows")
    // planted structure: each 16-id group clusters members m ∈ {0,1,2}
    assert(losers.forall(i => i % 16 == 1 || i % 16 == 2))
  }
}
