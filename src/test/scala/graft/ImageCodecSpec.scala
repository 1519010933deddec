package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** The real-codec multimodal leg: planted BMPs round-trip through JDK
  * ImageIO pixels-true, and the operator's pooled output equals the
  * closed-form computation.
  */
class ImageCodecSpec extends GraftSpec {

  private def pixel(id: Long, x: Int, y: Int): Int =
    ((3L * x + 5L * y + id) % 256L).toInt

  test("BMP encode -> ImageIO decode returns the exact planted pixels") {
    Seq(0L, 1L, 7L, 123L, 499L).foreach { id =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.plantedBmp(id)))
      val w = (16L * (1L + (id * 7 + 3) % 8)).toInt
      val h = (16L * (1L + (id * 5 + 1) % 8)).toInt
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xFF) == pixel(id, x, y),
          s"doc $id pixel ($x,$y)")
    }
  }

  test("BMP bytes are deterministic across encodes (byte-stable format)") {
    Seq(3L, 42L).foreach { id =>
      assert(java.util.Arrays.equals(
        Multimodal.plantedBmp(id), Multimodal.plantedBmp(id)))
    }
  }

  test("per-thread codec == ImageIO convenience path, byte- and " +
      "pixel-identical (the r13 reader/writer reuse)") {
    def mkImg(id: Long): java.awt.image.BufferedImage = {
      val w = 32; val h = 48
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((3L * x + 5L * y + id) % 256L).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    Seq(0L, 17L, 123L).foreach { id =>
      // encode: reused writer bytes == ImageIO.write bytes on the
      // same BufferedImage instance
      val img = mkImg(id)
      val viaHelper = Multimodal.encodeBmp(img)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos)
      assert(java.util.Arrays.equals(viaHelper, bos.toByteArray),
        s"doc $id: encodeBmp bytes differ from ImageIO.write")
      // decode: reused reader pixels == ImageIO.read pixels
      val a = Multimodal.decodeBmp(viaHelper)
      val b = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(viaHelper))
      assert(a.getWidth == b.getWidth && a.getHeight == b.getHeight)
      for (y <- 0 until a.getHeight; x <- 0 until a.getWidth)
        assert(a.getRGB(x, y) == b.getRGB(x, y), s"doc $id ($x,$y)")
    }
    // reuse across many calls on one thread stays correct (state reset)
    val first = Multimodal.decodeBmp(Multimodal.plantedBmp(7L))
    (0 until 50).foreach(_ => Multimodal.decodeBmp(Multimodal.plantedBmp(7L)))
    val last = Multimodal.decodeBmp(Multimodal.plantedBmp(7L))
    assert(first.getWidth == last.getWidth)
    for (y <- 0 until first.getHeight; x <- 0 until first.getWidth)
      assert(first.getRGB(x, y) == last.getRGB(x, y))
  }

  test("mm_image_resize == closed-form pooling (real decode, no stub)") {
    val out = Multimodal.mmImageResize(spark, sf)
      .where(col("doc_id") < 20).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = (16L * (1L + (id * 7 + 3) % 8)).toInt
      val h = (16L * (1L + (id * 5 + 1) % 8)).toInt
      var sum = 0L
      for (y <- 0 until h / 2; x <- 0 until w / 2)
        sum += (pixel(id, 2 * x, 2 * y) + pixel(id, 2 * x + 1, 2 * y) +
          pixel(id, 2 * x, 2 * y + 1) + pixel(id, 2 * x + 1, 2 * y + 1)) / 4
      assert(r.getAs[Long]("width") == w && r.getAs[Long]("height") == h)
      assert(r.getAs[Long]("out_w") == w / 2 &&
        r.getAs[Long]("out_h") == h / 2)
      assert(r.getAs[Long]("checksum") == sum % 65536L, s"doc $id")
    }
  }

  test("mm_shot_boundaries (#267, pixels-true): detected cuts equal " +
      "the PLANTED cuts exactly, and hammings match a closed-form " +
      "per-frame phash recompute") {
    def framePhash(id: Long, f: Int): Array[Int] = {
      val s = Multimodal.plantedFrameShift(id, f)
      val bs = new Array[Long](64)
      var tot = 0L
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = (3L * x + 5L * y + id + s) % 256L
        bs((y / 4) * 8 + x / 4) += v
        tot += v
      }
      bs.map(b => if (b * 64 > tot) 1 else 0)
    }
    val out = graft.operators.Summit.mmShotBoundaries(spark, sf).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nf = Multimodal.plantedFrameCount(id)
      val plantedCuts = (1 until nf).count(f => (id + f) % 3 == 0)
      val hams = (1 until nf).map { f =>
        framePhash(id, f).zip(framePhash(id, f - 1))
          .count { case (a, b) => a != b }
      }
      assert(r.getAs[Long]("n_frames") == nf.toLong, s"doc $id frames")
      // detection == planted ground truth (separation is total:
      // within-shot <= 3, cuts >= 45 against the 16 threshold)
      assert(r.getAs[Long]("n_shots") == plantedCuts + 1L,
        s"doc $id shots")
      assert(r.getAs[Long]("max_hamming") == hams.max.toLong,
        s"doc $id hamming")
      assert(hams.count(_ > 16) == plantedCuts, s"doc $id separation")
    }
    // the corpus plants real multi-shot videos
    assert(out.exists(_.getAs[Long]("n_shots") >= 3L))
  }

  test("mm_feature_extract (#50, pixels-true): features match a " +
      "closed-form pixel recomputation on sampled docs") {
    val out = Multimodal.mmFeatureExtract(spark, sf)
      .where(col("doc_id") % 25 === 0).collect()
    assert(out.nonEmpty)
    def p4d(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = (16L * (1L + (id * 7 + 3) % 8)).toInt
      val h = (16L * (1L + (id * 5 + 1) % 8)).toInt
      val n = (w * h).toLong
      val hist = new Array[Long](256)
      var sum = 0L
      var high = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((3L * x + 5L * y + id) % 256L).toInt
        hist(v) += 1; sum += v; if (v >= 128) high += 1
      }
      val coll = hist.map(c => c * c).sum
      assert(r.getAs[Long]("n_px") == n)
      assert(r.getAs[Double]("mean_px") == p4d(sum.toDouble / n))
      assert(r.getAs[Double]("frac_high") == p4d(high.toDouble / n))
      assert(r.getAs[Double]("collision_prob") ==
        p4d(coll.toDouble / (n * n)), s"doc $id collision")
    }
  }

  test("mm_frame_sample (#51, pixels-true): exactly one keyframe per " +
      "DETECTED shot — which equals the planted shot structure — with " +
      "true-pixel checksums; sampling is per-shot, not fixed-stride") {
    val out = graft.operators.Multimodal.mmFrameSample(spark, sf)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(out.size == 500)
    var sawUnevenSpacing = false
    out.foreach { case (id, rows) =>
      val nf = Multimodal.plantedFrameCount(id)
      // planted shot starts: frame 0 plus every (id + f) % 3 == 0 cut
      val expectedStarts = 0L +:
        (1 until nf).collect {
          case f if (id + f) % 3 == 0 => f.toLong
        }
      val got = rows.sortBy(_.getAs[Long]("shot_idx"))
      assert(got.map(_.getAs[Long]("frame_idx")).toSeq ==
        expectedStarts, s"doc $id keyframes")
      assert(got.map(_.getAs[Long]("shot_idx")).toSeq ==
        expectedStarts.indices.map(_.toLong), s"doc $id shot ids")
      got.foreach { r =>
        val f = r.getAs[Long]("frame_idx").toInt
        val s = Multimodal.plantedFrameShift(id, f)
        var total = 0L
        for (y <- 0 until 32; x <- 0 until 32)
          total += (3L * x + 5L * y + id + s) % 256L
        assert(r.getAs[Long]("checksum") == total % 65536L,
          s"doc $id frame $f checksum")
      }
      val gaps = expectedStarts.sliding(2).collect {
        case Seq(a, b) => b - a
      }.toSeq
      if (gaps.distinct.size > 1) sawUnevenSpacing = true
    }
    assert(sawUnevenSpacing,
      "keyframe spacing should follow shots, not a fixed stride")
  }
}
