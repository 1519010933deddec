package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** The samples-true audio leg (#317): the planted WAV is a REAL RIFF
  * container and the decode path recovers every sample exactly.
  */
class AudioCodecSpec extends GraftSpec {

  test("plantedWav is a genuine RIFF/WAVE container and the JDK " +
      "decoder recovers the closed-form samples byte-exactly") {
    Seq(0L, 7L, 123L, 4999L).foreach { id =>
      val wav = Multimodal.plantedWav(id)
      assert(new String(wav.take(4), "US-ASCII") == "RIFF")
      assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
      val n = (512L + (id * 13 + 7) % 512).toInt
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      assert(ais.getFormat.getSampleSizeInBits == 8)
      assert(ais.getFrameLength == n.toLong)
      val s = ais.readAllBytes()
      assert(s.length == n)
      var i = 0
      while (i < n) {
        assert((s(i) & 0xff) == ((5L * i + id) % 256L).toInt,
          s"doc $id sample $i")
        i += 1
      }
    }
  }

  test("per-thread WAVE codec == AudioSystem path, byte- and " +
      "sample-identical (the r13 provider reuse)") {
    Seq(0L, 42L, 321L).foreach { id =>
      // encode: plantedWav (ThreadLocal writer inside) must equal an
      // AudioSystem.write of the same samples
      val viaHelper = Multimodal.plantedWav(id)
      val n = (512L + (id * 13 + 7) % 512).toInt
      val data = Array.tabulate[Byte](n)(i => ((5L * i + id) % 256L).toByte)
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1,
        false, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      assert(java.util.Arrays.equals(viaHelper, bos.toByteArray),
        s"doc $id: ThreadLocal WAVE writer bytes differ from AudioSystem")
      // decode: cached-provider selection == AudioSystem selection
      val a = Multimodal.decodeAudio(viaHelper)
      val b = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(viaHelper))
      assert(a.getFormat.toString == b.getFormat.toString)
      assert(java.util.Arrays.equals(a.readAllBytes(), b.readAllBytes()),
        s"doc $id: decoded samples differ")
    }
  }

  test("mm_audio_pcm_energy: sampled docs match a closed-form energy " +
      "recomputation; frame accounting is exact") {
    val out = Multimodal.mmAudioPcmEnergy(spark, sf).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = 512L + (id * 13 + 7) % 512
      assert(r.getAs[Long]("n_samples") == n)
      assert(r.getAs[Long]("n_frames") == n / 128)
      assert(r.getAs[Long]("max_frame_energy") <=
        r.getAs[Long]("total_energy"))
      assert(r.getAs[Long]("peak_frame") < r.getAs[Long]("n_frames"))
      if (id % 50 == 0) {
        def samp(i: Long): Int = ((5 * i + id) % 256).toInt
        val frames = (n / 128).toInt
        var total = 0L
        var maxE = -1L
        var peak = -1L
        for (f <- 0 until frames) {
          var e = 0L
          for (i <- (f * 128).toLong until (f * 128 + 128).toLong) {
            val c = samp(i) - 128
            e += c.toLong * c
          }
          total += e
          if (e > maxE) { maxE = e; peak = f }
        }
        var zc = 0L
        for (i <- 1L until n)
          if ((samp(i - 1) < 128) != (samp(i) < 128)) zc += 1
        assert(r.getAs[Long]("total_energy") == total, s"doc $id energy")
        assert(r.getAs[Long]("max_frame_energy") == maxE)
        assert(r.getAs[Long]("peak_frame") == peak.toLong)
        assert(r.getAs[Long]("zero_crossings") == zc)
      }
    }
  }

  test("mm_audio_vad (#272, samples-true): per-doc segments match a " +
      "direct decoded-sample recomputation, and the corpus exercises " +
      "REAL multi-frame voiced runs") {
    val out = graft.operators.Summit.mmAudioVad(spark, sf).collect()
    assert(out.length == 500)
    var sawRunGe2 = false
    var sawUnvoiced = false
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = (512L + (id * 13 + 7) % 512).toInt
      def samp(i: Int): Long = (5L * i + id) % 256L
      val frames = n / 100
      val v = (0 until frames).map { f =>
        (f * 100 until f * 100 + 100).map(samp).sum > 100L * 128L
      }
      var cur = 0L; var best = 0L; var nseg = 0L; var prev = false
      v.foreach { x =>
        if (x) { cur += 1; best = math.max(best, cur) } else cur = 0
        if (x && !prev) nseg += 1
        prev = x
      }
      assert(r.getAs[Long]("n_frames") == frames.toLong, s"doc $id frames")
      assert(r.getAs[Long]("n_voiced") == v.count(identity).toLong,
        s"doc $id voiced")
      assert(r.getAs[Long]("n_segments") == nseg, s"doc $id segments")
      assert(r.getAs[Long]("longest_run") == best, s"doc $id run")
      if (best >= 2) sawRunGe2 = true
      if (v.exists(!_)) sawUnvoiced = true
    }
    // the island merge must be genuinely exercised, not decorative
    assert(sawRunGe2, "no doc produced a multi-frame voiced run")
    assert(sawUnvoiced)
  }
}
