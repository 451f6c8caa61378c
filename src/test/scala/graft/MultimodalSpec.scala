package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import graft.pipeline.Multimodal
import graft.pipeline.Multimodal.Codecs

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "abc", "src0", "en"),
    (1L, "hello world", "src1", "en"),
    (2L, "日本語", "src2", "zh"))
    .toDF("doc_id", "text", "source", "lang")

  private def cyc(bytes: Array[Int], p: Int): Long =
    (0 until p).map(j => bytes(j % bytes.length).toLong).sum

  test("media table carries REAL format payloads, kind by doc_id") {
    val rows = Multimodal.mediaTable(docs).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    val bmp = byId(0L).getAs[Array[Byte]]("payload")
    val wav = byId(1L).getAs[Array[Byte]]("payload")
    val vid = byId(2L).getAs[Array[Byte]]("payload")
    assert(byId(0L).getAs[String]("kind") == "image" && bmp(0) == 'B' && bmp(1) == 'M')
    assert(byId(1L).getAs[String]("kind") == "audio" &&
      new String(wav, 0, 4, "US-ASCII") == "RIFF")
    assert(byId(2L).getAs[String]("kind") == "video" &&
      new String(vid, 0, 4, "US-ASCII") == "GVF1")
  }

  test("BMP decoder round-trips files written by the INDEPENDENT ImageIO encoder") {
    // javax.imageio writes real bottom-up 24-bit BMPs — if our parser gets
    // the header, stride, row order, or BGR channel order wrong, the
    // pixel-for-pixel compare fails
    for ((w, h) <- Seq((13, 7), (16, 9), (1, 5), (31, 2))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 37 + y) % 256 << 16) | ((y * 53 + x) % 256 << 8) | ((x * y + 11) % 256))
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "bmp", baos))
      val dec = Codecs.decodeBmp(baos.toByteArray)
      assert(dec.width == w && dec.height == h && dec.channels == 3)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        val d = (y * w + x) * 3
        assert((dec.pixels(d) & 0xff) == ((argb >> 16) & 0xff), s"R at ($x,$y) ${w}x$h")
        assert((dec.pixels(d + 1) & 0xff) == ((argb >> 8) & 0xff), s"G at ($x,$y)")
        assert((dec.pixels(d + 2) & 0xff) == (argb & 0xff), s"B at ($x,$y)")
      }
    }
  }

  test("BMP decoder handles top-down (negative height) storage identically") {
    val w = 11; val h = 6
    val rgb = Array.tabulate(w * h * 3)(j => ((j * 29 + 3) % 256).toByte)
    val up = Codecs.decodeBmp(Codecs.encodeBmp24(w, h, rgb))
    val down = Codecs.decodeBmp(Codecs.encodeBmp24(w, h, rgb, topDown = true))
    assert(up.pixels.sameElements(rgb))
    assert(down.pixels.sameElements(rgb))
  }

  test("WAV decoder round-trips files written by the INDEPENDENT javax.sound encoder") {
    val samples = Array.tabulate(777)(i => ((i * 131 - 40000) % 32768).toShort)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val data = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      data(2 * i) = samples(i).toByte
      data(2 * i + 1) = (samples(i) >> 8).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val dec = Codecs.decodeWav(baos.toByteArray)
    assert(dec.sampleRate == 8000 && dec.channels == 1)
    assert(dec.samples.sameElements(samples)) // negatives included
  }

  test("feature extraction decodes geometry and content checksums") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.mediaTable(docs))
      .collect().map(f => f.doc_id -> f).toMap
    // image: "abc" -> n=3, w=8+3%24=11, h=max(1,min(40,3/33))=1
    val f0 = feats(0L)
    val ab = "abc".getBytes("UTF-8").map(_ & 0xff)
    assert(f0.width == 11 && f0.height == 1 && f0.channels == 3)
    assert(f0.n_bytes == 54 + ((3 * 11 + 3) / 4) * 4 * 1)
    assert(f0.checksum == cyc(ab, 3 * 11 * 1))
    // audio: "hello world" -> 11 samples of the byte values
    val f1 = feats(1L)
    val hw = "hello world".getBytes("UTF-8").map(_ & 0xff)
    assert(f1.width == 11 && f1.height == 1 && f1.channels == 1)
    assert(f1.n_bytes == 44 + 2 * 11)
    assert(f1.checksum == hw.sum.toLong)
    // video: 9 UTF-8 bytes -> w=8+9%16=17, h=8+27%16=19, f=1+9%5=5
    val f2 = feats(2L)
    val jp = "日本語".getBytes("UTF-8").map(_ & 0xff)
    assert(f2.width == 17 && f2.height == 19)
    assert(f2.n_bytes == 16 + 3 * 17 * 19 * 5)
    assert(f2.checksum == cyc(jp, 3 * 17 * 19 * 5))
    // determinism
    val again = Multimodal.extractFeatures(spark, Multimodal.mediaTable(docs))
      .collect().map(f => f.doc_id -> f).toMap
    assert(again == feats)
  }

  test("resize dims fit within 256 preserving aspect, never below 1") {
    assert(Multimodal.resizeDims(512, 256) == (256L, 128L))
    assert(Multimodal.resizeDims(100, 400) == (64L, 256L))
    assert(Multimodal.resizeDims(1, 10000) == (1L, 256L))
  }

  test("nearest-neighbor resample matches an independent per-pixel model") {
    val w = 19; val h = 7; val rw = 45; val rh = 13
    val rgb = Array.tabulate(w * h * 3)(j => ((j * 17 + 5) % 256).toByte)
    val got = Multimodal.resampleNearest(rgb, w, h, rw, rh)
    for (y <- 0 until rh; x <- 0 until rw; c <- 0 until 3) {
      val sx = x * w / rw
      val sy = y * h / rh
      assert(got((y * rw + x) * 3 + c) == rgb((sy * w + sx) * 3 + c),
        s"pixel ($x,$y) channel $c")
    }
    // the registered query's resized_checksum covers this raster
    val feats = Multimodal.extractFeatures(spark, Multimodal.mediaTable(docs))
      .collect().map(f => f.doc_id -> f).toMap
    val f0 = feats(0L) // 11x1 scales by 256/11 -> 256x23
    val (rw0, rh0) = Multimodal.resizeDims(11, 1)
    assert((f0.resized_width, f0.resized_height) == (rw0, rh0))
    val ab = "abc".getBytes("UTF-8").map(_ & 0xff)
    val src = Array.tabulate(11 * 1 * 3)(j => ab(j % 3))
    val model = (for (y <- 0 until rh0.toInt; x <- 0 until rw0.toInt; c <- 0 until 3)
      yield src(((y * 1 / rh0.toInt) * 11 + x * 11 / rw0.toInt) * 3 + c).toLong).sum
    assert(f0.resized_checksum == model)
  }

  test("dHash is invariant under BMP storage variants and tolerant of " +
      "small perturbations; distinct rasters differ") {
    val w = 24; val h = 16
    val rgb = Array.tabulate(w * h * 3)(j => ((j * j * 31 + j * 7 + 3) % 256).toByte)
    val base = Multimodal.dHash(rgb, 0, w, h)
    // same raster, both physical BMP storages -> decoded pixels identical
    // -> same hash (a row-order or stride bug would flip rows and bits)
    val bu = Codecs.decodeBmp(Codecs.encodeBmp24(w, h, rgb, topDown = false))
    val td = Codecs.decodeBmp(Codecs.encodeBmp24(w, h, rgb, topDown = true))
    assert(Multimodal.dHash(bu.pixels, 0, w, h) == base)
    assert(Multimodal.dHash(td.pixels, 0, w, h) == base)
    // perceptual, not a checksum: a one-pixel change off the sampling grid
    // leaves the hash untouched; a uniform brightness shift (+10 on every
    // channel, clamped-free range) preserves all gradient signs
    val oneOff = rgb.clone(); oneOff((5 * w + 5) * 3) = (oneOff((5 * w + 5) * 3) + 1).toByte
    val bright = rgb.map(b => math.min(245, b & 0xff).toByte).map(b => (b + 10).toByte)
    val dimmed = rgb.map(b => math.min(245, b & 0xff).toByte)
    assert(java.lang.Long.bitCount(Multimodal.dHash(oneOff, 0, w, h) ^ base) <= 2)
    assert(Multimodal.dHash(bright, 0, w, h) == Multimodal.dHash(dimmed, 0, w, h))
    // a genuinely different raster lands far away
    val other = Array.tabulate(w * h * 3)(j => ((j * 131 + 17) % 256).toByte)
    assert(java.lang.Long.bitCount(Multimodal.dHash(other, 0, w, h) ^ base) > 8)
  }

  test("waveform hash matches an independent per-bit model and survives " +
      "amplitude scaling") {
    val n = 997
    val s = Array.tabulate(n)(i =>
      (2000 * math.sin(i / 7.0) + 500 * math.sin(i / 3.0)).toShort)
    val got = Multimodal.waveformHash(s)
    var want = 0L
    for (i <- 0 until 64)
      if (s(((i + 1).toLong * n / 65).toInt) > s((i.toLong * n / 65).toInt))
        want |= 1L << i
    assert(got == want)
    // delta signs survive positive amplitude scaling (half volume)
    assert(Multimodal.waveformHash(s.map(v => (v / 2).toShort)) == got)
  }

  test("perceptual pairs: exact-duplicate payloads pair at hamming 0; " +
      "kinds never cross-pair") {
    // doc ids chosen so 9/12 are images (id % 3 == 0) with identical
    // text -> byte-identical payloads; 10/13 are audio with unrelated text
    val dup = Seq(
      (9L, "the quick brown fox jumps over the lazy dog again and again", "s", "en"),
      (12L, "the quick brown fox jumps over the lazy dog again and again", "s", "en"),
      (10L, "completely different content that shares nothing at all here", "s", "en"),
      (13L, "totally other words with no overlap whatsoever in any form!!", "s", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val hashes = Multimodal.perceptualHashes(spark, Multimodal.mediaTable(dup))
      .toDF().select(col("kind"), col("doc_id"), col("phash").as("sig"))
    val pairs = graft.pipeline.Dedup.bandedHammingPairs(
      hashes, maxHamming = 3, bands = 4, bandBits = 16,
      partitionCols = Seq("kind")).collect()
    // 9/12 share a kind (both doc_id % 3 == 0 -> image) and identical text
    assert(pairs.exists(r => r.getAs[Long]("doc_a") == 9L &&
      r.getAs[Long]("doc_b") == 12L && r.getAs[Long]("hamming") == 0L))
    // no pair may span two kinds
    val kindOf = Multimodal.perceptualHashes(spark, Multimodal.mediaTable(dup))
      .collect().map(p => p.doc_id -> p.kind).toMap
    assert(pairs.forall(r =>
      kindOf(r.getAs[Long]("doc_a")) == kindOf(r.getAs[Long]("doc_b"))))
  }

  test("quarantine split: corruption families get the predicted verdicts " +
      "and the accepted side decodes end-to-end") {
    val many = (0L until 24L).map(i => (i, s"text body number $i with some length", "s", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val media = Multimodal.mediaTable(many)
    val split = Multimodal.quarantineSplit(spark, Multimodal.corruptMedia(spark, media))
      .collect().map(v => v.doc_id -> v).toMap
    for (i <- 0L until 24L) {
      val v = split(i)
      (i % 4) match {
        case 0 => assert(!v.quarantined && v.reason == "ok", s"doc $i: $v")
        case 1 => assert(v.quarantined && v.reason == "bad_magic", s"doc $i: $v")
        case 2 => assert(v.quarantined && v.reason == "truncated", s"doc $i: $v")
        case _ => assert(v.quarantined && v.reason == "bad_magic", s"doc $i: $v")
      }
    }
    // the accepted side must survive BOTH downstream decode passes
    val good = Multimodal.goodMedia(spark, Multimodal.corruptMedia(spark, media))
    assert(Multimodal.extractFeatures(spark, good).count() == 6L)
    assert(Multimodal.perceptualHashes(spark, good).count() == 6L)
    // and equal the intact rows' features bit-for-bit (corruption of OTHER
    // rows must not perturb surviving rows)
    val intact = Multimodal.extractFeatures(spark,
      media.where(col("doc_id") % 4 === 0)).collect().map(_.toString).sorted
    val survived = Multimodal.extractFeatures(spark, good)
      .collect().map(_.toString).sorted
    assert(survived.toSeq == intact.toSeq)
  }

  test("decode verdict is total over hostile bytes: targeted overflow / " +
      "negative-geometry payloads and seeded random fuzz never throw, " +
      "and accept implies downstream decode succeeds") {
    def i32(v: Int): Array[Byte] =
      Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def bmpWith(width: Int, height: Int, off: Int = 54,
                body: Int = 64): Array[Byte] = {
      val b = new Array[Byte](54 + body)
      b(0) = 'B'; b(1) = 'M'
      i32(off).copyToArray(b, 10); i32(40).copyToArray(b, 14)
      i32(width).copyToArray(b, 18); i32(height).copyToArray(b, 22)
      b(26) = 1; b(28) = 24
      b
    }
    // int-overflow geometry: stride*height overflows 32-bit but must not
    // slip the length require (pre-r11 this could reach a garbage-sized
    // raster allocation)
    assert(Multimodal.decodeVerdict("image", bmpWith(0x20000000, 8))
      == Some("truncated"))
    assert(Multimodal.decodeVerdict("image", bmpWith(3, 0x7fffffff))
      == Some("truncated"))
    assert(Multimodal.decodeVerdict("image", bmpWith(40000, 40000))
      == Some("truncated"))
    // Int.MinValue height: abs() is still negative — rejected as geometry
    assert(Multimodal.decodeVerdict("image", bmpWith(4, Int.MinValue))
      == Some("unsupported"))
    assert(Multimodal.decodeVerdict("image", bmpWith(4, 4, off = -100))
      == Some("unsupported"))
    assert(Multimodal.decodeVerdict("image", bmpWith(0, 4))
      == Some("unsupported"))
    // WAV declaring a giant / negative data chunk
    val wav = Codecs.encodeWavPcm16Mono(8000, Array[Short](1, 2, 3))
    val wavHuge = wav.clone(); i32(0x7fffffff).copyToArray(wavHuge, 40)
    assert(Multimodal.decodeVerdict("audio", wavHuge) == Some("truncated"))
    val wavNeg = wav.clone(); i32(-8).copyToArray(wavNeg, 40)
    assert(Multimodal.decodeVerdict("audio", wavNeg) == Some("truncated"))
    // GVF1 negative frame count / overflowing product
    val vid = Codecs.encodeGvid(2, 2, 1, _ => 0)
    val vidNeg = vid.clone(); i32(-1).copyToArray(vidNeg, 12)
    assert(Multimodal.decodeVerdict("video", vidNeg) == Some("unsupported"))
    val vidBig = vid.clone(); i32(0x40000000).copyToArray(vidBig, 4)
    assert(Multimodal.decodeVerdict("video", vidBig) == Some("truncated"))
    // degenerate sizes — and the batch (decodeVerdict) vs streaming
    // (checkedPHash) boundary must agree on them REASON-FOR-REASON,
    // null payload included (r12 ADVICE flagged a suspected divergence
    // here; this pins that the two paths share one verdict)
    for (kind <- Seq("image", "audio", "video");
         p <- Seq(Array.emptyByteArray, null, Array[Byte](1, 2, 3))) {
      val batch = Multimodal.decodeVerdict(kind, p)
      assert(batch.isDefined)
      assert(Multimodal.checkedPHash(kind, p) == Left(batch.get),
        s"batch/streaming verdict drift for kind=$kind payload=$p")
    }
    // seeded random fuzz: totality, and accept => full decode succeeds
    val rnd = new scala.util.Random(0xC0FFEE)
    var accepted = 0
    for (_ <- 0 until 2000) {
      val b = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(b)
      // half the trials get a plausible magic to push past the first gate
      if (b.length >= 16 && rnd.nextBoolean()) {
        val magic = rnd.nextInt(3) match {
          case 0 => "BM"
          case 1 => "RIFF"
          case _ => "GVF1"
        }
        magic.getBytes("US-ASCII").copyToArray(b, 0)
        if (magic == "RIFF" && b.length >= 12)
          "WAVE".getBytes("US-ASCII").copyToArray(b, 8)
      }
      for (kind <- Seq("image", "audio", "video")) {
        val v = Multimodal.decodeVerdict(kind, b) // must not throw
        if (v.isEmpty) {
          accepted += 1
          kind match { // accept means the REAL decode runs clean
            case "image" => Codecs.decodeBmp(b)
            case "audio" => Codecs.decodeWav(b)
            case _       => Codecs.decodeGvidHeader(b)
          }
        }
      }
    }
    assert(accepted >= 0) // totality is the assertion; accepts are rare
  }

  test("frame sampling parses the GVF1 container with per-frame checksums") {
    val frames = Multimodal.sampleFrames(spark, Multimodal.mediaTable(docs))
      .collect().sortBy(f => (f.doc_id, f.frame_idx))
    assert(frames.forall(_.doc_id == 2L))
    val jp = "日本語".getBytes("UTF-8").map(_ & 0xff)
    val fb = 3 * 17 * 19
    assert(frames.map(_.frame_idx).toSeq == (0L until 5L))
    assert(frames.map(_.offset_bytes).toSeq == (0 until 5).map(f => 16L + f.toLong * fb))
    for (f <- 0 until 5)
      assert(frames(f).frame_checksum == cyc(jp, (f + 1) * fb) - cyc(jp, f * fb),
        s"frame $f")
  }
}
