package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.multimodal.{Multimodal, PerceptualHash}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  implicit private lazy val sp: SparkSession = spark

  private lazy val media =
    Multimodal.asMedia(Tables.load(spark, sf0001, "documents"), "doc_id", "text")

  test("binary payload preserves utf-8 byte length") {
    val got = media.select(octet_length(col("content")).as("n")).as[Int].collect().sum
    val expected = Tables.load(spark, sf0001, "documents")
      .select(octet_length(col("text")).as("n")).as[Int].collect().sum
    assert(got == expected)
  }

  test("decode stub is deterministic and total") {
    val meta = Multimodal.decode(media)
    assert(meta.count() == 500)
    val m1 = meta.filter(_.id == 7L).head()
    val m2 = Multimodal.decode(media).filter(_.id == 7L).head()
    assert(m1 == m2, "decode must be deterministic")
    assert(m1.width >= 64 && m1.height >= 64)
  }

  // real image bytes, generated in-test by the JDK encoder: decode()
  // must report TRUE dimensions, not the checksum-derived fallback
  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => img.setRGB(x, 0, x * 31))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt encoder")
    out.toByteArray
  }

  test("decode parses real PNG/JPEG/GIF/BMP dimensions") {
    val payloads = Seq(
      (1L, "image/png", imageBytes("png", 640, 480)),
      (2L, "image/jpeg", imageBytes("jpg", 31, 17)),
      (3L, "image/gif", imageBytes("gif", 200, 100)),
      (4L, "image/bmp", imageBytes("bmp", 77, 55)),
      (5L, "text/plain", "just some text".getBytes("UTF-8")))
    val df = payloads.toDF("id", "media_type", "content")
    val got = Multimodal.decode(df).collect().map(m => m.id -> m).toMap
    assert(got(1L).width == 640 && got(1L).height == 480)
    assert(got(1L).mediaType == "image/png")
    assert(got(2L).width == 31 && got(2L).height == 17)
    assert(got(2L).mediaType == "image/jpeg")
    assert(got(3L).width == 200 && got(3L).height == 100)
    assert(got(4L).width == 77 && got(4L).height == 55)
    // non-media payload falls back to checksum-derived stub dims
    assert(got(5L).mediaType == "text/plain")
    assert(got(5L).width >= 64 && got(5L).width < 64 + 1024)
    // byte count and checksum are real for every payload
    payloads.foreach { case (id, _, bytes) =>
      assert(got(id).nBytes == bytes.length)
    }
  }

  test("imageDims rejects truncated and non-image headers") {
    assert(Multimodal.imageDims(Array[Byte](0x89.toByte, 'P', 'N')).isEmpty)
    assert(Multimodal.imageDims("GIF8".getBytes).isEmpty)
    assert(Multimodal.imageDims(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
    assert(Multimodal.imageDims("plain text bytes".getBytes).isEmpty)
    // text starting with the 2-byte BMP magic must NOT parse as BMP
    assert(Multimodal.imageDims(
      "BMW dealers reported record sales this quarter".getBytes).isEmpty)
    // a truncated real PNG (header cut before IHDR payload)
    assert(Multimodal.imageDims(
      imageBytes("png", 10, 10).take(20)).isEmpty)
  }

  // real WAV bytes from the JDK encoder (the audio analog of imageBytes)
  private def wavBytes(rate: Int, channels: Int, nFrames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels, true, false)
    val data = new Array[Byte](nFrames * fmt.getFrameSize)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  // hand-built fLaC STREAMINFO: 44.1 kHz stereo, 88200 total samples
  private def flacBytes: Array[Byte] = {
    val b = new Array[Byte](8 + 34)
    b(0) = 'f'; b(1) = 'L'; b(2) = 'a'; b(3) = 'C'
    b(4) = 0x80.toByte // last-metadata-block flag + type 0 (STREAMINFO)
    b(7) = 34 // block length
    b(18) = 0x0a; b(19) = 0xc4.toByte // sample rate 44100 = 0x0AC44...
    b(20) = (0x40 | (1 << 1)).toByte // ...low nibble 4; channels-1 = 1
    b(23) = 0x01; b(24) = 0x58; b(25) = 0x88.toByte // samples = 0x15888
    b
  }

  test("decodeAudio parses real WAV and FLAC headers; text falls back to the stub") {
    val payloads = Seq(
      (1L, "audio/wav", wavBytes(16000, 2, 16000)), // exactly 1 s stereo
      (2L, "audio/flac", flacBytes),
      (3L, "text/plain", "just some words".getBytes("UTF-8")))
    val df = payloads.toDF("id", "media_type", "content")
    val got = Multimodal.decodeAudio(df).collect().map(m => m.id -> m).toMap
    assert(got(1L).mediaType == "audio/wav")
    assert(got(1L).channels == 2 && got(1L).sampleRate == 16000)
    assert(got(1L).durationMs == 1000L)
    assert(got(2L).mediaType == "audio/flac")
    assert(got(2L).channels == 2 && got(2L).sampleRate == 44100)
    assert(got(2L).durationMs == 2000L)
    // non-audio payload: deterministic stub, still total
    assert(got(3L).mediaType == "text/plain")
    assert(got(3L).channels >= 1 && got(3L).sampleRate >= 8000)
    payloads.foreach { case (id, _, bytes) =>
      assert(got(id).nBytes == bytes.length)
    }
  }

  test("audioMeta rejects truncated and corrupt containers") {
    assert(Multimodal.audioMeta("RIFF".getBytes).isEmpty)
    assert(Multimodal.audioMeta(wavBytes(8000, 1, 100).take(20)).isEmpty)
    assert(Multimodal.audioMeta("fLaC".getBytes).isEmpty)
    assert(Multimodal.audioMeta("plain text, not audio at all".getBytes).isEmpty)
    // corrupt chunk length must end the RIFF walk, not loop or throw
    val bad = wavBytes(8000, 1, 100)
    bad(16) = 0xff.toByte; bad(17) = 0xff.toByte
    bad(18) = 0xff.toByte; bad(19) = 0x7f.toByte
    assert(Multimodal.audioMeta(bad).isEmpty)
  }

  test("resize stub caps the longer side and keeps aspect floor") {
    val resized = Multimodal.resizeStub(Multimodal.decodeStub(media), maxSide = 128)
    resized.collect().foreach { m =>
      assert(math.max(m.width, m.height) <= 128)
      assert(m.width >= 1 && m.height >= 1)
    }
  }

  // ---- perceptual dHash ----

  /** Render a scale-invariant pattern (triangle waves in normalized
    * coordinates) at the given size — resized "copies" of one image. */
  private def patternPng(w: Int, h: Int, phase: Double = 0.0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    for (y <- 0 until h; x <- 0 until w) {
      def tri(u: Double) = math.abs((u * 4 + phase) % 2.0 - 1.0)
      val v = (tri(x.toDouble / w) * 0.7 + tri(y.toDouble / h) * 0.3) * 255
      r.setSample(x, y, 0, math.min(255, math.max(0, v.toInt)))
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash survives a resize: two sizes of one image land close") {
    val big = PerceptualHash.dHash64(patternPng(72, 64)).get
    val small = PerceptualHash.dHash64(patternPng(36, 32)).get
    val near = java.lang.Long.bitCount(big ^ small)
    val other = PerceptualHash.dHash64(patternPng(72, 64, phase = 1.0)).get
    val far = java.lang.Long.bitCount(big ^ other)
    assert(near <= 12, s"resized copy drifted $near bits")
    assert(far > near, s"unrelated image as close as the copy: $far vs $near")
  }

  test("gray+alpha PNGs (2-band rasters) hash instead of silently dropping") {
    // PNG color type 4 decodes to a 2-band raster; band 0 must be read
    // as the luminance, not indexed as RGB
    val cs = java.awt.color.ColorSpace.getInstance(java.awt.color.ColorSpace.CS_GRAY)
    val cm = new java.awt.image.ComponentColorModel(
      cs, true, false, java.awt.Transparency.TRANSLUCENT,
      java.awt.image.DataBuffer.TYPE_BYTE)
    val raster = cm.createCompatibleWritableRaster(9, 8)
    for (y <- 0 until 8; x <- 0 until 9) {
      raster.setSample(x, y, 0, PerceptualHash.plantedPixel(0L, x, y))
      raster.setSample(x, y, 1, 255) // opaque alpha
    }
    val img = new java.awt.image.BufferedImage(cm, raster, false, null)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val ga = PerceptualHash.dHash64(bos.toByteArray)
    assert(ga.nonEmpty, "gray+alpha image failed to hash")
    // and it must equal the plain-gray hash of the same pixels
    assert(ga == PerceptualHash.dHash64(PerceptualHash.plantedPng(0L)),
      "alpha channel changed the luminance hash")
  }

  test("dHash rejects non-images and over-cap payloads cheaply") {
    assert(PerceptualHash.dHash64("just text".getBytes).isEmpty)
    val png = patternPng(18, 16)
    assert(PerceptualHash.dHash64(png, maxDecodeBytes = 10).isEmpty)
    assert(PerceptualHash.dHash64(png).nonEmpty)
  }

  test("planted PNG decode reproduces the pixel-function dHash exactly") {
    // the 9x8 fixture passes through lumaGrid untouched, so the hash
    // must equal the one computed straight from the pixel function —
    // proving the PNG encode/decode roundtrip is lossless end to end
    for (id <- Seq(0L, 1L, 7L, 42L)) {
      val viaPng = PerceptualHash.dHash64(PerceptualHash.plantedPng(id)).get
      val grid = Array.tabulate(8, 9)((y, x) => PerceptualHash.plantedPixel(id, x, y))
      var expected = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (grid(y)(x) < grid(y)(x + 1)) expected |= 1L << (y * 8 + x)
      assert(viaPng == expected, s"id=$id roundtrip drift")
    }
  }

  test("blocked pairs find the planted even/odd near-identical copies") {
    val media = spark.range(0, 40).select(col("id")).as[Long]
      .mapPartitions(_.map(id => (id, "image/png", PerceptualHash.plantedPng(id))))
      .toDF("id", "media_type", "content")
    val pairs = PerceptualHash
      .pairsWithinBlock(media, expr("id div 2"), maxHamming = 8)
      .as[(Long, Long, Int)].collect()
    // every pair-group (2g, 2g+1) must surface, and nothing else can:
    // the block key makes cross-group pairs impossible by construction
    assert(pairs.length == 20, s"expected 20 planted pairs, got ${pairs.length}")
    assert(pairs.forall { case (a, b, hm) => b == a + 1 && a % 2 == 0 && hm <= 8 })
  }

  test("maxBlock cap drops a degenerate all-identical block, keeps the rest") {
    // one flood block of 30 identical images (all map to blk 0 via
    // id div 100) plus two normal pair-groups beyond it: without the
    // cap the flood expands to 435 pairs; with maxBlock = 10 the flood
    // block is dropped whole and ONLY the healthy pairs survive
    val media = spark.range(0, 34).select(col("id")).as[Long]
      .mapPartitions(_.map { id =>
        val srcId = if (id < 30) 0L else 100L + (id - 30) // 30 clones, then ids 100..103
        (id, "image/png", PerceptualHash.plantedPng(srcId))
      })
      .toDF("id", "media_type", "content")
    val blk = expr("CASE WHEN id < 30 THEN -1 ELSE (id - 30) div 2 END")
    val uncapped = PerceptualHash
      .pairsWithinBlock(media, blk, maxHamming = 8, maxBlock = 1000000)
      .count()
    assert(uncapped == 435 + 2, s"flood should expand uncapped, got $uncapped")
    val capped = PerceptualHash
      .pairsWithinBlock(media, blk, maxHamming = 8, maxBlock = 10)
      .as[(Long, Long, Int)].collect()
    assert(capped.length == 2, s"cap should drop the flood block, got ${capped.length}")
    assert(capped.forall { case (a, b, _) => a >= 30 && b == a + 1 })
  }

  test("banded default blocking equals brute force for maxHamming < bands") {
    // no caller blocking column: 8 hash-prefix bands, exact recall for
    // h <= 7 by pigeonhole — verify against the all-pairs formulation
    val n = 60
    val hashes = (0 until n).map(id =>
      id.toLong -> PerceptualHash.dHash64(PerceptualHash.plantedPng(id.toLong)).get).toMap
    val brute = (for {
      a <- 0 until n; b <- (a + 1) until n
      hm = java.lang.Long.bitCount(hashes(a.toLong) ^ hashes(b.toLong))
      if hm <= 7
    } yield (a.toLong, b.toLong, hm)).toSet
    val media = spark.range(0, n).select(col("id")).as[Long]
      .mapPartitions(_.map(id => (id, "image/png", PerceptualHash.plantedPng(id))))
      .toDF("id", "media_type", "content")
    val banded = PerceptualHash.pairs(media, maxHamming = 7, bands = 8)
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == brute,
      s"banded recall hole: missing=${(brute -- banded).take(3)} extra=${(banded -- brute).take(3)}")
    assert(brute.nonEmpty, "fixture should plant at least one near-dup pair")
  }

  test("banded audio pairs find the gain copies without a caller key") {
    import graft.operators.multimodal.PerceptualAudio
    val media = spark.range(0, 40).select(col("id")).as[Long]
      .mapPartitions(_.map(id => (id, "audio/wav", PerceptualAudio.plantedWav(id))))
      .toDF("id", "media_type", "content")
    val pairs = PerceptualAudio.pairs(media, maxHamming = 10, bands = 16)
      .as[(Long, Long, Int)].collect()
    // every planted gain-copy pair must surface (h <= 10 < 16 bands);
    // cross-group coincidences are allowed but must satisfy the bound
    val planted = pairs.filter { case (a, b, _) => a % 2 == 0 && b == a + 1 }
    assert(planted.length == 20, s"expected 20 planted pairs, got ${planted.length}")
    assert(pairs.forall(_._3 <= 10))
  }

  // ---- perceptual audio hash ----

  test("audio contour hash is gain-invariant and order-sensitive") {
    import graft.operators.multimodal.PerceptualAudio
    val n = 130
    // rewrite the planted container's samples with a chosen function
    // (small amplitudes so integer gain multiples stay inside int16)
    def wavOf(f: Int => Int): Array[Byte] = {
      val w = PerceptualAudio.plantedWav(0L).clone()
      for (t <- 0 until n) {
        val v = f(t)
        w(44 + t * 2) = (v & 0xff).toByte
        w(45 + t * 2) = ((v >> 8) & 0xff).toByte
      }
      w
    }
    def base(t: Int): Int = (t * t * 13) % 997
    val h = PerceptualAudio.audioHash64(wavOf(base)).get
    // exact 2x gain: every window mean doubles, every comparison holds
    val h2 = PerceptualAudio.audioHash64(wavOf(t => base(t) * 2)).get
    assert(h2 == h, "2x gain changed the contour")
    // reversing the samples flips the contour far from the original
    val hr = PerceptualAudio.audioHash64(wavOf(t => base(n - 1 - t))).get
    assert(java.lang.Long.bitCount(h ^ hr) > 16, "reversed audio too close")
  }

  test("audio hash rejects non-wav, over-cap, and too-short payloads") {
    import graft.operators.multimodal.PerceptualAudio
    assert(PerceptualAudio.audioHash64("not audio".getBytes).isEmpty)
    val wav = PerceptualAudio.plantedWav(1L)
    assert(PerceptualAudio.audioHash64(wav, maxDecodeBytes = 10).isEmpty)
    assert(PerceptualAudio.audioHash64(wav).nonEmpty)
    // fewer samples than windows -> no contour
    assert(PerceptualAudio.audioHash64(wavBytes(8000, 1, 32)).isEmpty)
  }

  test("blocked audio pairs find the planted gain-copy duplicates") {
    import graft.operators.multimodal.PerceptualAudio
    val media = spark.range(0, 40).select(col("id")).as[Long]
      .mapPartitions(_.map(id => (id, "audio/wav", PerceptualAudio.plantedWav(id))))
      .toDF("id", "media_type", "content")
    val pairs = PerceptualAudio
      .pairsWithinBlock(media, expr("id div 2"), maxHamming = 10)
      .as[(Long, Long, Int)].collect()
    assert(pairs.length == 20, s"expected 20 planted pairs, got ${pairs.length}")
    assert(pairs.forall { case (a, b, hm) => b == a + 1 && a % 2 == 0 && hm <= 10 })
  }

  test("image-in-video equals a driver-side brute-force Hamming cross join") {
    import spark.implicits._
    import graft.operators.multimodal.ImageInVideo
    val imgIds = Seq(10L, 11L, 500L, 999L)
    val frameSrc = Seq((100L, 0, 10L), (100L, 1, 500L), (101L, 0, 11L))
    val images = imgIds.map(i => (i, "image/png", PerceptualHash.plantedPng(i)))
      .toDF("id", "media_type", "content")
    val frames = frameSrc.map { case (v, f, src) =>
      (v, f, PerceptualHash.plantedPng(src))
    }.toDF("video_id", "frame_idx", "content")
    val got = ImageInVideo.hits(images, frames, maxHamming = 3)
      .select("image_id", "video_id", "n_frames", "best_hamming")
      .as[(Long, Long, Long, Int)].collect().toSet
    // brute force over driver-derived hashes
    val ih = imgIds.map(i =>
      i -> PerceptualHash.dHash64(PerceptualHash.plantedPng(i)).get)
    val fh = frameSrc.map { case (v, f, src) =>
      (v, f, PerceptualHash.dHash64(PerceptualHash.plantedPng(src)).get)
    }
    val expected = (for {
      (i, idh) <- ih
      (v, _, fdh) <- fh
      h = java.lang.Long.bitCount(idh ^ fdh)
      if h <= 3
    } yield (i, v, h))
      .groupBy(t => (t._1, t._2))
      .map { case ((i, v), ms) => (i, v, ms.size.toLong, ms.map(_._3).min) }
      .toSet
    assert(got == expected, s"got=$got expected=$expected")
    // the planted exact match must be there with Hamming 0
    assert(got.exists(r => r._1 == 10L && r._2 == 100L && r._4 == 0))
  }

  test("audio-in-stream equals a driver-side brute-force Hamming cross join") {
    import spark.implicits._
    import graft.operators.multimodal.{AudioInStream, PerceptualAudio}
    val clipIds = Seq(10L, 11L, 500L, 999L)
    val segSrc = Seq((100L, 0, 10L), (100L, 1, 500L), (101L, 0, 11L))
    val clips = clipIds.map(i => (i, "audio/wav", PerceptualAudio.plantedWav(i)))
      .toDF("id", "media_type", "content")
    val segments = segSrc.map { case (sid, f, src) =>
      (sid, f, PerceptualAudio.plantedWav(src))
    }.toDF("stream_id", "seg_idx", "content")
    val got = AudioInStream.hits(clips, segments, maxHamming = 3)
      .select("clip_id", "stream_id", "n_segments", "best_hamming")
      .as[(Long, Long, Long, Int)].collect().toSet
    val ch = clipIds.map(i =>
      i -> PerceptualAudio.audioHash64(PerceptualAudio.plantedWav(i)).get)
    val sh = segSrc.map { case (sid, f, src) =>
      (sid, f, PerceptualAudio.audioHash64(PerceptualAudio.plantedWav(src)).get)
    }
    val expected = (for {
      (c, cdh) <- ch
      (sid, _, sdh) <- sh
      h = java.lang.Long.bitCount(cdh ^ sdh)
      if h <= 3
    } yield (c, sid, h))
      .groupBy(t => (t._1, t._2))
      .map { case ((c, sid), ms) => (c, sid, ms.size.toLong, ms.map(_._3).min) }
      .toSet
    assert(got == expected, s"got=$got expected=$expected")
    assert(got.exists(r => r._1 == 10L && r._2 == 100L && r._4 == 0))
  }

  test("frame sampling covers payloads with the requested stride") {
    val frames = Multimodal.frameSampleStub(media, frameBytes = 64, stride = 2)
    val byDoc = frames.groupByKey(_.id).count().collect().toMap
    assert(byDoc.size == 500)
    // doc with n bytes has ceil-ish frames: every 2nd of n/64 (min 1)
    val doc = Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id") === 0).select(octet_length(col("text"))).as[Int].head()
    val expectedFrames = math.max(1, doc / 64 + (if (doc % 64 > 0) 0 else 0))
    assert(byDoc(0L) == (0 until math.max(1, doc / 64) by 2).size)
  }
}
