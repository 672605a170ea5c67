package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Pins the real Netpbm decoder (P5/P6 header grammar, pixel planes,
  * fallback policy), the overflow-safe mean comparison, and the
  * execution shape — schema, determinism, batching, frame-explode. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeRaster parses binary PGM (P5): comments, whitespace runs, pixel plane") {
    val px = Array.tabulate(12)(i => (i * 20).toByte)
    val pgm = "P5\n# a comment\n4 3\n255\n".getBytes ++ px
    val r = Multimodal.decodeRaster(pgm).get
    assert(r.width == 4 && r.height == 3)
    assert(r.pixels.sameElements(px))
    // arbitrary whitespace between header tokens is legal
    val pgm2 = "P5  4\t3\r\n255 ".getBytes ++ px
    val r2 = Multimodal.decodeRaster(pgm2).get
    assert(r2.width == 4 && r2.height == 3 && r2.pixels.sameElements(px))
  }

  test("decodeRaster reduces P6 (PPM RGB) to truncated-mean luma") {
    val rgb = Array[Byte](10, 20, 40, 0, 0, 0) // (10,20,40) and (0,0,0)
    val r = Multimodal.decodeRaster("P6\n2 1\n255\n".getBytes ++ rgb).get
    assert(r.width == 2 && r.height == 1)
    assert(r.pixels.toSeq == Seq[Byte](23, 0)) // (10+20+40)/3 = 23
  }

  test("decodeRaster rejects malformed payloads; decodeOrRaw falls back to a 1xN strip") {
    assert(Multimodal.decodeRaster("P5\n4 3\n255\n".getBytes).isEmpty) // truncated pixels
    assert(Multimodal.decodeRaster(("P5\n2 2\n65535\n" + "x" * 8).getBytes).isEmpty) // 2-byte samples
    assert(Multimodal.decodeRaster("IMGxxxx".getBytes).isEmpty)
    assert(Multimodal.decodeRaster(Array.emptyByteArray).isEmpty)
    val raw = Multimodal.decodeOrRaw("IMGxxxx".getBytes)
    assert(raw.width == 7 && raw.height == 1 && raw.pixels.length == 7)
  }

  test("prodGt: exact product comparison where a plain Long product overflows") {
    val n = 3_000_000_000L // a 3 GB raster
    val big = 255L * n     // its max cell sum — big * n overflows Long
    assert(Multimodal.prodGt(big, n, big - 1, n))
    assert(!Multimodal.prodGt(big, n, big, n))
    assert(Multimodal.prodGt(big, n, 1, 1))
    assert(!Multimodal.prodGt(1, 1, big, n))
    assert(!Multimodal.prodGt(0, 0, 0, 0))
  }

  test("perceptualHash pools DECODED pixels: header spelling does not change the hash") {
    val px = Array.tabulate(128)(i => ((i * 37) % 251).toByte)
    val a = "P5\n8 16\n255\n".getBytes ++ px
    val b = "P5 # same raster, noisier header\n 8\t16  255\n".getBytes ++ px
    val got = Seq((1L, a), (2L, b)).toDF("id", "payload")
    val hashes = Multimodal.perceptualHash(got, "id", "payload")
      .as[(Long, Long)].collect().toMap
    assert(hashes(1L) == hashes(2L))
  }

  private lazy val docs = Seq(
    (1L, "IMG" + "x" * 100), (2L, "AUD" + "y" * 50), (3L, "plain bytes")
  ).toDF("id", "text").withColumn("payload", col("text").cast("binary"))

  test("asMedia sniffs container format into the typed meta struct") {
    val got = Multimodal.asMedia(docs, "payload")
      .select(col("id"), col("media.meta.format"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "img", 2L -> "aud", 3L -> "bin"))
  }

  test("decodeFeatures: deterministic, exact byte counts, 8-dim features") {
    val a = Multimodal.decodeFeatures(docs, "id", "payload").collect()
    val b = Multimodal.decodeFeatures(docs, "id", "payload").collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    val byId = a.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) == 103L) // "IMG" + 100 bytes
    assert(byId(3L).getLong(1) == "plain bytes".length.toLong)
    assert(byId(2L).getSeq[Float](4).size == 8)
  }

  test("decodeFeatures honors small batch sizes (mapInPandas-style batching)") {
    val many = (1L to 50L).map(i => (i, s"payload-$i")).toDF("id", "text")
      .withColumn("payload", col("text").cast("binary"))
    val out = Multimodal.decodeFeatures(many, "id", "payload", batchSize = 4)
    assert(out.count() == 50)
    assert(out.select("id").as[Long].collect().sorted.sameElements(1L to 50L))
  }

  test("resizeTo clamps to the target box preserving aspect ratio") {
    val out = Multimodal.resizeTo(docs, "id", "payload", maxW = 32, maxH = 32)
      .select("id", "width", "height").as[(Long, Int, Int)].collect()
    assert(out.length == 3)
    out.foreach { case (_, w, h) =>
      assert(w <= 32 && h <= 32 && w >= 1 && h >= 1)
    }
    // each dimension is dim*scale within 1px of truncation
    val orig = Multimodal.decodeFeatures(docs, "id", "payload")
      .select("id", "width", "height").as[(Long, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val byId = out.map(r => r._1 -> (r._2, r._3)).toMap
    orig.foreach { case (id, (w, h)) =>
      val s = math.min(1.0, math.min(32.0 / w, 32.0 / h))
      val (nw, nh) = byId(id)
      assert(math.abs(nw - w * s) <= 1 && math.abs(nh - h * s) <= 1,
        s"id=$id ${w}x$h scale $s -> ${nw}x$nh")
    }
  }

  test("perceptualHash matches a reference blockhash; empty payload codes to 0") {
    def refHash(bytes: Array[Byte], blocks: Int = 64): Long = {
      val n = bytes.length
      def lo(c: Int) = (c.toLong * n / blocks).toInt
      val sums = (0 until blocks).map(c =>
        bytes.slice(lo(c), lo(c + 1)).map(b => (b & 0xff).toLong).sum)
      val total = sums.sum
      (0 until blocks).foldLeft(0L) { (h, c) =>
        if (sums(c) * n > total * (lo(c + 1) - lo(c))) h | (1L << c) else h
      }
    }
    val rows = Seq((1L, "IMG" + "x" * 100), (2L, "a"), (3L, ""))
      .toDF("id", "text").withColumn("payload", col("text").cast("binary"))
    val got = Multimodal.perceptualHash(rows, "id", "payload")
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == refHash(("IMG" + "x" * 100).getBytes))
    // single byte: the one block mean equals the global mean (strict >
    // fails) and 63 blocks are empty → all bits clear
    assert(got(2L) == 0L)
    assert(got(3L) == 0L)
  }

  test("perceptualHash + hammingNearPairs: identical and locally-edited payloads pair up") {
    // a "corpus": base raster, an exact copy, a local edit (one block's
    // bytes brightened), and an unrelated raster
    val base = Array.tabulate(640)(i => ((i * 37) % 251).toByte)
    val near = base.clone(); (320 until 330).foreach(i => near(i) = 250.toByte)
    val far = Array.tabulate(640)(i => ((i * 101 + 13) % 251).toByte)
    val rows = Seq((1L, base), (2L, base.clone()), (3L, near), (4L, far))
      .toDF("id", "payload")
    val hashed = graft.operators.Multimodal.perceptualHash(rows, "id", "payload")
    val pairs = graft.operators.Dedup
      .hammingNearPairsMih(hashed, "id", "phash", maxHamming = 7, chunks = 4)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs.get((1L, 2L)).contains(0), s"exact copy must pair at hamming 0: $pairs")
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) > 0,
      s"local edit must pair within the radius: $pairs")
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)),
      s"unrelated raster must stay out: $pairs")
  }

  test("describeMedia: header-only dims for rasters, container sniff for the rest") {
    val px = Array.tabulate(12)(i => i.toByte)
    val rows = Seq(
      (1L, "P5\n4 3\n255\n".getBytes ++ px),
      (2L, "P6\n2 2\n255\n".getBytes ++ Array.fill(12)(7.toByte)),
      (3L, "IMGxxxx".getBytes),
      (4L, "AUDyyyy".getBytes),
      (5L, "opaque".getBytes))
      .toDF("id", "payload")
    val got = Multimodal.describeMedia(rows, "id", "payload")
      .as[(Long, String, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "pgm", 4, 3, 12L + 11)))
    assert(got(2L) == ((2L, "ppm", 2, 2, 12L + 11)))
    assert(got(3L) == ((3L, "img", 0, 0, 7L)))
    assert(got(4L) == ((4L, "aud", 0, 0, 7L)))
    assert(got(5L) == ((5L, "bin", 0, 0, 6L)))
  }

  test("encodePgm round-trips through decodeRaster; thumbnails chain into a second decode") {
    val r = Multimodal.Raster(5, 3, Array.tabulate(15)(i => (i * 11).toByte))
    val back = Multimodal.decodeRaster(Multimodal.encodePgm(r)).get
    assert(back.width == 5 && back.height == 3 && back.pixels.sameElements(r.pixels))
    val docs = Seq(
      (1L, "P5\n8 16\n255\n".getBytes ++ Array.tabulate(128)(i => ((i * 37) % 251).toByte)))
      .toDF("id", "payload")
    val th = Multimodal.thumbnails(docs, "id", "payload", maxW = 4, maxH = 4)
    val (payload, n) = th.select("payload", "n_bytes")
      .as[(Array[Byte], Long)].head()
    assert(n == payload.length)
    val dec = Multimodal.decodeRaster(payload).get
    assert(dec.width >= 1 && dec.width <= 4 && dec.height >= 1 && dec.height <= 4,
      s"thumbnail must fit the box: ${dec.width}x${dec.height}")
    // chaining a second resize over the thumbnail is the identity
    val again = Multimodal.resizeTo(th, "id", "payload", maxW = 4, maxH = 4)
      .select("width", "height").as[(Int, Int)].head()
    assert(again == ((dec.width, dec.height)))
  }

  test("decodeRaster: encode∘decode identity on random rasters; total on garbage") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val w = rnd.nextInt(40)
      val h = rnd.nextInt(40)
      val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val r = Multimodal.Raster(w, h, px)
      val back = Multimodal.decodeRaster(Multimodal.encodePgm(r)).get
      assert(back.width == w && back.height == h && back.pixels.sameElements(px))
    }
    (1 to 500).foreach { _ =>
      val garbage = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      // must never throw — None or a valid raster, and the fallback is total
      Multimodal.decodeRaster(garbage)
      val raw = Multimodal.decodeOrRaw(garbage)
      assert(raw.pixels.length == garbage.length || raw.width >= 0)
    }
    // adversarial headers: truncated at every prefix of a valid payload
    val full = Multimodal.encodePgm(Multimodal.Raster(3, 2, Array[Byte](1, 2, 3, 4, 5, 6)))
    (0 until full.length).foreach { n =>
      assert(Multimodal.decodeRaster(full.take(n)).isEmpty,
        s"truncation at $n must be rejected, not mis-decoded")
    }
  }

  test("sampleFrames explodes stride-spaced offsets") {
    val got = Multimodal.sampleFrames(docs.filter($"id" === 1L), "id", "payload", stride = 32)
      .select("frame_idx", "frame_off").as[(Long, Long)].collect().sorted.toSeq
    // payload is 103 bytes → frames at 0, 32, 64, 96
    assert(got == Seq((0L, 0L), (1L, 32L), (2L, 64L), (3L, 96L)))
  }
}
