package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with a typed metadata struct, and run
  * decode / feature-extraction partition-wise in batches (the Scala
  * equivalent of PySpark's `mapInPandas` batch shape).
  *
  * The decode step is REAL for the binary Netpbm rasters — P5 (PGM,
  * 8-bit grayscale) and P6 (PPM, 8-bit RGB) are pure header+pixel
  * formats that need no codec library, so [[decodeRaster]] parses
  * them end to end (magic, `#` comments, dimensions, maxval, pixel
  * plane). Payloads that are not a valid raster fall back to the
  * bytes-as-pixels view (a 1×n grayscale strip), which keeps
  * hashing/featurization total over arbitrary binary columns. The
  * execution shape is the load-bearing part at scale:
  *  - schema: `media struct<payload: binary, meta: struct<...>>`;
  *  - execution: typed `Dataset.mapPartitions` over batches of
  *    `batchSize` rows, so a heavier codec (JPEG, audio) could
  *    amortize its init per batch exactly like an Arrow batch UDF.
  *    The typed path stays in Tungsten end to end
  *    (DeserializeToObject → MapPartitions → SerializeFromObject in
  *    one plan) — no external-Row round trip;
  *  - output schema comes from the case-class encoder — downstream
  *    pruning/filters behave normally.
  */
object Multimodal {

  /** Typed metadata carried beside every payload. */
  val MetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate_hz", IntegerType)))

  /** Wrap a binary column into the canonical media struct with
    * container-level metadata sniffed from the payload head (magic
    * bytes only — P5/P6 Netpbm rasters and the synthetic IMG/AUD
    * containers; full header parsing happens in the decode stage). */
  def asMedia(df: DataFrame, binCol: String, out: String = "media"): DataFrame = {
    val b = col(binCol)
    val fmt = when(substring(b, 1, 2) === lit("P5".getBytes) ||
        substring(b, 1, 2) === lit("P6".getBytes), "img")
      .when(substring(b, 1, 3) === lit("IMG".getBytes), "img")
      .when(substring(b, 1, 3) === lit("AUD".getBytes), "aud")
      .otherwise("bin")
    df.withColumn(out, struct(
      b.as("payload"),
      struct(fmt.as("format"), lit(0).as("width"), lit(0).as("height"),
        lit(0).as("n_frames"), lit(0).as("sample_rate_hz")).as("meta")))
  }

  /** A decoded 8-bit grayscale raster, row-major. */
  final case class Raster(width: Int, height: Int, pixels: Array[Byte])

  /** A parsed Netpbm header: dimensions, RGB-ness, and the offset of
    * the first pixel byte — everything metadata extraction needs
    * WITHOUT touching the pixel plane. */
  final case class RasterHeader(width: Int, height: Int, isP6: Boolean,
      pixelOffset: Int)

  /** Header-only parse of a binary Netpbm payload (P5 grayscale / P6
    * RGB): magic, `#` comments, arbitrary whitespace runs, maxval up
    * to 255 (single-byte samples), and a COMPLETE pixel plane after
    * the header. None for anything else. The cheap first pass a
    * metadata sweep runs over a 100 TB media column — no pixel copy. */
  def parseRasterHeader(payload: Array[Byte]): Option[RasterHeader] = {
    if (payload.length < 2 || payload(0) != 'P') return None
    val p6 = payload(1) == '6'
    if (payload(1) != '5' && !p6) return None
    var i = 2
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == '\r'
    // whitespace runs and '#'-to-end-of-line comments; false on EOF
    def skipWs(): Boolean = {
      var progressed = false
      var done = false
      while (!done && i < payload.length) {
        if (isWs(payload(i))) { i += 1; progressed = true }
        else if (payload(i) == '#') {
          while (i < payload.length && payload(i) != '\n') i += 1
          progressed = true
        } else done = true
      }
      progressed && i < payload.length
    }
    // unsigned decimal int; -1 when absent or overflowing
    def int(): Int = {
      var v = 0L
      var any = false
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        v = v * 10 + (payload(i) - '0'); any = true; i += 1
        if (v > Int.MaxValue) return -1
      }
      if (any) v.toInt else -1
    }
    if (!skipWs()) return None
    val w = int(); if (w < 0) return None
    if (!skipWs()) return None
    val h = int(); if (h < 0) return None
    if (!skipWs()) return None
    val maxval = int(); if (maxval < 1 || maxval > 255) return None
    // exactly ONE whitespace byte separates the header from pixel data
    if (i >= payload.length || !isWs(payload(i))) return None
    i += 1
    val np = w.toLong * h
    if (np > Int.MaxValue - 8) return None
    val need = if (p6) np * 3 else np
    if (payload.length - i < need) return None
    Some(RasterHeader(w, h, p6, i))
  }

  /** Full decode of a binary Netpbm raster — [[parseRasterHeader]]
    * plus the pixel plane (P6 reduced to luma `(r+g+b)/3`,
    * truncating). None for anything that is not a well-formed
    * single-byte P5/P6 payload; callers choose the fallback policy
    * ([[decodeOrRaw]]). */
  def decodeRaster(payload: Array[Byte]): Option[Raster] =
    parseRasterHeader(payload).map { hd =>
      val np = hd.width * hd.height
      if (!hd.isP6) {
        Raster(hd.width, hd.height,
          java.util.Arrays.copyOfRange(payload, hd.pixelOffset, hd.pixelOffset + np))
      } else {
        val px = new Array[Byte](np)
        var k = 0
        while (k < np) {
          val o = hd.pixelOffset + k * 3
          px(k) = (((payload(o) & 0xff) + (payload(o + 1) & 0xff) +
            (payload(o + 2) & 0xff)) / 3).toByte
          k += 1
        }
        Raster(hd.width, hd.height, px)
      }
    }

  /** Described-media record shape. */
  final case class MediaDesc(id: Long, format: String, width: Int,
      height: Int, n_bytes: Long)

  /** Header-only media description — fills the typed meta columns
    * [[asMedia]] sniffs ("pgm"/"ppm" with REAL parsed dims; "img"/
    * "aud"/"bin" with zeros for non-raster containers) without ever
    * materializing a pixel. The batch shape is the same
    * `mapPartitions` contract as [[decodeFeatures]]. */
  def describeMedia(df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) =>
            parseRasterHeader(payload) match {
              case Some(hd) =>
                MediaDesc(id, if (hd.isP6) "ppm" else "pgm",
                  hd.width, hd.height, payload.length.toLong)
              case None =>
                val fmt =
                  if (payload.length >= 3 &&
                    payload(0) == 'I' && payload(1) == 'M' && payload(2) == 'G') "img"
                  else if (payload.length >= 3 &&
                    payload(0) == 'A' && payload(1) == 'U' && payload(2) == 'D') "aud"
                  else "bin"
                MediaDesc(id, fmt, 0, 0, payload.length.toLong)
            }
          }
        }
      }.toDF()
  }

  /** Decode policy for opaque media columns: a valid P5/P6 payload
    * decodes to its raster; anything else is viewed as a 1×n
    * grayscale strip of its raw bytes, so every downstream kernel
    * (pooling, hashing, resampling) stays total over arbitrary
    * binary data. */
  def decodeOrRaw(payload: Array[Byte]): Raster =
    decodeRaster(payload).getOrElse(Raster(payload.length, 1, payload))

  /** Exact `a·b > c·d` for nonnegative longs via 128-bit products
    * (`Math.multiplyHigh`): the pooled-mean threshold stays
    * bit-reproducible for rasters of any size — a plain Long product
    * overflows past ~1.2 GB payloads and would silently flip hash
    * bits (the oracle's HUGEINT arithmetic never overflows, so the
    * engines would diverge exactly there). */
  private[graft] def prodGt(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b)
    val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(a * b, c * d) > 0
  }

  /** Average-pool `px` into `k` contiguous cells (cell c covers
    * pixel indexes [c·n/k, (c+1)·n/k)): per-cell sums, per-cell
    * sizes, and the grand total — the shared kernel under both the
    * pooled-intensity features and the blockhash. */
  private def cellSums(px: Array[Byte], k: Int): (Array[Long], Array[Int], Long) = {
    val n = px.length
    def lo(c: Int): Int = (c.toLong * n / k).toInt
    val sums = new Array[Long](k)
    val sizes = new Array[Int](k)
    var total = 0L
    var c = 0
    while (c < k) {
      var i = lo(c)
      val end = lo(c + 1)
      sizes(c) = end - i
      while (i < end) { sums(c) += px(i) & 0xff; i += 1 }
      total += sums(c); c += 1
    }
    (sums, sizes, total)
  }

  /** Decoded record shape (the encoder IS the output schema). */
  final case class Decoded(id: Long, n_bytes: Long, width: Int, height: Int,
      features: Array[Float])

  /** Batched partition-wise decode of `binCol`, keyed by `idCol`:
    * parses the raster header (real P5/P6 parse; raw-bytes strip
    * otherwise) and pools the pixel plane into `cells` contiguous
    * per-mille intensity features — `feat(c) = ⌊sum_c·1000 /
    * (size_c·255)⌋`, exact integers in [0,1000] stored as float, so
    * the vector is bit-reproducible in any engine (no float
    * accumulation order to disagree on).
    * Output: (id, n_bytes, width, height, features[cells]). */
  def decodeFeatures(df: DataFrame, idCol: String, binCol: String,
      cells: Int = 8, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // a heavier codec would init once per batch here
          batch.iterator.map { case (id, payload) =>
            val r = decodeOrRaw(payload)
            val (sums, sizes, _) = cellSums(r.pixels, cells)
            val feat = Array.tabulate(cells)(c =>
              if (sizes(c) == 0) 0f
              else (sums(c) * 1000L / (sizes(c) * 255L)).toFloat)
            Decoded(id, payload.length.toLong, r.width, r.height, feat)
          }
        }
      }.toDF()
  }

  /** Aspect-preserving nearest-neighbor resample into a `(maxW, maxH)`
    * box: source pixel `(x·w/nw, y·h/nh)`, integer truncation, so
    * every output byte is deterministic and an oracle can re-derive
    * the full plane. An empty raster resamples to an empty raster. */
  private def resampleRaster(r: Raster, maxW: Int, maxH: Int): Raster = {
    if (r.pixels.isEmpty) Raster(0, 0, Array.emptyByteArray)
    else {
      val scale = math.min(1.0,
        math.min(maxW.toDouble / r.width, maxH.toDouble / r.height))
      val nw = math.max(1, (r.width * scale).toInt)
      val nh = math.max(1, (r.height * scale).toInt)
      val out = new Array[Byte](nw * nh)
      var y = 0
      while (y < nh) {
        val sy = (y.toLong * r.height / nh).toInt
        var x = 0
        while (x < nw) {
          val sx = (x.toLong * r.width / nw).toInt
          out(y * nw + x) = r.pixels(sy * r.width + sx)
          x += 1
        }
        y += 1
      }
      Raster(nw, nh, out)
    }
  }

  /** Encode a grayscale raster as binary PGM (P5) — the media WRITE
    * path complementing [[decodeRaster]]: `decodeRaster(encodePgm(r))`
    * round-trips exactly (canonical single-space header, maxval 255). */
  def encodePgm(r: Raster): Array[Byte] = {
    val header = s"P5\n${r.width} ${r.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + r.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(r.pixels, 0, out, header.length, r.pixels.length)
    out
  }

  /** Resized record shape: the resampled raster plus its exact pixel
    * checksum (the cheap cross-engine proof that the resample really
    * moved pixels, not just the header dims). */
  final case class Resized(id: Long, width: Int, height: Int,
      pixels: Array[Byte], pix_sum: Long)

  /** Batched resize-to-target: decodes (real P5/P6 parse), then
    * [[resampleRaster]] — deterministic down to every output byte. */
  def resizeTo(df: DataFrame, idCol: String, binCol: String,
      maxW: Int = 256, maxH: Int = 256, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) =>
            val r = resampleRaster(decodeOrRaw(payload), maxW, maxH)
            var sum = 0L
            var i = 0
            while (i < r.pixels.length) { sum += r.pixels(i) & 0xff; i += 1 }
            Resized(id, r.width, r.height, r.pixels, sum)
          }
        }
      }.toDF()
  }

  /** Thumbnail record shape: a VALID P5 payload (chainable into
    * another decode) plus its byte count. */
  final case class Thumb(id: Long, payload: Array[Byte], n_bytes: Long)

  /** Batched thumbnail pipeline — decode → aspect-preserving resample
    * → re-encode as P5. The end-to-end media write path: every output
    * payload is itself a well-formed raster, so downstream stages
    * (another resize, a perceptual hash, an export sink) chain on it
    * without special-casing. */
  def thumbnails(df: DataFrame, idCol: String, binCol: String,
      maxW: Int = 256, maxH: Int = 256, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) =>
            val enc = encodePgm(resampleRaster(decodeOrRaw(payload), maxW, maxH))
            Thumb(id, enc, enc.length.toLong)
          }
        }
      }.toDF()
  }

  /** Perceptual-hash record shape. */
  final case class PHashed(id: Long, phash: Long)

  /** Blockhash-style perceptual hash (the aHash family): decode the
    * payload (real P5/P6 parse; raw-bytes strip otherwise),
    * average-pool the grayscale plane into `blocks` contiguous
    * cells; bit `c` is set iff cell `c`'s mean exceeds the global
    * mean. The comparison is exact integer cross-multiplication
    * (`sum_c · n > total · size_c`, 128-bit via [[prodGt]]), so the
    * hash is bit-reproducible in any engine at any payload size —
    * no float thresholds, no overflow.
    *
    * Block means move smoothly with content, so near-identical
    * rasters land within a few hamming bits — feed the result to
    * [[Dedup.hammingNearPairs]] for the bucketed pair search.
    * Map-only, one pass per payload; same batched `mapPartitions`
    * shape as [[decodeFeatures]]. */
  def perceptualHash(df: DataFrame, idCol: String, binCol: String,
      blocks: Int = 64, batchSize: Int = 64): DataFrame = {
    require(blocks >= 1 && blocks <= 64, s"blocks must be in [1, 64], got $blocks")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) =>
            val px = decodeOrRaw(payload).pixels
            val n = px.length
            val (sums, sizes, total) = cellSums(px, blocks)
            var hash = 0L
            var c = 0
            while (c < blocks) {
              // exact mean comparison: sum_c/size_c > total/n without
              // division; empty cells (n < blocks) stay 0
              if (prodGt(sums(c), n, total, sizes(c))) hash |= 1L << c
              c += 1
            }
            PHashed(id, hash)
          }
        }
      }.toDF()
  }

  /** Maintain a perceptual-hash index under a CDC media change feed —
    * the media column joining the freshness family ([[Similarity
    * .ivfMaintain]]'s protocol applied to [[perceptualHash]]): the
    * standing index is one (id, phash) row per live medium, each
    * changed payload is re-hashed MAP-SIDE (the hash is a pure
    * function of the payload bytes, so the maintained index is
    * bit-equal to [[perceptualHash]] over the merged corpus — pinned
    * by the mm_phash_incremental oracle and PhashStreamSpec, not
    * assumed), and the fold is [[Cdc.latestChanges]] →
    * [[Cdc.applyGroupedFromLatest]]: the batch reduces to ONE winner
    * row per key BEFORE any payload is hashed. Hashing first and
    * joining back on id alone was the round-17 shape — with two
    * upserts for one key in a batch that join is many-to-many, both
    * payloads' hashes tag the winning seq, and the max_by tie-break
    * could commit the STALE payload's hash; reducing first makes the
    * committed hash a pure function of the winning payload (the
    * [[graft.operators.Similarity.ivfMaintain]] derived-column
    * discipline). Near-dup search over the maintained index is
    * [[graft.operators.Dedup.hammingNearPairsMih]] unchanged. Cost
    * per batch: one key-reduce of the batch + one map pass over the
    * winners + one key anti-join — the index is touched only through
    * the key join, never rescanned. `changes` carries `(seqCol,
    * opCol, idCol, binCol)` with op ∈ I/U/D, payload NULL on deletes,
    * seq feed-monotone; `index` is keyed `id` (the [[perceptualHash]]
    * output shape). */
  def phashMaintain(index: DataFrame, changes: DataFrame, idCol: String,
      binCol: String, seqCol: String, opCol: String,
      blocks: Int = 64): DataFrame = {
    val latest = Cdc.latestChanges(
      changes.select(col(idCol).cast(LongType).as("id"),
        col(seqCol), col(opCol), col(binCol)),
      "id", seqCol, opCol)
    Cdc.applyGroupedFromLatest(index, latest, "id")(ups =>
      perceptualHash(ups, "id", binCol, blocks))
  }

  /** Frame sampling stub: every `stride`-th fake frame offset of a
    * video payload — demonstrates the explode-to-frames shape
    * (id, frame_idx, frame_off) a real pipeline uses. Pure column expr. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      stride: Int = 1024): DataFrame =
    df.select(col(idCol),
        posexplode(sequence(lit(0),
          floor((length(col(binCol)) - 1) / stride).cast(IntegerType)))
          .as(Seq("frame_idx", "frame_pos")))
      .select(col(idCol), col("frame_idx").cast(LongType),
        (col("frame_pos") * stride).cast(LongType).as("frame_off"))
}
