package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with a typed metadata struct, and run
  * decode / feature-extraction partition-wise in batches (the Scala
  * equivalent of PySpark's `mapInPandas` batch shape).
  *
  * The actual byte→pixels/samples decode is a clearly-marked
  * DETERMINISTIC STUB (no codec libraries in this container, and none
  * may be added — zero egress); everything around it is real and
  * load-bearing at scale:
  *  - schema: `media struct<payload: binary, meta: struct<...>>`;
  *  - execution: typed `Dataset.mapPartitions` over batches of
  *    `batchSize` rows, so a real decoder could amortize codec init per
  *    batch exactly like an Arrow batch UDF. The typed path stays in
  *    Tungsten end to end (DeserializeToObject → MapPartitions →
  *    SerializeFromObject in one plan) — no external-Row round trip
  *    and no `createDataFrame` re-analysis, which matters when the
  *    decode stage dominates a real multimodal run;
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
    * container-level metadata sniffed from the payload head (real
    * pattern; fake magic numbers). */
  def asMedia(df: DataFrame, binCol: String, out: String = "media"): DataFrame = {
    val b = col(binCol)
    val fmt = when(substring(b, 1, 3) === lit("IMG".getBytes), "img")
      .when(substring(b, 1, 3) === lit("AUD".getBytes), "aud")
      .otherwise("bin")
    df.withColumn(out, struct(
      b.as("payload"),
      struct(fmt.as("format"), lit(0).as("width"), lit(0).as("height"),
        lit(0).as("n_frames"), lit(0).as("sample_rate_hz")).as("meta")))
  }

  /** ===== STUB ===== deterministic fake decode: derives pseudo
    * dimensions and an 8-dim feature vector from the bytes. A real
    * deployment replaces ONLY this function with a codec call; the
    * batching/schema contract around it is unchanged. */
  def stubDecode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    var h = 1125899906842597L // deterministic FNV-ish rolling hash
    payload.foreach(b => h = h * 31 + (b & 0xff))
    val width = 16 + math.floorMod(h, 1024).toInt
    val height = 16 + math.floorMod(h >> 10, 1024).toInt
    val feat = Array.tabulate(8)(i =>
      math.floorMod(h >> (i * 7), 1000).toFloat / 1000f)
    (width, height, feat)
  }

  /** Decoded record shape (the encoder IS the output schema). */
  final case class Decoded(id: Long, n_bytes: Long, width: Int, height: Int,
      features: Array[Float])

  /** Batched partition-wise decode of `binCol`, keyed by `idCol`.
    * Output: (id, n_bytes, width, height, features[8]). */
  def decodeFeatures(df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // a real decoder would init its codec once per batch here
          batch.iterator.map { case (id, payload) =>
            val (w, h, feat) = stubDecode(payload)
            Decoded(id, payload.length.toLong, w, h, feat)
          }
        }
      }.toDF()
  }

  /** Resized record shape. */
  final case class Resized(id: Long, width: Int, height: Int,
      features: Array[Float])

  /** ===== STUB decode inside ===== batched resize-to-target: decodes
    * (stub), scales the pseudo dimensions to fit `(maxW, maxH)`
    * preserving aspect ratio, and rescales the feature vector — the
    * standard normalize-before-training step. The batching/schema
    * contract is the real, load-bearing part; a production build swaps
    * only the decode+resample kernel. */
  def resizeTo(df: DataFrame, idCol: String, binCol: String,
      maxW: Int = 256, maxH: Int = 256, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // real impl: init codec + resampler once per batch here
          batch.iterator.map { case (id, payload) =>
            val (w, h, feat) = stubDecode(payload)
            val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
            val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
            Resized(id, nw, nh, feat.map(f => (f * scale).toFloat))
          }
        }
      }.toDF()
  }

  /** Perceptual-hash record shape. */
  final case class PHashed(id: Long, phash: Long)

  /** Blockhash-style perceptual hash (the aHash family) of a media
    * payload: the byte stream plays the decoded grayscale raster (the
    * STUB part — a real deployment decodes pixels first, the pooling
    * and thresholding below are unchanged), average-pooled into
    * `blocks` contiguous cells; bit `c` is set iff cell `c`'s mean
    * exceeds the global mean. The comparison is exact integer
    * cross-multiplication (`sum_c · n > total · size_c`), so the hash
    * is bit-reproducible in any engine — no float thresholds.
    *
    * Unlike the payload's rolling hash (which avalanche-scatters on a
    * one-byte edit), block means move smoothly with content, so
    * near-identical payloads land within a few hamming bits — feed the
    * result to [[Dedup.hammingNearPairs]] for the bucketed pair
    * search. Map-only, one pass per payload; same batched
    * `mapPartitions` shape as [[decodeFeatures]]. */
  def perceptualHash(df: DataFrame, idCol: String, binCol: String,
      blocks: Int = 64, batchSize: Int = 64): DataFrame = {
    require(blocks >= 1 && blocks <= 64, s"blocks must be in [1, 64], got $blocks")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // a real decoder would init its codec once per batch here
          batch.iterator.map { case (id, payload) =>
            val n = payload.length
            def lo(c: Int): Int = (c.toLong * n / blocks).toInt
            val sums = new Array[Long](blocks)
            var total = 0L
            var c = 0
            while (c < blocks) {
              var i = lo(c)
              val end = lo(c + 1)
              while (i < end) { sums(c) += payload(i) & 0xff; i += 1 }
              total += sums(c); c += 1
            }
            var hash = 0L
            c = 0
            while (c < blocks) {
              val size = lo(c + 1) - lo(c)
              // exact mean comparison: sum_c/size_c > total/n without
              // division; empty cells (n < blocks) stay 0
              if (sums(c) * n > total * size) hash |= 1L << c
              c += 1
            }
            PHashed(id, hash)
          }
        }
      }.toDF()
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
