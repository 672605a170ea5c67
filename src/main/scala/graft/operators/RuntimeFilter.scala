package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter runtime pruning for joins — the manual form of the
  * "runtime filter" every warehouse engine applies when a huge fact
  * table joins a filtered dimension: hash the (small) build side's join
  * keys into a compact bitmap, and drop probe-side rows that cannot
  * match BEFORE they reach the join's shuffle. A Bloom filter has no
  * false negatives, so the pruned join returns exactly the rows of the
  * plain join — the filter only cuts the shuffle/sort volume of the
  * non-matching majority (at 100 TB of fact rows against a 1%-selective
  * dimension filter, that is ~99% of the probe-side shuffle).
  *
  * Mechanics chosen for Spark's execution model:
  *  - the bitmap is built ON the cluster (one projection + distinct of
  *    bit positions over the build side) and only the ≤ mBits/64 set
  *    WORDS are collected — the driver never sees the keys;
  *  - the bitmap rides in a broadcast ONE-ROW frame (array<long>
  *    column) cross-joined onto the probe side, so the membership test
  *    is a pure codegen'd expression (xxhash64 → element_at → bit
  *    test) against a column bound ONCE — no UDF, nothing opaque to
  *    Catalyst, no per-probe literal replication (a literal bitmap
  *    gets copied k× and again across the join by constraint
  *    propagation), and the scan still prunes parquet columns;
  *  - k independent hash probes come from `xxhash64(i, key)` — the
  *    same public hash both engines implement, which is what lets the
  *    DuckDB oracle verify output-invariance cross-engine.
  *
  * Size the filter like any Bloom filter: mBits ≈ 10–15 bits per
  * distinct build key gives ~1% false positives with k = 3. The
  * default 2^20 bits = 128 KiB of plan literal handles ~100k keys; a
  * build side beyond ~10M keys should broadcast-join instead (the
  * bitmap would rival the key set) or switch to a shuffled semi-join.
  *
  * The reference engine has no notion of join optimization (nested
  * loops over 10–320-row CSVs, /root/reference/sqlengine.py:374-444);
  * extension surface. */
object RuntimeFilter {

  /** The k bit positions of `key` in an mBits-wide filter. */
  private def positions(key: Column, mBits: Int, k: Int): Seq[Column] =
    (0 until k).map(i => pmod(xxhash64(lit(i), key), lit(mBits.toLong)))

  /** Build the Bloom bitmap over `keys` and return it as set words
    * (index → 64-bit word). Cluster-side: ships bit POSITIONS (≤ k·n
    * longs, deduped) to the driver, never keys. */
  def buildBloom(df: DataFrame, keyCol: String, mBits: Int, k: Int): Array[Long] = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64, got $mBits")
    val words = new Array[Long](mBits / 64)
    df.select(explode(array(positions(col(keyCol), mBits, k): _*)).as("__p"))
      .distinct().collect()
      .foreach { r =>
        val p = r.getLong(0)
        words((p >> 6).toInt) |= 1L << (p & 63)
      }
    words
  }

  /** `keep` predicate: every one of the k probed bits of `key` is set
    * in the bitmap carried by `bitmapCol` — an array<long> COLUMN, so
    * the words are bound ONCE however many probes read them. Inlining
    * the array as a literal instead would replicate it k× here and
    * again onto the build side via constraint propagation (6 copies at
    * k = 3): at the default mBits = 2^20 that is a multi-MB expression
    * tree that blows Janino's 64 KB method limit and drops the hot
    * filter out of codegen. Pure built-ins — still codegen'd. */
  private def mightContain(key: Column, bitmapCol: Column, mBits: Int,
      k: Int): Column =
    positions(key, mBits, k).map { p =>
      val word = element_at(bitmapCol, shiftrightunsigned(p, 6).cast("int") + 1)
      word.bitwiseAND(shiftLeftCol(lit(1L), (p % 64).cast("int"))) =!= 0L
    }.reduce(_ && _)

  /** `shiftleft` with a COLUMN shift amount — the SQL function accepts
    * one, only the Scala wrapper pins it to a literal Int. */
  private def shiftLeftCol(value: Column, shift: Column): Column =
    call_function("shiftleft", value, shift)

  /** The probe-side pruning step alone: rows of `df` whose `keyCol`
    * might be in the filter (all true members + ~fpp false positives).
    *
    * The bitmap rides in a broadcast ONE-ROW frame cross-joined onto
    * the probe side, and the k bit tests read the bitmap *column* —
    * the words travel as broadcast relation data, appear once in the
    * plan, and never enter an expression literal, so plan size, plan
    * serialization, and codegen stay O(1) in mBits. */
  def prune(df: DataFrame, keyCol: String, words: Array[Long], mBits: Int,
      k: Int = 3): DataFrame = {
    // uniquify against the input so a caller column named __bloom_words
    // is neither made ambiguous by the crossJoin nor dropped at the end
    val bfCol = Iterator.from(0)
      .map(i => if (i == 0) "__bloom_words" else s"__bloom_words_$i")
      .find(n => !df.columns.contains(n)).get
    val bf = broadcast(
      df.sparkSession.createDataFrame(Seq(Tuple1(words.toSeq))).toDF(bfCol))
    df.crossJoin(bf)
      .filter(mightContain(col(keyCol), col(bfCol), mBits, k))
      .drop(bfCol)
  }

  /** Inner equi-join of `big` with `small`, with the big side
    * Bloom-pruned before the join. Result is EXACTLY the plain join
    * (no false negatives); the filter exists to cut the probe side's
    * shuffle volume. */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, key: String,
      mBits: Int = 1 << 20, k: Int = 3): DataFrame = {
    val words = buildBloom(small, key, mBits, k)
    prune(big, key, words, mBits, k).join(small, Seq(key))
  }
}
