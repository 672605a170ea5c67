package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Cdc
import graft.operators.TextAnalysis

/** Streaming text-index maintenance — the lexical twin of
  * [[IvfStream]]: a document change feed keeps the BM25 index
  * (postings + lengths) CURRENT exactly-once, so retrieval between
  * batches sees every insert, re-write, and delete without a corpus
  * rescan. Feed contract: `(seq, op, id, text)`, op ∈ I/U/D (text NULL
  * for deletes), `seq` feed-monotone.
  *
  * State lives under THREE [[SnapshotStore]] homes per root — `post/`
  * (one row per live (doc, token) with its tf), `len/` (one row per
  * live doc with its token count — separate so zero-token documents
  * still count into N and Σdl), and `f/` (the 1-row feed frontier).
  * Each batch advances both state frames through
  * [[Cdc.applyChangesGrouped]] — changed docs' old rows dropped by ONE
  * key anti-join, fresh rows re-derived map-side from the winning
  * change — so the index is touched only through the key join, never
  * rescanned; cost per batch is the batch. The FRONTIER HOME COMMITS
  * FIRST (the [[IvmStream.joinFoldBatch]] lesson): a regressed feed
  * throws before any state home advances, instead of landing
  * mis-folded postings that every failing replay keeps serving.
  *
  * The maintained frames are BIT-EQUAL to a scratch
  * [[TextAnalysis.tokenIndex]]/[[TextAnalysis.docLengths]] rebuild
  * over the merged corpus (tokenization is per-row deterministic), so
  * [[TextAnalysis.bm25TopKFromIndex]] over them equals the full
  * recompute — pinned by TextIndexStreamSpec and the
  * doc_bm25_incremental oracle, not assumed.
  *
  * The reference engine is read-only over static CSVs
  * (/root/reference/sqlengine.py; no text search, no streams);
  * extension surface. */
object TextIndexStream {

  private def emptyPostings(batch: DataFrame): DataFrame =
    batch.select(col("id").as("doc_id"), lit("").as("token"),
      lit(0L).as("tf")).filter(lit(false))

  private def emptyLengths(batch: DataFrame): DataFrame =
    batch.select(col("id").as("doc_id"), lit(0).as("dl"))
      .filter(lit(false))

  /** BOTH index frames pinned to ONE committed batch id — the
    * torn-read guard a two-home index needs and the single-home twins
    * don't: `post/` and `len/` commit as separate snapshots, so
    * reading each home's own latest can pair postings from batch n
    * with lengths from n−1 mid-commit — a doc deleted in n absent
    * from the postings but still inflating N and avgdl, or an updated
    * doc's new tf scored against its stale dl, with no error. This
    * reader pins both frames to the HIGHEST id committed in BOTH
    * homes and materializes them ([[SnapshotStore.readPinned]]
    * semantics — release via
    * [[graft.operators.Caching.freeLocalCheckpoint]]). */
  def readIndex(spark: SparkSession, rootDir: String)
      : (DataFrame, DataFrame) = {
    val common = SnapshotStore.committed(spark, s"$rootDir/post").toSet
      .intersect(SnapshotStore.committed(spark, s"$rootDir/len").toSet)
    if (common.isEmpty) throw new IllegalStateException(
      s"no batch committed in BOTH text-index homes under $rootDir")
    val k = common.max
    (spark.read.parquet(s"$rootDir/post/b=$k").localCheckpoint(true),
      spark.read.parquet(s"$rootDir/len/b=$k").localCheckpoint(true))
  }

  /** Single-frame convenience views. For any read that pairs the two
    * frames (every BM25 query), use [[readIndex]] — these two resolve
    * their versions independently and can tear across a mid-commit
    * batch boundary. */
  def readPostings(spark: SparkSession, rootDir: String): DataFrame =
    SnapshotStore.readLatest(spark, rootDir + "/post", "text-index postings")

  def readLengths(spark: SparkSession, rootDir: String): DataFrame =
    SnapshotStore.readLatest(spark, rootDir + "/len", "text-index lengths")

  /** One foreachBatch step, public for spec-driven replay and crash
    * injection: fold change-batch `id` onto the carried index and
    * commit `f/` then `post/` then `len/` at `b=<id>`. */
  def foldBatch(batch: DataFrame, id: Long, rootDir: String,
      retainBelow: Int = 1): Unit = {
    val spark = batch.sparkSession
    val postPrev = SnapshotStore.stateSoFar(spark, s"$rootDir/post", id,
      emptyPostings(batch))
    val lenPrev = SnapshotStore.stateSoFar(spark, s"$rootDir/len", id,
      emptyLengths(batch))
    val fPrev = SnapshotStore.stateSoFar(spark, s"$rootDir/f", id,
      batch.select(lit(Long.MinValue).as("last_seq")).filter(lit(false)))
    val frontier = SnapshotStore.seqFrontier(fPrev, batch, "TextIndexStream")
    val ch = batch.select(col("seq"), col("op"),
      col("id").as("doc_id"), col("text"))
    // the batch reduction runs ONCE and is persisted across the two
    // frame expansions — each home's commit is its own action, so an
    // unshared plan would re-reduce the batch per home
    val latest = Cdc.latestChanges(ch, "doc_id", "seq", "op")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val postNext = Cdc.applyGroupedFromLatest(postPrev, latest, "doc_id")(
        c => TextAnalysis.tokenIndex(c, "doc_id", "text"))
      val lenNext = Cdc.applyGroupedFromLatest(lenPrev, latest, "doc_id")(
        c => TextAnalysis.docLengths(c, "doc_id", "text"))
      // frontier FIRST — the guard must throw before any state advances
      SnapshotStore.commit(frontier, s"$rootDir/f", id, retainBelow)
      SnapshotStore.commit(postNext, s"$rootDir/post", id, retainBelow)
      SnapshotStore.commit(lenNext, s"$rootDir/len", id, retainBelow)
    } finally latest.unpersist()
  }

  /** Sink a document change feed as a continuously-maintained BM25
    * index (see [[foldBatch]] for the contract). */
  def textIndexSink(changes: DataFrame, rootDir: String,
      checkpoint: String, retainBelow: Int = 1): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        foldBatch(batch, id, rootDir, retainBelow)
      }
      .start()
}
