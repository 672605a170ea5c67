package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming near-dup CLUSTER-MAP maintenance — the continuous twin
  * of [[graft.operators.Dedup.clustersMaintain]], closing the
  * freshness family's graph member the same way [[MinMaxStream]] and
  * [[TopKStream]] close the non-invertible aggregates: cluster
  * membership under deletes needs the EDGE SET (a removed bridge
  * splits a component no map-only state can repair), so this sink
  * carries signatures + pairs + the map, and each batch touches only
  * the changed keys' signatures, the batch-vs-index hamming screen's
  * candidates, and the feed-bounded affected clusters' induced
  * subgraph — never the corpus.
  *
  * Feed contract (one row per change): `(seq, op, id, text)` with
  * op ∈ I/U/D, payload NULL on deletes, `seq` feed-monotone.
  *
  * State lives under FOUR [[SnapshotStore]] homes per root — `sig/`
  * (one 64-bit simhash per live doc), `pairs/` (the HASH-level
  * near-pair edge set, (h_a, h_b) distinct-hash pairs within the
  * radius — O(docs + near-hash-pairs) state, so an all-duplicates
  * feed persists ZERO pair rows instead of N²/2; see
  * [[graft.operators.Dedup.ClusterIndexState]]), `cl/` (the cluster
  * map), and `f/` (the 1-row feed
  * frontier). Every home is read strictly-below the batch id, so a
  * crash between ANY two commits replays to identical content; the
  * monotone-seq guard rides the frontier plan and the FRONTIER HOME
  * COMMITS FIRST (the [[IvmStream]] join-twin lesson).
  *
  * The reference engine is read-only over static CSVs
  * (/root/reference/sqlengine.py; SURVEY.md §2.9); extension
  * surface. */
object ClusterStream {

  private[streaming] def emptySigs(batch: DataFrame): DataFrame =
    batch.select(col("id"), xxhash64(col("text")).as("simhash"))
      .filter(lit(false))

  private[streaming] def emptyPairs(batch: DataFrame): DataFrame =
    batch.select(xxhash64(col("text")).as("h_a"),
      xxhash64(col("text")).as("h_b")).filter(lit(false))

  private[streaming] def emptyClusters(batch: DataFrame): DataFrame =
    batch.select(col("id"), col("id").as("cluster_id")).filter(lit(false))

  /** Latest committed cluster map (the `cl/` home under `rootDir`). */
  def readClusters(spark: SparkSession, rootDir: String): DataFrame =
    SnapshotStore.readLatest(spark, rootDir + "/cl", "cluster map")

  /** Latest committed signature index (the `sig/` home). */
  def readSigs(spark: SparkSession, rootDir: String): DataFrame =
    SnapshotStore.readLatest(spark, rootDir + "/sig", "signature index")

  /** Latest committed hash-level near-pair edge set (the `pairs/`
    * home): (h_a, h_b) distinct-hash pairs within the radius. */
  def readPairs(spark: SparkSession, rootDir: String): DataFrame =
    SnapshotStore.readLatest(spark, rootDir + "/pairs", "near-pair set")

  /** One foreachBatch step, public for spec-driven replay and crash
    * injection: fold change-batch `id` onto the carried cluster index
    * and commit `f/`, `sig/`, `pairs/`, `cl/` at `b=<id>`. */
  def foldBatch(batch: DataFrame, id: Long, rootDir: String,
      maxHamming: Int = 3, chunks: Int = 4, retainBelow: Int = 1): Unit = {
    val spark = batch.sparkSession
    val prev = Dedup.ClusterIndexState(
      SnapshotStore.stateSoFar(spark, s"$rootDir/sig", id, emptySigs(batch)),
      SnapshotStore.stateSoFar(spark, s"$rootDir/pairs", id, emptyPairs(batch)),
      SnapshotStore.stateSoFar(spark, s"$rootDir/cl", id, emptyClusters(batch)))
    val fPrev = SnapshotStore.stateSoFar(spark, s"$rootDir/f", id,
      batch.select(lit(Long.MinValue).as("last_seq")).filter(lit(false)))
    val frontier = SnapshotStore.seqFrontier(fPrev, batch, "ClusterStream")
    // batch-scoped persist register: a CONTINUOUS sink folding every
    // micro-batch must release the maintenance's internal caches once
    // its homes commit, or it accumulates one corpus-sized cached
    // copy per batch (the caller-clearCache contract assumes a
    // per-query terminal action the long-running sink never reaches)
    val tracker = new graft.operators.Caching.PersistTracker
    try {
      val next = Dedup.clustersMaintain(prev, batch, "id", "text",
        "seq", "op", maxHamming, chunks, tracker = tracker)
      // frontier FIRST — the guard must throw before any state advances
      SnapshotStore.commit(frontier, s"$rootDir/f", id, retainBelow)
      SnapshotStore.commit(next.sigs, s"$rootDir/sig", id, retainBelow)
      SnapshotStore.commit(next.pairs, s"$rootDir/pairs", id, retainBelow)
      SnapshotStore.commit(next.clusters, s"$rootDir/cl", id, retainBelow)
    } finally tracker.release()
  }

  /** Sink a document change feed as a continuously-maintained near-dup
    * cluster map (see [[foldBatch]] for the contract). */
  def clusterSink(changes: DataFrame, rootDir: String, checkpoint: String,
      maxHamming: Int = 3, chunks: Int = 4,
      retainBelow: Int = 1): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        foldBatch(batch, id, rootDir, maxHamming, chunks, retainBelow)
      }
      .start()
}
