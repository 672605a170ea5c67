package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Caching, Cdc, Dedup, Sampling}

/** The TRAINING MANIFEST itself as a continuously-maintained sink —
  * the streaming twin of the `pipeline_incremental_manifest` capstone
  * and the composition of the freshness family's pieces: each batch
  * of the document change feed is gated through a per-row quality
  * predicate ([[graft.operators.Cdc.gateFeed]] — a failing update
  * RETRACTS the doc from the curated corpus), the gated winners fold
  * onto the maintained near-dup cluster index
  * ([[graft.operators.Dedup.clustersMaintain]] — the [[ClusterStream]]
  * state homes), a per-doc metadata/score snapshot advances by the
  * same latest-wins fold, survivorship picks each cluster's keeper
  * ([[graft.operators.Dedup.keepBestFromClusters]] — with a constant
  * score the keeper degenerates to the min-id representative, the
  * batch capstone's rule), and the keepers' split assignment
  * ([[graft.operators.Sampling.assignSplits]], a pure id hash) lands
  * in a served `manifest/` home.
  *
  * Feed contract (one row per change): `(seq, op, id, text, lang)`
  * with op ∈ I/U/D, payload NULL on deletes, `seq` feed-monotone.
  *
  * State lives under SIX [[SnapshotStore]] homes per root — the
  * [[ClusterStream]] four (`f/`, `sig/`, `pairs/`, `cl/`) plus
  * `meta/` (the curated docs' (id, lang, __score) snapshot) and
  * `manifest/` (the served (id, lang, split) rows). Every home is a
  * pure function of the folded feed prefix and every read is
  * strictly-below the batch id, so a crash between ANY two commits
  * replays to identical content; the monotone-seq guard rides the
  * frontier plan and the FRONTIER HOME COMMITS FIRST (the
  * [[IvmStream]] join-twin lesson).
  *
  * The reference engine is read-only over static CSVs
  * (/root/reference/sqlengine.py; SURVEY.md §2.9); extension
  * surface. */
object ManifestStream {

  // the four ClusterStream homes share its empty-frame schemas — ONE
  // definition, so a state-schema change cannot silently diverge the
  // two sinks' layouts (they must stay home-compatible)
  import ClusterStream.{emptyClusters, emptyPairs, emptySigs}

  private def emptyMeta(batch: DataFrame, score: Column): DataFrame =
    batch.select(col("id"), col("lang"), score.as("__score"))
      .filter(lit(false))

  /** Latest committed manifest (the `manifest/` home under
    * `rootDir`): one (id, lang, split) row per surviving keeper. */
  def readManifest(spark: SparkSession, rootDir: String): DataFrame =
    SnapshotStore.readLatest(spark, rootDir + "/manifest", "manifest")

  /** Latest committed curated metadata snapshot (the `meta/` home). */
  def readMeta(spark: SparkSession, rootDir: String): DataFrame =
    SnapshotStore.readLatest(spark, rootDir + "/meta", "manifest meta")

  /** One foreachBatch step, public for spec-driven replay and crash
    * injection: gate change-batch `id` through `classify`, fold the
    * curated feed onto the carried cluster index + metadata snapshot,
    * re-derive survivorship and splits, and commit `f/`, `sig/`,
    * `pairs/`, `cl/`, `meta/`, `manifest/` at `b=<id>`.
    *
    * `classify` is the [[graft.operators.Cdc.gateFeed]] per-row keep
    * predicate (e.g. [[graft.operators.TextAnalysis.filterBattery]]);
    * `score` is the survivorship quality proxy evaluated over the
    * gated winners' columns — `lit(0.0)` reproduces the batch
    * capstone's min-id keeper rule exactly. */
  def foldBatch(batch: DataFrame, id: Long, rootDir: String,
      classify: DataFrame => DataFrame, score: Column,
      splits: Seq[(String, Double)], maxHamming: Int = 3,
      chunks: Int = 4, retainBelow: Int = 1): Unit = {
    val spark = batch.sparkSession
    val prev = Dedup.ClusterIndexState(
      SnapshotStore.stateSoFar(spark, s"$rootDir/sig", id, emptySigs(batch)),
      SnapshotStore.stateSoFar(spark, s"$rootDir/pairs", id,
        emptyPairs(batch)),
      SnapshotStore.stateSoFar(spark, s"$rootDir/cl", id,
        emptyClusters(batch)))
    val metaPrev = SnapshotStore.stateSoFar(spark, s"$rootDir/meta", id,
      emptyMeta(batch, score))
    val fPrev = SnapshotStore.stateSoFar(spark, s"$rootDir/f", id,
      batch.select(lit(Long.MinValue).as("last_seq")).filter(lit(false)))
    val frontier = SnapshotStore.seqFrontier(fPrev, batch, "ManifestStream")
    // gate once, consume thrice (cluster fold, meta fold, and the
    // maintenance-internal key reductions) — eager checkpoint keeps
    // the batch-bounded curated feed from re-classifying per consumer;
    // freed in the finally below so a frontier-guard trip or a
    // classify contract violation cannot strand the blocks
    val gated = Cdc.gateFeed(
      batch.select(col("seq"), col("op"), col("id"), col("text"),
        col("lang")), "id", "seq", "op")(classify)
      .localCheckpoint(true)
    // batch-scoped persist register — the ClusterStream.foldBatch
    // rationale: a continuous sink must release the maintenance's
    // internal caches every batch or accumulate corpus-sized copies
    val tracker = new Caching.PersistTracker
    try {
      val next = Dedup.clustersMaintain(prev,
        gated.select(col("seq"), col("op"), col("id"), col("text")),
        "id", "text", "seq", "op", maxHamming, chunks, tracker = tracker)
      val metaNext = Cdc.applyChanges(metaPrev,
        gated.select(col("id"), col("lang"), score.as("__score"),
          col("seq"), col("op")),
        "id", "seq", "op")
      // frontier FIRST — the guard must throw before any state advances
      SnapshotStore.commit(frontier, s"$rootDir/f", id, retainBelow)
      SnapshotStore.commit(next.sigs, s"$rootDir/sig", id, retainBelow)
      SnapshotStore.commit(next.pairs, s"$rootDir/pairs", id, retainBelow)
      SnapshotStore.commit(next.clusters, s"$rootDir/cl", id, retainBelow)
      SnapshotStore.commit(metaNext, s"$rootDir/meta", id, retainBelow)
      // survivorship + splits are served FROM THE COMMITTED homes (flat
      // parquet lineage — the CC map and meta snapshot re-read cheaply,
      // and the manifest stays a pure function of committed state)
      val clNow = SnapshotStore.stateSoFar(spark, s"$rootDir/cl", id + 1,
        emptyClusters(batch))
      val metaNow = SnapshotStore.stateSoFar(spark, s"$rootDir/meta", id + 1,
        emptyMeta(batch, score))
      val keepers = Dedup.keepBestFromClusters(clNow,
          metaNow.select(col("id"), col("__score")), "id")
        .filter(col("keep")).select(col("id"))
      val manifest = Sampling.assignSplits(
          keepers.join(metaNow.select(col("id"), col("lang")), Seq("id")),
          "id", splits)
        .select(col("id"), col("lang"), col("split"))
      SnapshotStore.commit(manifest, s"$rootDir/manifest", id, retainBelow)
    } finally {
      tracker.release()
      Caching.freeLocalCheckpoint(gated)
    }
  }

  /** Sink a document change feed as a continuously-maintained
    * training manifest (see [[foldBatch]] for the contract). */
  def manifestSink(changes: DataFrame, rootDir: String, checkpoint: String,
      classify: DataFrame => DataFrame, score: Column,
      splits: Seq[(String, Double)], maxHamming: Int = 3,
      chunks: Int = 4, retainBelow: Int = 1): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        foldBatch(batch, id, rootDir, classify, score, splits,
          maxHamming, chunks, retainBelow)
      }
      .start()
}
