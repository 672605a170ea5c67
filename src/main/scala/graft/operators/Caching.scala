package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared persist toggle for multi-consumer intermediate frames
  * (dedup signatures, gram sets, LSH buckets).
  *
  * Cache-ownership contract (one place, referenced by every operator
  * that persists): the returned frames are lazy, so the operator has no
  * safe point to unpersist — cached blocks live until the session ends
  * or the caller releases them. A pipeline invoking these operators
  * repeatedly should either run its terminal action and then
  * `spark.catalog.clearCache()`, or pass `persist = false` and manage
  * caching of its own, wider plan. */
private[graft] object Caching {
  def maybePersist(df: DataFrame, persist: Boolean): DataFrame =
    if (persist) df.persist(StorageLevel.MEMORY_AND_DISK) else df

  /** A batch-scoped register of the frames an operator persisted, so a
    * LONG-RUNNING caller (a foreachBatch stream sink folding state
    * every micro-batch) can release exactly those blocks once its
    * terminal action commits — `spark.catalog.clearCache()` would
    * nuke unrelated session caches, and skipping the release
    * accumulates one corpus-sized cached copy per batch (the
    * BENCH_r09 eviction-storm shape, rediscovered by review in the
    * round-19 manifest sink). Not thread-safe; one tracker per fold. */
  final class PersistTracker {
    private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    private val ckpts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    private[Caching] def add(df: DataFrame): Unit = frames += df
    /** Register an eagerly `localCheckpoint(true)`-ed frame so
      * [[release]] also frees its RDD storage blocks — the checkpoint
      * twin of [[add]]: a per-batch stream fold otherwise leaks one
      * set of (feed-bounded, but real) checkpoint blocks per batch,
      * at the mercy of the async ContextCleaner. The frame is
      * unusable after release (see [[freeLocalCheckpoint]]). */
    def addCheckpoint(df: DataFrame): DataFrame = { ckpts += df; df }
    /** Unpersist every tracked frame and free every tracked local
      * checkpoint (non-blocking). Only call after the fold's terminal
      * action — the frames are lazy and the checkpoints' blocks are
      * their only storage. */
    def release(): Unit = {
      frames.foreach(_.unpersist(false)); frames.clear()
      ckpts.foreach(freeLocalCheckpoint); ckpts.clear()
    }
  }

  /** [[maybePersist]] that also registers the persisted frame with
    * `tracker` for a deterministic post-commit release. */
  def maybePersist(df: DataFrame, persist: Boolean,
      tracker: PersistTracker): DataFrame =
    if (persist) { tracker.add(df); df.persist(StorageLevel.MEMORY_AND_DISK) }
    else df

  /** Free the storage blocks behind a `localCheckpoint(true)`-ed frame.
    *
    * `Dataset.unpersist()` only releases catalog-cached plans; a local
    * checkpoint's blocks are RDD-level storage that otherwise lives
    * until the JVM garbage-collects the RDD object and the async
    * ContextCleaner gets around to it. In an iterative loop (connected
    * components, PageRank) that nondeterministic lag stacks one
    * checkpoint per round into real storage pressure — measured as
    * 1.5-2× iteration-time spread on the composed manifest bench and
    * eviction storms on whatever persists next. Call this on a round's
    * checkpoint once the NEXT round's checkpoint is materialized (the
    * frame is unusable afterwards: its lineage was truncated to the
    * very blocks being freed — never free the loop's final result). */
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => () // not a checkpointed frame — nothing to free
    }
}
