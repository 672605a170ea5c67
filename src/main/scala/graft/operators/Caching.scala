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
private[operators] object Caching {
  def maybePersist(df: DataFrame, persist: Boolean): DataFrame =
    if (persist) df.persist(StorageLevel.MEMORY_AND_DISK) else df
}
