package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A group of related operators contributing to the SparkEntry registry. */
trait OpModule {
  /** op name → (session, sfDir) => result. Names are SURVEY.md §2 keys. */
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** op name → equivalent DuckDB SQL over the fixture tables. Keys absent
    * here (streaming / approximate ops) get a rows-only check. */
  def oracle: Map[String, String]
}

private[graft] object MemoUtil {
  /** Free the block-manager storage behind a localCheckpoint'd DataFrame
    * (its analyzed plan is a LogicalRDD over the materialized blocks).
    * Memo resets must call this before dropping their references —
    * clearing the map alone strands the checkpoint blocks until GC,
    * inflating memory across bench passes. */
  def dropCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Atomic memoized build. TrieMap.getOrElseUpdate is NOT atomic: two
    * concurrent first callers can both run the builder, and the loser's
    * localCheckpoint blocks strand in the block manager (nothing ever
    * calls dropCheckpoint on a value the map discarded). Serializing
    * the build on the map costs nothing — builds are once-per-(session,
    * dir) and the harness is single-threaded — and makes the leak
    * impossible rather than latent. */
  def memoize[K, V](m: scala.collection.concurrent.TrieMap[K, V], k: K)(
      build: => V): V =
    m.synchronized { m.getOrElseUpdate(k, build) }

  /** INTRA-op checkpoints (multi-reader lineage cuts whose blocks the
    * returned plan still references) can't unpersist inside the op — the
    * caller hasn't executed the result yet, and a localCheckpoint'd RDD
    * is unrecoverable once its blocks drop. They register here instead,
    * and the harness frees them at the safe points: Verify after each
    * query's parquet is written, Bench between timing passes. Without
    * this they strand in the block manager until ContextCleaner GC —
    * the one leak the r6 advice flagged. */
  private val scratchRefs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  def scratch(df: DataFrame): DataFrame = synchronized {
    scratchRefs += df; df
  }

  def dropScratch(): Unit = synchronized {
    scratchRefs.foreach(dropCheckpoint)
    scratchRefs.clear()
    drainHooks.foreach(f => f())
    drainHooks.clear()
  }

  /** One-shot cleanup hooks run at the same safe points as scratch
    * frees (Verify after each query's parquet lands, Bench after each
    * query's toRdd drains): an op whose RESULT still references session
    * state it wants released — scan_cached's eager `CACHE TABLE`, which
    * cannot uncache inline because the returned DataFrame executes
    * lazily — registers the release here instead of leaving it squatting
    * on executor memory under every subsequent query (ADVICE r12). */
  private val drainHooks = scala.collection.mutable.ArrayBuffer.empty[() => Unit]

  def onDrain(f: () => Unit): Unit = synchronized { drainHooks += f }
}
