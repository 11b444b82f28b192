package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow

/** Generational checkpoint manager for iterative DataFrame algorithms
  * (IRLS in [[graft.glm.GroupedGLM]], label propagation in
  * [[graft.ops.Dedup.connectedComponents]]).
  *
  * `Dataset.checkpoint()` gives durability and flat lineage but leaks:
  * superseded reliable-checkpoint files accumulate in the checkpoint dir
  * for the life of the application, and superseded `localCheckpoint`
  * blocks stay pinned in executor storage — an N-iteration fit holds N
  * generations of state. This helper checkpoints at the RDD level so it
  * keeps a handle to each generation and, as soon as the NEXT generation
  * is materialized, deletes the previous one's checkpoint files (reliable)
  * or unpersists its blocks (local). At any moment at most two
  * generations exist; a multi-hour 100 TB job's checkpoint dir stays
  * O(state size), not O(state × iterations).
  *
  * Durability contract (unchanged from before): RELIABLE `checkpoint()`
  * when `checkpointDir` is given or the session already has one set —
  * survives executor loss; `localCheckpoint` (lineage severed
  * unrecoverably) only as the local-mode default. When this helper sets
  * the session checkpoint dir, `close()` restores the previous value
  * (including none — `setCheckpointDir(null)` unsets), so no
  * session-global state leaks out of a fit.
  *
  * The FINAL generation backs the returned DataFrame, so it is NOT
  * cleaned by `close()` — it lives until the RDD is garbage-collected
  * (enable `spark.cleaner.referenceTracking.cleanCheckpoints` to reap its
  * files then) or the application exits.
  */
private[graft] final class Checkpointer(spark: SparkSession,
    checkpointDir: Option[String]) {
  private val sc = spark.sparkContext
  private val prevDir = sc.getCheckpointDir
  checkpointDir.foreach(sc.setCheckpointDir)
  private val reliable = sc.getCheckpointDir.isDefined
  private var last: RDD[InternalRow] = null

  /** Checkpoint `df` eagerly (materialized before return) and free the
    * previous tracked generation. The returned frame reads from the
    * checkpoint — flat lineage.
    */
  def apply(df: DataFrame): DataFrame = {
    val out = checkpointRdd(df)
    clean(last)
    last = out._2
    out._1
  }

  /** [[apply]], also returning the row count the materialization already
    * computed — iterative loops with a size-based convergence probe
    * (k-core peel, BFS frontier) read it for free instead of launching a
    * second count job per generation.
    */
  def applyCounted(df: DataFrame): (DataFrame, Long) = {
    val out = checkpointRdd(df)
    clean(last)
    last = out._2
    (out._1, out._3)
  }

  /** Checkpoint OUTSIDE the generation chain — for loop-invariant frames
    * (e.g. the edge relation) that every iteration reads. Freed only at
    * `close()`.
    */
  def pin(df: DataFrame): DataFrame = {
    val out = checkpointRdd(df, serialized = true)
    pinned ::= out._2
    out._1
  }
  private var pinned: List[RDD[InternalRow]] = Nil

  /** Checkpoint a generation that BACKS the returned result — tracked
    * nowhere, never freed by [[close]]; like the final [[apply]]
    * generation it lives until the RDD is garbage-collected. For
    * algorithms whose RESULT is the union over ALL generations
    * ([[graft.ops.Graph.randomWalks]]): returning the union of kept
    * generations instead of re-checkpointing it avoids holding a second
    * full-output copy in executor storage on top of the generations
    * themselves — the r13 q338 100× run blew past storage exactly there.
    */
  def keep(df: DataFrame): DataFrame = checkpointRdd(df, serialized = true)._1

  /** Free pinned generations and restore the caller's checkpoint dir.
    * The last tracked generation stays alive (it backs the result frame).
    * Note `setCheckpointDir` always resolves to a fresh UUID subdirectory,
    * so the restored dir is a CHILD of the previous one — subsequent
    * checkpoints still land under the caller's chosen root.
    */
  def close(): Unit = {
    pinned.foreach(clean)
    pinned = Nil
    if (checkpointDir.isDefined) sc.setCheckpointDir(prevDir.orNull)
  }

  /** `serialized` (long-lived frames: [[pin]]/[[keep]]): persist the
    * local checkpoint MEMORY_AND_DISK_SER instead of the deserialized
    * default — `localCheckpoint` keeps an existing level's
    * (de)serialization flag when adding disk, and serialized rows run
    * 3-5× smaller, so loop-invariant relations and result-backing
    * generations stop starving execution memory (the r13→r14 q338 100×
    * run OOM'd its PMI aggregation against deserialized pinned walk
    * state). Generation-chain frames ([[apply]]) stay deserialized:
    * they are short-lived and re-read in the hot loop.
    */
  private def checkpointRdd(df: DataFrame,
      serialized: Boolean = false): (DataFrame, RDD[InternalRow], Long) = {
    // INTERNAL rows end to end (GraftSqlShim): `df.rdd` would decode every
    // row to an external Row here and re-encode it on every downstream
    // read — pure per-row overhead for a frame only Spark itself touches.
    // (Partitioning/ordering preservation was tried and measured a net
    // loss — see the GraftSqlShim scaladoc; only exact statistics ride
    // along.)
    val rdd = GraftSqlShim.toInternalRdd(df)
    if (reliable) rdd.checkpoint()
    else {
      if (serialized)
        rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      rdd.localCheckpoint()
    }
    // materialize now (so the predecessor can be freed), measuring exact
    // row count + bytes in the same job for truthful planner statistics
    val (n, bytes) = GraftSqlShim.materializeCounted(rdd, df.schema)
    (GraftSqlShim.fromInternalRdd(df, rdd, Some((n, bytes))), rdd, n)
  }

  private def clean(r: RDD[InternalRow]): Unit = if (r != null) {
    r.getCheckpointFile.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      // best-effort: a failed delete only re-introduces the old leak
      try p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
      catch { case scala.util.control.NonFatal(_) => }
    }
    r.unpersist(blocking = false)
  }
}
