package graft.operators

import org.apache.spark.sql.DataFrame

/** Registry for QUERY-SCOPED persisted relations.
  *
  * Several operators persist an intermediate consumed more than once
  * inside the returned lazy plan (the LSH-normalized embedding relation,
  * the PQ subvector relation). The persist is correct — without it the
  * multi-consumer plan recomputes the scan per consumer — but the frame
  * lives inside a lazily-returned DataFrame, so the operator itself has
  * no point after the action where it could unpersist. Left alone, those
  * blocks pin executor storage for the REST OF THE SESSION and compete
  * with every later query's shuffle/cache memory — exactly the kind of
  * cross-query interference the bench's median-of-3 protocol is meant
  * to keep out of the numbers.
  *
  * So: operators register such frames here via [[persist]], and the
  * harnesses ([[graft.Bench]], [[graft.Verify]]) call [[release]] BETWEEN
  * queries — after one query's action(s) complete, before the next
  * starts — which unpersists everything registered without touching
  * deliberately session-lived caches (the dedup pair cache, the PQ
  * codebook). Spark's CacheManager dedups cache entries by canonicalized
  * plan, so re-registering the same relation across a query's warm-up +
  * timed reps reuses one entry and release drops it once. */
object Scratch {
  private val reg = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Persist (MEMORY_AND_DISK) and register for the next [[release]]. */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    reg.add(p)
    p
  }

  /** [[persist]] + EAGER materialization (one count action) — for
    * relations consumed by SEVERAL exchange subtrees of the same query.
    * AQE submits independent exchange-write jobs CONCURRENTLY, so a
    * lazily-persisted multi-consumer relation is materialized under a
    * RACE: every consumer stage's tasks contend on the cold cache
    * blocks' locks, parked waiters occupy task slots while cores sit
    * idle, and wall time becomes a function of scheduling interleave —
    * measured on dd_containment at x100n as a 13-30 s vs 4 s swing that
    * was non-monotonic in the shuffle-partition count (SCALE.md
    * round-14; the r13 "partition-assignment luck" watch item was THIS,
    * not key skew — StageProf showed max/p50 ≤ 2 on every stage).
    * Materializing the blocks in one serial stage before the consumers
    * fan out removes the race for the price of one extra pass over the
    * (already-persisted) relation. */
  def materialize(df: DataFrame): DataFrame = {
    val p = persist(df)
    p.count()
    p
  }

  /** Unpersist every registered frame (non-blocking; safe if the
    * session that owned a frame is already stopped). */
  def release(): Unit = {
    var d = reg.poll()
    while (d != null) {
      try d.unpersist(blocking = false) catch { case _: Throwable => () }
      d = reg.poll()
    }
  }
}
