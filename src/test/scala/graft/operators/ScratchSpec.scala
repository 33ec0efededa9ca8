package graft.operators

import org.apache.spark.storage.StorageLevel

import graft.SparkSpec

/** Pins the harness contract of [[Scratch]]: release drops exactly the
  * registered query-scoped persists (by canonicalized-plan match) and
  * leaves independently persisted relations alone — the property Bench
  * and Verify rely on to keep the shared dedup pair cache resident
  * while scratch relations stop pinning executor memory. */
class ScratchSpec extends SparkSpec {

  test("release unpersists registered frames and empties the registry") {
    val df = spark.range(100).toDF("x")
    val p = Scratch.persist(df)
    p.count()
    assert(p.storageLevel != StorageLevel.NONE, "persist must register a storage level")
    Scratch.release()
    // CacheManager matches by canonicalized plan, so the original frame
    // reports uncached too
    assert(p.storageLevel == StorageLevel.NONE)
    assert(df.storageLevel == StorageLevel.NONE)
    Scratch.release() // idempotent on an empty registry
  }

  test("release leaves independently persisted relations resident") {
    val keep = spark.range(50).toDF("y").persist(StorageLevel.MEMORY_AND_DISK)
    try {
      keep.count()
      Scratch.persist(spark.range(10).toDF("z")).count()
      Scratch.release()
      assert(keep.storageLevel != StorageLevel.NONE,
        "session-lived caches must survive a scratch release")
    } finally keep.unpersist()
  }
}
