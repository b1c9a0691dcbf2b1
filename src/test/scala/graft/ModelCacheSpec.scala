package graft

import org.apache.spark.sql.functions._
import graft.operators.ModelCache

/** The artifact-identity and lifecycle contracts of the
  * train-once/serve-many registry: reuse VERIFIES the stored key (a
  * 32-bit directory-name collision must rebuild into the next slot,
  * never silently serve the wrong model), the key rides inside the
  * atomic publish, and the size cap evicts least-recently-served
  * artifacts without ever touching one this process still serves.
  */
class ModelCacheSpec extends SparkSpec {

  private def hashOf(key: String): String =
    f"${scala.util.hashing.MurmurHash3.stringHash(s"v${ModelCache.Version}|$key")}%08x"

  private def base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft-model-cache")

  test("a planted hash collision rebuilds into the next slot — never serves the wrong model") {
    import java.nio.file.Files
    import spark.implicits._
    val key = s"collision-spec|${java.util.UUID.randomUUID()}"
    // plant an artifact at key's slot-0 directory carrying a DIFFERENT key
    val slot0 = base.resolve(s"model-${hashOf(key)}")
    Files.createDirectories(slot0)
    Files.writeString(slot0.resolve("_KEY"), "some-other-key-entirely")
    Files.writeString(slot0.resolve("_SUCCESS"), "")
    Files.writeString(slot0.resolve("impostor.txt"), "wrong model bytes")
    val before = ModelCache.builtCount.get()
    val d = ModelCache.dir(key)(Seq((1L, 42L)).toDF("id", "v"))
    assert(d === slot0.getParent.resolve(s"model-${hashOf(key)}-1").toString,
      "collision must probe the deterministic next slot")
    assert(ModelCache.builtCount.get() === before + 1)
    // the impostor is untouched; the real artifact serves the real data
    assert(Files.readString(slot0.resolve("_KEY")) === "some-other-key-entirely")
    assert(spark.read.parquet(d).select(col("v")).head().getLong(0) === 42L)
    // disk reuse (fresh-JVM simulation) resolves the SAME slot-1 dir
    // without rebuilding — the stored key, not the dir name, is identity
    ModelCache.clearMemo()
    val d2 = ModelCache.dir(key)(fail("rebuilt despite a key-verified artifact"))
    assert(d2 === d && ModelCache.builtCount.get() === before + 1)
  }

  test("a legacy artifact without _KEY is never served — identity must be provable") {
    import java.nio.file.Files
    import spark.implicits._
    val key = s"legacy-spec|${java.util.UUID.randomUUID()}"
    val slot0 = base.resolve(s"model-${hashOf(key)}")
    Files.createDirectories(slot0)
    Files.writeString(slot0.resolve("_SUCCESS"), "")
    val before = ModelCache.builtCount.get()
    val d = ModelCache.dir(key)(Seq((1L, 7L)).toDF("id", "v"))
    assert(d.endsWith("-1") && ModelCache.builtCount.get() === before + 1)
  }

  test("size cap evicts least-recently-served artifacts; the in-memo artifact is pinned") {
    import java.nio.file.Files
    import spark.implicits._
    // isolated registry via the injected-root sysprop (NOT by repointing
    // the process-wide java.io.tmpdir, which would misroute concurrent
    // suites' temp files); grace=0 so only the memo pin is under test
    val isolated = Files.createTempDirectory("mc-evict-spec")
    sys.props("graft.model.cache.dir") = isolated.toString
    sys.props("graft.model.cache.grace.min") = "0"
    try {
      val keyA = s"evict-a|${java.util.UUID.randomUUID()}"
      val keyB = s"evict-b|${java.util.UUID.randomUUID()}"
      val dA = ModelCache.dir(keyA)(Seq((1L, 1L)).toDF("id", "v"))
      assert(Files.exists(java.nio.file.Paths.get(dA, "_SUCCESS")))
      // unpin A (fresh-JVM simulation), then publish B under a 0-byte cap:
      // A must be evicted, B (pinned by this process's memo) must survive
      ModelCache.clearMemo()
      sys.props("graft.model.cache.cap.mb") = "0"
      val evictedBefore = ModelCache.evictedCount.get()
      val dB = ModelCache.dir(keyB)(Seq((2L, 2L)).toDF("id", "v"))
      assert(!Files.exists(java.nio.file.Paths.get(dA)), "LRU artifact must be evicted")
      assert(Files.exists(java.nio.file.Paths.get(dB, "_SUCCESS")), "pinned artifact must survive")
      assert(ModelCache.evictedCount.get() > evictedBefore)
    } finally {
      sys.props -= "graft.model.cache.cap.mb"
      sys.props -= "graft.model.cache.grace.min"
      sys.props -= "graft.model.cache.dir"
    }
  }

  test("grace window pins a sibling process's in-flight artifact across a cap crossing") {
    import java.nio.file.Files
    import spark.implicits._
    val isolated = Files.createTempDirectory("mc-grace-spec")
    sys.props("graft.model.cache.dir") = isolated.toString
    try {
      val keyA = s"grace-a|${java.util.UUID.randomUUID()}"
      val keyB = s"grace-b|${java.util.UUID.randomUUID()}"
      val keyC = s"grace-c|${java.util.UUID.randomUUID()}"
      val dA = ModelCache.dir(keyA)(Seq((1L, 1L)).toDF("id", "v"))
      val dB = ModelCache.dir(keyB)(Seq((2L, 2L)).toDF("id", "v"))
      // second-process simulation: OUR memo forgets both, but A was just
      // touched (its _KEY mtime is fresh — exactly what a sibling JVM's
      // resolve leaves behind), while B's last touch is backdated beyond
      // the grace window, i.e. genuinely idle
      ModelCache.clearMemo()
      Files.setLastModifiedTime(
        java.nio.file.Paths.get(dB, "_KEY"),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - ModelCache.graceMillis - 60000L))
      sys.props("graft.model.cache.cap.mb") = "0"
      // pin the high-water mark out of the way: this test is about the
      // SOFT cap's grace semantics, not the capacity override
      sys.props("graft.model.cache.highwater.mb") = "1048576"
      val dC = ModelCache.dir(keyC)(Seq((3L, 3L)).toDF("id", "v"))
      assert(Files.exists(java.nio.file.Paths.get(dA, "_SUCCESS")),
        "recently-touched artifact must survive the cap crossing — a sibling may be mid-read")
      assert(!Files.exists(java.nio.file.Paths.get(dB)),
        "idle (beyond-grace) artifact is the one the cap reclaims")
      assert(Files.exists(java.nio.file.Paths.get(dC, "_SUCCESS")))
      // the surviving artifact still SERVES after the crossing, as the
      // sibling would observe mid-query
      assert(spark.read.parquet(dA).select(col("v")).head().getLong(0) === 1L)
    } finally {
      sys.props -= "graft.model.cache.cap.mb"
      sys.props -= "graft.model.cache.highwater.mb"
      sys.props -= "graft.model.cache.dir"
    }
  }

  test("high-water mark reclaims within-grace artifacts once the soft cap is truly blown") {
    import java.nio.file.Files
    import spark.implicits._
    val isolated = Files.createTempDirectory("mc-hw-spec")
    sys.props("graft.model.cache.dir") = isolated.toString
    try {
      val keyA = s"hw-a|${java.util.UUID.randomUUID()}"
      val keyB = s"hw-b|${java.util.UUID.randomUUID()}"
      val dA = ModelCache.dir(keyA)(Seq((1L, 1L)).toDF("id", "v"))
      // unpin A but leave its _KEY touch FRESH (inside grace): under the
      // soft cap alone it would be unevictable forever — the r14 advisor
      // finding. With cap=0 and high-water=0 the capacity override must
      // reclaim it anyway; B stays pinned by this process's memo.
      ModelCache.clearMemo()
      sys.props("graft.model.cache.cap.mb") = "0"
      sys.props("graft.model.cache.highwater.mb") = "0"
      val overBefore = ModelCache.graceOverriddenCount.get()
      val dB = ModelCache.dir(keyB)(Seq((2L, 2L)).toDF("id", "v"))
      assert(!Files.exists(java.nio.file.Paths.get(dA)),
        "past the high-water mark, grace must stop protecting idle-process artifacts")
      assert(Files.exists(java.nio.file.Paths.get(dB, "_SUCCESS")),
        "this process's pinned artifact survives even the high-water pass")
      assert(ModelCache.graceOverriddenCount.get() > overBefore,
        "the grace override must be observable")
    } finally {
      sys.props -= "graft.model.cache.cap.mb"
      sys.props -= "graft.model.cache.highwater.mb"
      sys.props -= "graft.model.cache.dir"
    }
  }
}
