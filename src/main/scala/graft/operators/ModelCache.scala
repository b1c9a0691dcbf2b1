package graft.operators

import org.apache.spark.sql.DataFrame

/** Train-once/serve-many registry for model artifacts (embedding
  * matrices, signature indexes): a content-keyed parquet directory
  * OUTSIDE [[graft.sources.Staging]] (whose per-query cleanup would
  * defeat serve-many), published ATOMICALLY — build into a temp dir,
  * `ATOMIC_MOVE` into the keyed path — so a killed or concurrent JVM can
  * never expose a half-written artifact, and `_SUCCESS` (parquet's own
  * commit marker, carried along by the move) gates reuse. Deterministic
  * builders are what make cross-process reuse sound: same key ⇒
  * bit-identical artifact, whoever built it.
  *
  * This is the production discipline: a model or index is built once
  * per corpus snapshot and SERVED from a table; evaluation, similarity,
  * and point-probe queries never re-run training or re-sign the corpus.
  * Keys must embed every semantic input (corpus path, builder params)
  * plus [[Version]] — bump it whenever any builder's semantics change so
  * an artifact from an older build can never serve a newer query.
  *
  * Identity is VERIFIED, never assumed: the directory name is a 32-bit
  * hash of the key, so two distinct keys can collide; every artifact
  * carries its FULL key in a `_KEY` file (written before the atomic
  * move, so it is exactly as durable as the data), and reuse compares
  * the stored key byte-for-byte — a mismatch probes the next
  * deterministic slot (`model-<hash>-1`, `-2`, …) instead of silently
  * serving the wrong model. Lifecycle is bounded: the registry tracks
  * total on-disk bytes and evicts least-recently-served artifacts
  * (LRU by `_KEY` mtime, touched on every reuse) over
  * [[cacheCapBytes]], never evicting a key this process is actively
  * serving nor one any process touched within [[graceMillis]] — the
  * lock-free cross-process pin.
  */
object ModelCache {

  /** Artifact-format/builder-semantics version, part of every key. */
  val Version = 1

  /** Total on-disk cap for the registry, bytes (default 4 GiB;
    * override with GRAFT_MODEL_CACHE_CAP_MB or sysprop
    * graft.model.cache.cap.mb). Artifacts otherwise accumulate in
    * java.io.tmpdir unboundedly across corpora and Version bumps.
    */
  def cacheCapBytes: Long = {
    val mb = sys.props.get("graft.model.cache.cap.mb")
      .orElse(sys.env.get("GRAFT_MODEL_CACHE_CAP_MB"))
      .map(_.toLong)
      .getOrElse(4096L)
    mb * 1024L * 1024L
  }

  /** Eviction grace window (default 60 min; override with sysprop
    * graft.model.cache.grace.min): artifacts whose `_KEY` mtime is
    * younger than this are NEVER evicted, whoever touched them. Reuse
    * in ANY process touches `_KEY`, so a sibling JVM's in-flight read
    * keeps its artifact alive without cross-process locks — the memo
    * pin below only protects THIS process; the grace window is what
    * makes eviction race-free across concurrent bench/verify children.
    * 60 min exceeds any plausible single query at the bench scale.
    */
  def graceMillis: Long =
    sys.props.get("graft.model.cache.grace.min").map(_.toLong).getOrElse(60L) * 60000L

  /** In-process memo of key → published dir (the disk check is cheap,
    * but computeIfAbsent also serializes concurrent builders).
    */
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, String]

  /** Observability for the no-silent-rebuild contract: how many times
    * this process actually ran a builder (spec-asserted ≤ 1 per key).
    */
  val builtCount = new java.util.concurrent.atomic.AtomicLong

  /** Observability for eviction: artifacts deleted by the size cap. */
  val evictedCount = new java.util.concurrent.atomic.AtomicLong

  /** Of [[evictedCount]], how many were reclaimed past the high-water
    * mark DESPITE being inside the grace window (capacity override).
    */
  val graceOverriddenCount = new java.util.concurrent.atomic.AtomicLong

  /** Hard ceiling above which the grace window stops protecting
    * artifacts (default 2× [[cacheCapBytes]]; override with sysprop
    * graft.model.cache.highwater.mb): the cap stays soft under normal
    * concurrency — nothing in-flight is ever reclaimed — but disk
    * usage is BOUNDED even when every artifact is freshly touched.
    */
  def highWaterBytes: Long =
    sys.props.get("graft.model.cache.highwater.mb")
      .map(_.toLong * 1024L * 1024L)
      .getOrElse(2L * cacheCapBytes)

  /** Test hook: drop the in-process memo so a spec can prove the DISK
    * reuse path (a fresh JVM finding a published artifact) never
    * re-invokes the builder.
    */
  private[graft] def clearMemo(): Unit = memo.clear()

  /** Registry root: sysprop graft.model.cache.dir when set (specs
    * inject an isolated root here instead of repointing the process-wide
    * java.io.tmpdir), else `$java.io.tmpdir/graft-model-cache`.
    */
  private def baseDir: java.nio.file.Path = {
    val p = sys.props.get("graft.model.cache.dir")
      .map(java.nio.file.Paths.get(_))
      .getOrElse(java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft-model-cache"))
    java.nio.file.Files.createDirectories(p)
    p
  }

  /** Resolve (building at most once per key, process-wide AND
    * disk-wide) the artifact directory for `key`. `singleFile`
    * coalesces bounded artifacts (a |V|-row matrix, a stump table) to
    * one file; pass false for data-scale artifacts (a band index),
    * which keep their natural partitioning.
    */
  def dir(key: String, singleFile: Boolean = true)(build: => DataFrame): String =
    memo.computeIfAbsent(
      s"v$Version|$key",
      fullKey => {
        import java.nio.file.{Files, Paths, StandardCopyOption}
        val base = baseDir
        val hash = f"${scala.util.hashing.MurmurHash3.stringHash(fullKey)}%08x"
        var slot = 0
        var resolved: String = null
        while (resolved == null) {
          val out = base.resolve(if (slot == 0) s"model-$hash" else s"model-$hash-$slot")
          val keyFile = out.resolve("_KEY")
          if (Files.exists(out.resolve("_SUCCESS"))) {
            val stored =
              if (Files.exists(keyFile)) Files.readString(keyFile) else ""
            if (stored == fullKey) {
              // serve — and record the reuse for LRU ordering
              try Files.setLastModifiedTime(
                keyFile, java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
              catch { case _: java.io.IOException => () }
              resolved = out.toString
            } else slot += 1 // 32-bit collision (or pre-_KEY legacy): next slot
          } else {
            // a dir without the marker is debris from a crash of an older
            // non-atomic writer — clear it before publishing
            if (Files.exists(out)) deleteTree(out)
            val tmp = Files.createTempDirectory(base, "build-")
            val df = build
            (if (singleFile) df.coalesce(1) else df)
              .write.mode("overwrite").parquet(tmp.toString)
            // the key rides INSIDE the atomic move: a published dir can
            // never exist without its identity
            Files.writeString(tmp.resolve("_KEY"), fullKey)
            try {
              Files.move(tmp, out, StandardCopyOption.ATOMIC_MOVE)
              builtCount.incrementAndGet()
              resolved = out.toString
              // size changes ONLY on publish, so the registry walk runs
              // once per build, not per resolve — reuse never re-walks
              evictOverCap(base, resolved)
            } catch {
              // another process published this slot first: loop WITHOUT
              // advancing the slot — re-read it; if its key matches we
              // serve the (identical) copy, else we probe the next slot
              case _: java.nio.file.FileAlreadyExistsException => deleteTree(tmp)
              case _: java.nio.file.FileSystemException => deleteTree(tmp)
            }
          }
        }
        resolved
      })

  /** Delete least-recently-served artifacts until the registry fits
    * [[cacheCapBytes]]. Recency is the `_KEY` mtime (touched on every
    * reuse); artifacts memoized by THIS process are pinned — a live
    * DataFrame may still be reading them — and artifacts touched within
    * [[graceMillis]] are pinned for EVERY process, so a concurrent JVM's
    * in-flight read (which touched `_KEY` at resolve time) can never
    * lose its files mid-scan. Runs only on publish: reuse cannot grow
    * the registry, so it never pays this walk.
    */
  private def evictOverCap(base: java.nio.file.Path, justPublished: String): Unit = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    // the caller's dir is passed explicitly: eviction runs INSIDE its
    // computeIfAbsent mapping, i.e. before the memo insert lands
    val pinned = memo.values().asScala.toSet + justPublished
    def treeSize(p: java.nio.file.Path): Long = {
      val s = Files.walk(p)
      try s.iterator().asScala.filter(Files.isRegularFile(_)).map(Files.size).sum
      finally s.close()
    }
    val listing = Files.list(base)
    val entries =
      try listing.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("model-"))
        .filter(p => Files.exists(p.resolve("_SUCCESS")))
        .map { p =>
          val touched =
            try Files.getLastModifiedTime(p.resolve("_KEY")).toMillis
            catch { case _: java.io.IOException => 0L }
          (p, treeSize(p), touched)
        }
        .toVector
      finally listing.close()
    var total = entries.map(_._2).sum
    val cap = cacheCapBytes
    if (total > cap) {
      val now = System.currentTimeMillis()
      val grace = graceMillis
      val deleted = scala.collection.mutable.Set.empty[String]
      entries.sortBy(_._3).foreach { case (p, sz, touched) =>
        if (total > cap && !pinned.contains(p.toString) && now - touched >= grace) {
          deleteTree(p)
          deleted += p.toString
          evictedCount.incrementAndGet()
          total -= sz
        }
      }
      // HARD HIGH-WATER MARK: the grace window makes the cap soft (any
      // artifact touched within the hour is unevictable for every
      // process), so a busy multi-process bench could otherwise sit
      // over cap indefinitely. Past highWaterBytes the oldest
      // beyond-THIS-PROCESS artifacts are reclaimed regardless of
      // grace — a concurrent reader loses only a rebuildable artifact
      // (its builder is deterministic; the next resolve republishes),
      // which is the right trade once disk is actually scarce.
      if (total > highWaterBytes) {
        entries.sortBy(_._3).foreach { case (p, sz, _) =>
          if (total > cap && !pinned.contains(p.toString) && !deleted.contains(p.toString)) {
            deleteTree(p)
            deleted += p.toString
            evictedCount.incrementAndGet()
            graceOverriddenCount.incrementAndGet()
            total -= sz
          }
        }
      }
      // over cap with nothing reclaimable: say so, or the cap silently
      // means nothing and operators can't see why disk keeps growing
      if (total > cap)
        System.err.println(
          s"[ModelCache] registry ${total / (1024 * 1024)} MB exceeds cap ${cap / (1024 * 1024)} MB " +
            s"and no artifact is evictable (all pinned by this process or within the " +
            s"${graceMillis / 60000}-min grace window, high-water ${highWaterBytes / (1024 * 1024)} MB)")
    }
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p))
      java.nio.file.Files.list(p).forEach(deleteTree(_))
    java.nio.file.Files.deleteIfExists(p)
  }
}
