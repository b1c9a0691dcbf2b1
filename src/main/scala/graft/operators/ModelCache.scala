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
  */
object ModelCache {

  /** Artifact-format/builder-semantics version, part of every key. */
  val Version = 1

  /** In-process memo of key → published dir (the disk check is cheap,
    * but computeIfAbsent also serializes concurrent builders).
    */
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, String]

  /** Observability for the no-silent-rebuild contract: how many times
    * this process actually ran a builder (spec-asserted ≤ 1 per key).
    */
  val builtCount = new java.util.concurrent.atomic.AtomicLong

  /** Test hook: drop the in-process memo so a spec can prove the DISK
    * reuse path (a fresh JVM finding a published artifact) never
    * re-invokes the builder.
    */
  private[graft] def clearMemo(): Unit = memo.clear()

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
        val base = Paths.get(sys.props("java.io.tmpdir"), "graft-model-cache")
        Files.createDirectories(base)
        val hash = f"${scala.util.hashing.MurmurHash3.stringHash(fullKey)}%08x"
        val out = base.resolve(s"model-$hash")
        if (!Files.exists(out.resolve("_SUCCESS"))) {
          // a dir without the marker is debris from a crash of an older
          // non-atomic writer — clear it before publishing
          if (Files.exists(out)) deleteTree(out)
          val tmp = Files.createTempDirectory(base, "build-")
          val df = build
          (if (singleFile) df.coalesce(1) else df)
            .write.mode("overwrite").parquet(tmp.toString)
          try Files.move(tmp, out, StandardCopyOption.ATOMIC_MOVE)
          catch {
            // another process published first: serve its (identical) copy
            case _: java.nio.file.FileAlreadyExistsException => deleteTree(tmp)
            case _: java.nio.file.FileSystemException => deleteTree(tmp)
          }
          builtCount.incrementAndGet()
        }
        out.toString
      })

  private def deleteTree(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p))
      java.nio.file.Files.list(p).forEach(deleteTree(_))
    java.nio.file.Files.deleteIfExists(p)
  }
}
