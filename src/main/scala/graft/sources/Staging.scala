package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession

/** Session-scoped staging registry for queries that write intermediate
  * data (CSV/JSON round-trips, bucketed tables, streaming inputs).
  *
  * Every staged directory lives under ONE per-JVM root (deleted on exit),
  * and each directory / catalog table created mid-query is registered so
  * the harness (Verify/Bench) can reclaim disk and catalog entries
  * between queries — a 70-query session would otherwise accumulate every
  * staged copy of the data until JVM exit.
  */
object Staging {

  private lazy val root: Path = {
    val dir = Files.createTempDirectory("graft-staging")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))
    dir
  }

  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]
  private val tables = new java.util.concurrent.ConcurrentLinkedQueue[String]
  private val counter = new java.util.concurrent.atomic.AtomicInteger

  /** A fresh staging directory under the session root, registered for
    * the next [[cleanup]].
    */
  def freshDir(prefix: String): String = {
    val d = Files.createDirectory(root.resolve(s"$prefix-${counter.incrementAndGet()}"))
    dirs.add(d)
    d.toString
  }

  /** Register a catalog table for the next [[cleanup]]; returns a
    * session-unique name with the given prefix.
    */
  def freshTable(prefix: String): String = {
    val name = s"${prefix}_${counter.incrementAndGet()}"
    tables.add(name)
    name
  }

  /** Drop every registered table and delete every registered directory.
    * Callers invoke this AFTER the consuming query has materialized —
    * nothing re-reads staged data once the action completes.
    */
  def cleanup(spark: SparkSession): Unit = {
    var t = tables.poll()
    while (t != null) {
      // a registered name is either a catalog table (bucketed staging) or
      // a memory-sink temp view (streaming runs) — reclaim both kinds
      spark.catalog.dropTempView(t)
      spark.sql(s"DROP TABLE IF EXISTS $t")
      t = tables.poll()
    }
    var d = dirs.poll()
    while (d != null) {
      deleteRecursively(d)
      d = dirs.poll()
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(deleteRecursively(_))
    Files.deleteIfExists(p)
  }
}
