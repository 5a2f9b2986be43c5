package graft

import java.nio.file.{Files, Path, Paths}

/** Per-JVM scratch root for the file round-trip queries (q18/q19) —
  * pid-keyed, so concurrent Verify runners on one host no longer clobber
  * each other's exports. Lives in its own dependency-free object so both
  * the query side ([[graft.queries.Core]]) and the oracle side
  * ([[OracleSql]]) can reference it without an object-initialization
  * cycle between them (Core.oracles already reads OracleSql vals at init).
  *
  * Lifecycle: object init sweeps sibling dirs whose owning pid is no
  * longer alive AND whose last write is over an hour old, so dead runs'
  * scratch (a full orders CSV + documents JSONL) never accumulates on
  * long-lived hosts. Deliberately NO exit-time deletion of this JVM's own
  * dir, and no sweep of FRESH dead dirs: the q18/q19 correctness oracles
  * read these exports with DuckDB AFTER the Spark JVM has exited — an
  * exit hook (or an eager sweep from the next JVM, e.g. a bench run
  * between Verify and its DuckDB compare) would delete the oracle's
  * input and fail the round-trip checks. The age guard makes the sweep
  * safe to run from any graft process at any time.
  */
object RunScoped {
  val ioDir: String = s"/tmp/graft_io_${ProcessHandle.current().pid()}"

  private[graft] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(q => try Files.deleteIfExists(q) catch { case _: Exception => () })
      finally walk.close()
    }

  /** Delete sibling graft_io_<pid> dirs whose owning process is gone and
    * whose last modification is older than `minAgeMillis` (default 1 h —
    * comfortably past the window in which a just-exited run's oracle
    * still reads its exports). Strictly pattern-matched and pid-verified
    * so an unrelated /tmp entry can never be touched; a recycled pid at
    * worst skips a sweep (the next run retries).
    */
  private[graft] def sweepStale(minAgeMillis: Long = 60L * 60 * 1000): Unit =
    try {
      val self = ProcessHandle.current().pid()
      val cutoff = System.currentTimeMillis() - minAgeMillis
      val tmp = Paths.get("/tmp")
      if (Files.isDirectory(tmp)) {
        val ls = Files.list(tmp)
        try ls.forEach { p =>
          val name = p.getFileName.toString
          if (name.startsWith("graft_io_")) {
            val pid = name.stripPrefix("graft_io_")
            if (pid.nonEmpty && pid.forall(_.isDigit) && pid.toLong != self &&
              !ProcessHandle.of(pid.toLong).map[Boolean](_.isAlive).orElse(false) &&
              Files.getLastModifiedTime(p).toMillis < cutoff)
              deleteRecursively(p)
          }
        } finally ls.close()
      }
    } catch { case _: Exception => () } // best-effort hygiene, never fatal

  sweepStale()
}
