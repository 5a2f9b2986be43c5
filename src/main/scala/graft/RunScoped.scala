package graft

/** Per-JVM scratch root for the file round-trip queries (q18/q19) —
  * pid-keyed, so concurrent Verify runners on one host no longer clobber
  * each other's exports. Lives in its own dependency-free object so both
  * the query side ([[graft.queries.Core]]) and the oracle side
  * ([[OracleSql]]) can reference it without an object-initialization
  * cycle between them (Core.oracles already reads OracleSql vals at init).
  */
object RunScoped {
  val ioDir: String = s"/tmp/graft_io_${ProcessHandle.current().pid()}"
}
