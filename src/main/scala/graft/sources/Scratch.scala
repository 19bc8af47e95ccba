package graft.sources

/** Per-JVM scratch roots under the system tmpdir — ONE definition of
  * the concurrency contract every materialize-then-read source variant
  * needs: two concurrent sessions on the same machine (parallel bench +
  * verify JVMs are a real mode here) must never race an
  * overwrite-vs-read on a SHARED tmp path, so each root is keyed by a
  * per-JVM token — stable within a JVM (repeated invocations stay
  * idempotent; warm bench runs reuse the materialized copy) and unique
  * across JVMs so they never collide. Every root is swept on JVM exit,
  * so bench/verify JVMs don't orphan fixture corpora in tmpdir. */
private[sources] object Scratch {
  private val runToken: String = java.util.UUID.randomUUID().toString.take(8)
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Scratch root `<tmpdir>/<prefix>_<token>`, registered for the
    * JVM-exit sweep on first use. */
  def root(prefix: String): java.io.File = {
    val f = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/${prefix}_$runToken")
    if (registered.add(f.getPath)) sys.addShutdownHook(rm(f)): Unit
    f
  }

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete(): Unit
  }
}
