package graft.functions

import org.apache.spark.sql.SparkSession

/** Per-session once-only registration guard — ONE definition of the
  * contract every native function object shares:
  * `createOrReplaceTempFunction` logs a "replaced a previously
  * registered function" WARN on every repeat call, so each object
  * registers once per session — but tracks ITS OWN registrations rather
  * than probing `functionExists`: a foreign/stale function of the same
  * name in a reused session must be replaced by the native expression
  * (first call wins it back), never silently used. Weak keys: a closed
  * session's entry must not pin it in memory. */
private[functions] final class Registration {
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def once(spark: SparkSession)(body: => Unit): Unit =
    if (registered.put(spark, java.lang.Boolean.TRUE) == null) body
}
