package graft

import java.util.{Collections, WeakHashMap}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Per-SparkSession memo cache for deterministic derived DataFrames.
  *
  * Keyed on the session REFERENCE itself (weakly), not on
  * `System.identityHashCode(session)`: identity hashes are not unique, so
  * two live sessions could collide and one would receive a DataFrame bound
  * to the other (possibly stopped) session. The weak keying also bounds
  * the cache's lifetime — once a session is stopped and dereferenced its
  * entry map becomes collectable, so a long-lived JVM cycling sessions
  * does not accumulate stale plans.
  */
final class SessionCache[V] {
  private val bySession =
    Collections.synchronizedMap(new WeakHashMap[SparkSession, ConcurrentHashMap[String, V]]())

  def getOrCompute(s: SparkSession, key: String)(f: => V): V = {
    var m = bySession.get(s)
    if (m == null) {
      bySession.synchronized {
        m = bySession.get(s)
        if (m == null) { m = new ConcurrentHashMap[String, V](); bySession.put(s, m) }
      }
    }
    m.computeIfAbsent(key, _ => f)
  }
}
