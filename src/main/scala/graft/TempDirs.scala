package graft

import java.nio.file.{Files, Path}
import java.util.Comparator
import java.util.concurrent.ConcurrentHashMap

/** Staged temp directories for queries that need a filesystem round-trip
  * (CSV/scalar-text sinks, streaming file sources).
  *
  * One directory per logical key, reused across invocations within the
  * JVM — repeated Bench/Verify/test runs must not accumulate unbounded
  * per-call temp artifacts — and deleted recursively on JVM exit.
  */
object TempDirs {
  private val cache = new ConcurrentHashMap[String, Path]()

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      cache.values.forEach { p =>
        try
          Files.walk(p).sorted(Comparator.reverseOrder[Path]())
            .forEach(f => { val _ = Files.deleteIfExists(f) })
        catch { case _: Throwable => () } // best-effort cleanup
      }))
  }

  /** The staged directory for `key`, created (and populated via `init`)
    * on first use in this JVM.
    */
  def staged(key: String)(init: Path => Unit = _ => ()): Path = {
    hookInstalled
    cache.computeIfAbsent(key, _ => {
      val p = Files.createTempDirectory("graft_staged_")
      init(p)
      p
    })
  }
}
