package graft.util

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentLinkedQueue
import scala.util.control.NonFatal

/**
 * Temp-directory hygiene for benchmark/demo mains. Bench WALs reach ~7 GB
 * at 10M events; leaked dirs from repeated invocations once filled this
 * host's disk mid-benchmark. Every temp dir a main creates is either
 * deleted right after its timed span or registered for deletion at JVM
 * exit (short-lived dirs do both: the immediate delete is the fast path,
 * the exit hook the crash/interrupt backstop). Caller-owned paths (reuse
 * arguments) are never registered.
 */
object TempDirs {

  // ONE shutdown hook draining a queue — not one hook thread per dir
  // (library call sites like SparkEntry.entry would accumulate threads
  // unboundedly in a long-lived JVM).
  private val pending = new ConcurrentLinkedQueue[String]()
  private lazy val hookInstalled: Boolean = {
    try Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var d = pending.poll()
      while (d != null) { deleteDir(d); d = pending.poll() }
    }, "graft-tempdir-cleanup"))
    catch { case _: IllegalStateException => () } // already shutting down
    true
  }

  /** Recursive delete, best-effort for IO failures only (cleanup paths,
    * never data). Interruption and fatal VM errors propagate — swallowing
    * them would hide a cancellation or the real failure. */
  def deleteDir(dir: String): Unit =
    try {
      val p = Paths.get(dir)
      if (Files.exists(p)) {
        val it = Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        try it.forEach(q => Files.deleteIfExists(q)) finally it.close()
      }
    } catch {
      case _: InterruptedException => Thread.currentThread().interrupt()
      case NonFatal(_) => ()
    }

  /** Create a temp directory deleted when the JVM exits. */
  def scratch(prefix: String): String = {
    hookInstalled
    val d = Files.createTempDirectory(prefix).toString
    pending.add(d)
    d
  }
}
