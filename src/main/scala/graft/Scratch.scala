package graft

/** JVM-lifetime scratch directories, reaped by a shutdown hook — shared
  * by the layout/versioning harness queries and the stress battery, both
  * of which rewrite table copies per invocation and would otherwise leak
  * them into the temp filesystem across repeated runs. Unique dirs keep
  * concurrent invocations from racing each other; the hook deletes
  * whatever accumulated, best-effort, at exit. */
object Scratch {
  private val dirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  private lazy val hook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.forEach { root =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(root).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: Throwable => () } // exit-time best effort
      }))

  /** A fresh tracked temp directory; returns its absolute path. */
  def dir(prefix: String): String = {
    hook
    val d = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(d)
    d.toString
  }
}
