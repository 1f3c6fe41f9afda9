package graft.core

/** Per-process scratch root for persisted fixture state (the pair graph,
  * retrieval/IVM index tables the q159/q160/q162/q165/q169 family builds).
  *
  * Why not a bare `java.io.tmpdir` path: the in-memory catalog is
  * per-JVM, but the tmpdir is SHARED across JVMs — a parallel sbt test
  * fork and a Verify run writing the same fixed path can overwrite each
  * other's table files mid-read (the ConcurrentHashMap memos only
  * serialize threads within one process). Scoping the root by pid makes
  * each process the single owner of its fixture directory while keeping
  * paths FIXED within the process — reruns and bench reps still
  * Overwrite in place and never orphan per-invocation directories.
  *
  * The root is removed on clean JVM exit; a killed process leaves at
  * most one pid-scoped directory in tmpdir for the OS to reap.
  */
object Scratch {

  lazy val root: String = {
    val dir = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft-${ProcessHandle.current().pid()}")
    dir.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(dir)))
    dir.getAbsolutePath
  }

  /** Fixed-per-process path for a named fixture table/directory. */
  def path(name: String): String = s"$root/$name"

  private def delete(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(delete)
    f.delete()
    ()
  }
}
