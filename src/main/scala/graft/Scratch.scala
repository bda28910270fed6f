package graft

/** Process-scoped scratch space swept by ONE shutdown hook (ADVICE-r16):
  * the per-query/per-ingest `createTempDirectory` sites previously leaked
  * stage + table + sink + checkpoint + image payloads on every
  * invocation, so a repeated Verify/Bench loop accumulated unbounded
  * /tmp garbage. One root per process, one fresh subdirectory per call;
  * deletion at exit is best-effort per entry (the JVM is exiting — a
  * locked file must not abort the sweep of its siblings).
  *
  * Local-filesystem paths only: multi-executor staging on a shared store
  * keeps its own explicit lifecycle (`spark.graft.stageRoot` — see
  * ImagePipeline.defaultStageDir), because a driver-side exit hook
  * cannot sweep another machine's filesystem. */
object Scratch {

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      // the TRAVERSAL can throw too (UncheckedIOException when an entry
      // vanishes or turns unreadable mid-walk — e.g. a concurrent Hadoop
      // shutdown hook deleting a nested dir); a per-entry catch alone
      // would let that abort the whole sweep and leave every remaining
      // subtree behind — the exact accumulation this class prevents
      try {
        val walk = java.nio.file.Files.walk(r)
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => try { java.nio.file.Files.deleteIfExists(p); () }
            catch { case _: java.io.IOException => () })
        finally walk.close()
      } catch {
        case _: java.io.IOException | _: java.io.UncheckedIOException => ()
      }
    }, "graft-scratch-sweeper"))
    r
  }

  /** Fresh scratch subdirectory (unique per call), deleted at JVM exit. */
  def dir(tag: String): String =
    java.nio.file.Files.createTempDirectory(root, tag).toString
}
