package graft

/** Small filesystem helpers shared by mains, queries, and specs. */
object IoUtil {
  /** Recursively delete a directory tree (children before parents). This
    * runs inside finally blocks — often around a just-stopped streaming
    * query — so it must NEVER throw: a cleanup failure would mask the
    * original exception, or poison a completed timed measurement (the r13
    * stream_decontaminate_proc_ttl -1: RocksDB's state-store maintenance
    * thread can REPOPULATE a state subdirectory after `q.stop()` returns,
    * so deleting the parent throws DirectoryNotEmptyException — the same
    * race class the bench-side deferred cleanup fixes for the heavy
    * streaming entries). Races handled:
    *  - an entry disappearing mid-traversal: Files.walk throws
    *    UncheckedIOException(NoSuchFileException) — ignored;
    *  - an entry reappearing after its children were deleted:
    *    DirectoryNotEmptyException — retried (3 attempts, 200 ms apart,
    *    letting the maintenance thread finish), then given up on with a
    *    stderr warning. A leaked /tmp checkpoint dir is harmless; a
    *    thrown cleanup exception is not. */
  def deleteRecursively(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    var tries = 0
    var done = false
    while (!done && tries < 3) {
      tries += 1
      try {
        if (java.nio.file.Files.exists(p)) {
          val walk = java.nio.file.Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(f => java.nio.file.Files.deleteIfExists(f))
          finally walk.close()
        }
        done = true
      } catch {
        case e: java.io.UncheckedIOException =>
          // mid-walk races surface wrapped; an already-gone entry is done,
          // any other wrapped IO failure takes the same retry/warn path as
          // a plain IOException — the never-throw contract must hold
          if (e.getCause.isInstanceOf[java.nio.file.NoSuchFileException])
            done = true
          else if (tries >= 3)
            System.err.println(s"WARN cleanup of $path failed, leaking it: " +
              s"${e.getCause.getClass.getSimpleName}: ${e.getCause.getMessage}")
          else Thread.sleep(200L)
        case _: java.nio.file.NoSuchFileException => done = true
        case e: java.io.IOException =>
          if (tries >= 3)
            System.err.println(s"WARN cleanup of $path failed, leaking it: " +
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
          else Thread.sleep(200L)
      }
    }
  }
}
