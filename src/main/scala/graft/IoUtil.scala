package graft

/** Small filesystem helpers shared by mains, queries, and specs. */
object IoUtil {
  /** Recursively delete a directory tree (children before parents);
    * missing entries are ignored, so concurrent cleanup is safe. The
    * catch covers the walk itself too: Files.walk throws
    * UncheckedIOException(NoSuchFileException) if an entry disappears
    * mid-traversal, and this helper runs inside finally blocks where a
    * cleanup race must not mask the original exception. */
  def deleteRecursively(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    try {
      if (java.nio.file.Files.exists(p)) {
        val walk = java.nio.file.Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
    } catch {
      case e: java.io.UncheckedIOException
        if e.getCause.isInstanceOf[java.nio.file.NoSuchFileException] => ()
      case _: java.nio.file.NoSuchFileException => ()
    }
  }
}
