package graft

/** Small filesystem helpers shared by mains, queries, and specs. */
object IoUtil {
  /** Recursively delete a directory tree (children before parents);
    * missing entries are ignored, so concurrent cleanup is safe. */
  def deleteRecursively(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
  }
}
