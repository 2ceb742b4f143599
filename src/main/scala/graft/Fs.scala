package graft

/** Local-filesystem helpers shared by the stream bench and the result
  * store's compaction (one copy: deletion-order and missing-file
  * semantics stay in sync across callers). */
private[graft] object Fs {
  def deleteRecursively(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(root)) {
      val paths = java.nio.file.Files.walk(root)
      try paths.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally paths.close()
    }
  }
}
