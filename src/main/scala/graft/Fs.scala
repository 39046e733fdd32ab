package graft

/** The one recursive-delete helper (previously four private copies had
  * started to drift): walk-reverse-delete, no-op on a missing path. */
object Fs {
  def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
  }

  def deleteRecursively(p: String): Unit =
    deleteRecursively(java.nio.file.Paths.get(p))
}
