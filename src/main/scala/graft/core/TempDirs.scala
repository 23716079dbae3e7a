package graft.core

/** The ONE temp-tree lifecycle helper (previously copied per file —
  * round-11 review): trees that must outlive their creating call
  * (lazily-read DataFrames, streamed-index stores, checkpoints) are
  * cleaned by a JVM shutdown hook, so repeated bench/correctness runs
  * in one JVM do not accumulate layouts under /tmp. */
object TempDirs {
  def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
    ()
  }

  /** A fresh temp directory deleted at JVM exit. */
  def cleanedOnExit(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook(deleteRecursively(p.toFile))
    p
  }
}
