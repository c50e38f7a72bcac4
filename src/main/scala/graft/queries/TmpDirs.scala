package graft.queries

/** One cached scratch directory per logical key per JVM — tmpfs-backed
  * when available (/dev/shm: this sandbox's single virtual disk is the
  * contention point, not the plan), cleaned up at JVM exit. Shared by
  * the IVF centroid ledger and the streaming input rewrites so repeat
  * Bench/Verify invocations reuse ONE dir per key instead of leaking a
  * tempdir + shutdown hook each. */
private[queries] object TmpDirs {
  private val dirs = scala.collection.concurrent.TrieMap.empty[String, String]

  def cached(key: String, prefix: String): String =
    dirs.getOrElseUpdate(key, {
      val base = if (new java.io.File("/dev/shm").isDirectory)
        java.nio.file.Paths.get("/dev/shm") else java.nio.file.Paths.get("/tmp")
      val d = java.nio.file.Files.createTempDirectory(base, prefix).toString
      sys.addShutdownHook(
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
      d
    })
}
