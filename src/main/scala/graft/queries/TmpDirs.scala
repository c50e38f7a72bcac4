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

  /** A FRESH scratch dir every call (still tmpfs-backed + exit-cleaned).
    * For stateful-on-disk work like the incremental streaming build: a
    * cached dir would make a repeat invocation resume from the previous
    * run's checkpoint and skip the stream entirely — correct for resume,
    * wrong for pricing the evidence in a bench rep. */
  def fresh(prefix: String): String = {
    val n = dirs.size
    cached(s"fresh:$prefix:$n:${System.nanoTime}", prefix)
  }
}
