package graft.operators

/** Child main for the CROSS-PROCESS FsLock spec: every other race
  * spec stands threads in for drivers, which validates the lock's
  * logic but not its process-level primitives (CREATE_NEW across
  * JVMs, rename/delete visibility). This main is spawned as a real
  * separate JVM N times against one lock path: each child acquires,
  * appends "enter <pid>" to a shared log, holds briefly, appends
  * "exit <pid>", releases, and exits 0. The parent spec asserts the
  * log strictly nests — any interleaving means two PROCESSES were
  * inside the critical section together. */
object FsLockChild {
  def main(args: Array[String]): Unit = {
    val lockPath = new org.apache.hadoop.fs.Path(args(0))
    val logPath = java.nio.file.Paths.get(args(1))
    val fs = lockPath.getFileSystem(
      new org.apache.hadoop.conf.Configuration())
    FsLock.withLock(fs, lockPath, "xproc-test",
      staleMs = 2000, timeoutMs = 60000) {
      val pid = java.lang.ProcessHandle.current().pid()
      append(logPath, s"enter $pid\n")
      Thread.sleep(250)
      append(logPath, s"exit $pid\n")
    }
  }

  /** One small O_APPEND write per line — atomic on POSIX, so lines
    * from concurrent children cannot tear. */
  private def append(p: java.nio.file.Path, s: String): Unit = {
    java.nio.file.Files.write(p,
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    ()
  }
}
