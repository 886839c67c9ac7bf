package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Cross-process mutual exclusion on a filesystem sentinel — the ONE
  * implementation of the lock [[graft.sync.SyncLedger]] introduced for
  * multi-driver ledger writes, extracted (round-15 review) so the CC
  * label store's journal replay can share it: acquisition is an atomic
  * create-if-absent of the sentinel, which records the holder's tag.
  *
  * Atomicity of create-if-absent: HDFS guarantees it server-side. On
  * Hadoop's local filesystems (RawLocalFileSystem/ChecksumFileSystem)
  * `create(overwrite = false)` is an exists-then-create CHECK with a
  * TOCTOU window (round-14 review overstated this as a guarantee), so
  * for `file:` schemes acquisition goes through
  * `java.nio.file.Files.write(..., CREATE_NEW)`, which IS atomic on a
  * POSIX filesystem — both deployment shapes get a real lock.
  *
  * A holder that died inside the critical section leaves the sentinel
  * behind — any lock older than `staleMs` is adopted as orphaned
  * (rename-won, so exactly one adopter); contenders spin with a short
  * sleep and give up with a usable error after `timeoutMs`, naming
  * the holder recorded inside the sentinel.
  *
  * This is a LEASE, not a fenced lock: a holder stalled past `staleMs`
  * can be adopted while still alive, and the two may interleave —
  * `staleMs` must dominate the worst-case critical section (default
  * 10 min vs the seconds-long writes guarded here) for the exclusion
  * to hold. Release is OWNERSHIP-CHECKED: the holder deletes the
  * sentinel only if it still carries its own tag, so a stalled holder
  * that WAS adopted cannot release the adopter's lock and let a third
  * writer in.
  *
  * LEASE-SIZING RULE (rounds 15/16, learned twice): wherever
  * autonomous crash recovery is wanted, size `timeoutMs` ABOVE
  * `staleMs` — a contender whose timeout is below the staleness
  * window gives up before any dead holder's sentinel can ever age
  * into adoptability, so a crash always needs a HUMAN to delete the
  * lock ("adoption unreachable"). The defaults below are the
  * fail-fast shape (2 min timeout vs 10 min stale: a contender
  * reports a live holder quickly and never adopts); call sites that
  * must self-heal after a crashed holder — every store/ledger whose
  * writers are unattended jobs — pass their own pair with
  * timeout > stale, sized so staleMs still dominates the critical
  * section (the CC store and SyncLedger use 3 min stale / 5 min
  * timeout over sub-second sections). The second rule that travels
  * with this one: recovery that MUTATES and runs on a READ path must
  * serialize behind the same lock the writers hold (see
  * [[graft.operators.dedup.ConnectedComponents.recoverComponentsStore]]).
  */
object FsLock {

  /** Last fail-fast-shape warning emitted (test seam — the WARN path
    * is otherwise write-only stderr). */
  @volatile private[graft] var lastShapeWarn: Option[String] = None

  /** What a contender that times out is told the lock guards — pure
    * error-message context. */
  def withLock[T](
      fs: FileSystem,
      lockPath: Path,
      what: String = "resource",
      staleMs: Long = 10L * 60 * 1000,
      timeoutMs: Long = 2L * 60 * 1000)(body: => T): T = {
    val tag =
      s"${java.lang.ProcessHandle.current().pid()}@" +
        s"${java.net.InetAddress.getLocalHost.getHostName}:" +
        java.util.UUID.randomUUID().toString
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var acquired = false
    var warnedShape = false
    while (!acquired) {
      try {
        createExclusive(fs, lockPath, tag)
        acquired = true
      } catch {
        case _: java.io.IOException =>
          val mtime =
            try Some(fs.getFileStatus(lockPath).getModificationTime)
            catch { case _: java.io.FileNotFoundException => None }
          val now = System.currentTimeMillis()
          val stale = mtime.exists(_ < now - staleMs)
          // the fail-fast shape (timeout < stale) cannot adopt a
          // sentinel that will still be younger than staleMs when
          // this caller's deadline hits — if the holder is dead, the
          // crash needs a human. Deliberate for interactive call
          // sites; surface it at first CONTENTION so an unattended
          // call site that wanted self-healing learns here, not at
          // first crash. Age-qualified (review finding): a sentinel
          // ALREADY old enough to cross staleMs within the wait
          // adopts fine under this shape, and warning there would
          // put a wrong diagnostic on a successful self-heal.
          if (!warnedShape && timeoutMs < staleMs &&
              mtime.exists(_ > now - (staleMs - timeoutMs))) {
            warnedShape = true
            val msg =
              s"[fslock] WARN: $what lock is contended and this " +
                s"caller's timeout (${timeoutMs}ms) is below the " +
                s"staleness window (${staleMs}ms) — the fail-fast " +
                "shape: this sentinel cannot age into adoptability " +
                "within this caller's wait, so if its holder is " +
                "dead, a human must delete the lock; pass " +
                "timeout > stale for self-healing (see the FsLock " +
                "lease-sizing rule)"
            lastShapeWarn = Some(msg)
            System.err.println(msg)
          }
          if (stale) {
            // adopt the orphan via rename: exactly ONE contender wins
            // the rename (a plain delete could clobber the fresh lock
            // a faster adopter just created); losers loop and
            // re-contend on create-if-absent. The loser's rename can
            // THROW rather than return false: LocalFileSystem falls
            // back to FileUtil.copy when renameTo fails, and copy
            // faults FileNotFound on the already-adopted source
            // (found by the adoption-race stress spec) — a lost race
            // here is a normal loop-and-re-contend, never an error
            val orphan = new Path(
              lockPath.toString + "_stale_" + java.util.UUID.randomUUID())
            try { if (fs.rename(lockPath, orphan)) fs.delete(orphan, false) }
            catch { case _: java.io.IOException => () }
          }
          else if (System.nanoTime() > deadline) {
            val holder =
              try StagedSwap.readSidecar(fs, lockPath)
              catch { case _: Exception => "<unknown>" }
            throw new IllegalStateException(
              s"$what is locked by $holder — another run is using it; " +
                s"wait for it, or delete $lockPath if that run is known dead")
          } else Thread.sleep(50)
      }
    }
    try body
    finally {
      // release only OUR sentinel: if a contender adopted us as stale
      // mid-section, the sentinel on disk is theirs now — deleting it
      // would hand the resource to a third writer while they still hold
      val ours =
        try StagedSwap.readSidecar(fs, lockPath) == tag
        catch { case _: Exception => false }
      if (ours) fs.delete(lockPath, false)
      ()
    }
  }

  /** Create the sentinel iff absent, failing with IOException when it
    * exists — atomically on both deployment filesystems (see the
    * object doc for why local FS needs the java.nio path). */
  private def createExclusive(fs: FileSystem, p: Path, tag: String): Unit = {
    val bytes = tag.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (fs.getScheme == "file") {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      Option(local.getParent).foreach(java.nio.file.Files.createDirectories(_))
      // CREATE_NEW is an atomic O_CREAT|O_EXCL open — no TOCTOU
      java.nio.file.Files.write(local, bytes,
        java.nio.file.StandardOpenOption.CREATE_NEW)
      // a nio write bypasses the ChecksumFileSystem wrapper, which is
      // fine: the sentinel is read back raw by readSidecar
      ()
    } else {
      val out = fs.create(p, false)
      try out.write(bytes)
      finally out.close()
    }
  }
}
