package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE implementation of the crash-safe directory swap every
  * persisted artifact in this repo rotates through (ANN codes, media
  * hashes, HLL registers, plain tables): write the replacement aside,
  * move the live dir out, move the replacement in, delete the old —
  * with explicit recovery semantics for every crash window:
  *
  *   - crash before the first rename: live untouched, `tmp` is
  *     garbage the next swap overwrites;
  *   - crash between rename-out and rename-in: live is MISSING but
  *     `old` holds everything — [[restoreIfInterrupted]] adopts it
  *     (callers run it before reading, so the artifact "never
  *     vanishes" is true across restarts, not just within a run);
  *   - crash after rename-in: `old` is a stale leftover the next
  *     swap deletes.
  *
  * Extracted after review: four hand-rolled copies of this dance had
  * drifted into subtly different recovery behavior (one silently
  * RESTARTED a sketch when the live dir was missing mid-window).
  */
object StagedSwap {

  def oldPath(live: Path) = new Path(live.toString + "_old")
  def tmpPath(live: Path) = new Path(live.toString + "_staging")

  /** Pre-extraction suffix convention (the hand-rolled copies used
    * `__old`/`__compact`): an index compacted — and interrupted — by
    * an older build left its data under these names, which the
    * current restore must still adopt or the live dir stays missing
    * forever. Visible to the operator package so recovery FAST-PATHS
    * (which gate on "does any interrupted-swap evidence exist" before
    * taking a lock) can check the legacy name too — a gate that only
    * checks [[oldPath]] would leave a legacy-`__old` store
    * path-not-found forever (round-15 advice). */
  private[operators] def legacyOldPath(live: Path) = new Path(live.toString + "__old")
  private def legacyTmpPath(live: Path) = new Path(live.toString + "__compact")

  /** Adopt a completed-but-unswapped interruption: if the live dir is
    * missing and `old` exists, the process died mid-swap — move the
    * old data back. Also adopts the legacy `__old` naming, so a swap
    * interrupted under a pre-extraction build restores too. Returns
    * true when a restore happened. */
  def restoreIfInterrupted(fs: FileSystem, live: Path): Boolean = {
    if (fs.exists(live)) false
    else Seq(oldPath(live), legacyOldPath(live)).find(fs.exists) match {
      case Some(src) =>
        if (!fs.rename(src, live))
          throw new java.io.IOException(
            s"staged swap: cannot restore $src after an interrupted swap")
        fs.delete(legacyTmpPath(live), true) // legacy staging garbage
        true
      case None => false
    }
  }

  /** Atomic small-sidecar write: content to a hidden tmp file, rename
    * into place (file renames are atomic on HDFS and local FS) — the
    * ONE implementation for every meta/marker/mode sidecar (review
    * finding: hand-rolled `fs.create(p, true)` writers leave a crash
    * window where the sidecar exists EMPTY, which reads as a corrupt
    * scheme/mode instead of a missing one). A crash BETWEEN the delete
    * and the rename leaves the sidecar MISSING rather than stale
    * (round-15 review) — every consumer must treat a missing sidecar
    * as "unknown", never as a semantic default, unless first-write
    * ordering guarantees the sidecar exists whenever the data does
    * (see [[graft.streaming.MediaIngest.buildIndexDir]]). */
  def writeSidecar(fs: FileSystem, target: Path, content: String): Unit =
    writeSidecarVia(fs, target, out =>
      out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** The same staged publish for BINARY sidecars (bloom bits, any
    * serialized sketch): the caller streams into the hidden tmp file,
    * the rename makes it visible whole-or-not-at-all — a crash
    * mid-write can no longer leave a truncated artifact that fails
    * every later read (round-15: the bloom-bits writer had exactly
    * that window). */
  def writeSidecarVia(fs: FileSystem, target: Path,
      fill: java.io.OutputStream => Unit): Unit = {
    val tmp = new Path(target.toString + "_tmp")
    val out = fs.create(tmp, true)
    try fill(out)
    finally out.close()
    fs.delete(target, false)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"staged swap: cannot publish sidecar $target")
  }

  def readSidecar(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Swap `tmp` (already fully written by the caller) into `live`.
    * On failure the live dir is restored — the artifact never
    * vanishes within the run; [[restoreIfInterrupted]] covers the
    * across-restart window. */
  def swapIn(fs: FileSystem, live: Path, tmp: Path): Unit = {
    val old = oldPath(live)
    fs.delete(old, true)
    // One-time migration: stale legacy-suffix leftovers (a compact
    // that COMPLETED under the old naming never deleted them) would
    // otherwise sit beside the index forever.
    fs.delete(legacyOldPath(live), true)
    fs.delete(legacyTmpPath(live), true)
    if (fs.exists(live) && !fs.rename(live, old))
      throw new java.io.IOException(s"staged swap: cannot stage $live aside")
    if (!fs.rename(tmp, live)) {
      fs.rename(old, live) // restore; the artifact must never vanish
      throw new java.io.IOException(s"staged swap: cannot swap $tmp into place")
    }
    fs.delete(old, true)
    ()
  }
}
