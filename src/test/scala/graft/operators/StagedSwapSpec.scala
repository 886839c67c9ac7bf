package graft.operators

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** The crash-safe directory swap in isolation — including adoption of
  * the PRE-EXTRACTION legacy suffix convention (`__old`/`__compact`):
  * an index compacted and interrupted by an older build must restore
  * under the current code, and stale legacy leftovers must not sit
  * beside the index forever (r11 advice). */
class StagedSwapSpec extends SparkSpec {

  private def fsFor(p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def mkDir(root: String, name: String, marker: String): Path = {
    val p = new Path(s"$root/$name")
    val fs = fsFor(p)
    fs.mkdirs(p)
    val out = fs.create(new Path(p, marker))
    out.write(marker.getBytes("UTF-8")); out.close()
    p
  }

  test("restore adopts the current _old naming") {
    val root = Files.createTempDirectory("graft_swap").toString
    val live = new Path(s"$root/hashes")
    val fs = fsFor(live)
    mkDir(root, "hashes_old", "data-old")
    assert(StagedSwap.restoreIfInterrupted(fs, live))
    assert(fs.exists(new Path(live, "data-old")))
    assert(!fs.exists(new Path(s"$root/hashes_old")))
    // idempotent once live exists
    assert(!StagedSwap.restoreIfInterrupted(fs, live))
  }

  test("restore adopts the legacy __old naming and clears __compact") {
    val root = Files.createTempDirectory("graft_swap").toString
    val live = new Path(s"$root/hashes")
    val fs = fsFor(live)
    mkDir(root, "hashes__old", "data-legacy")
    mkDir(root, "hashes__compact", "half-written")
    assert(StagedSwap.restoreIfInterrupted(fs, live))
    assert(fs.exists(new Path(live, "data-legacy")))
    assert(!fs.exists(new Path(s"$root/hashes__old")))
    assert(!fs.exists(new Path(s"$root/hashes__compact")))
  }

  test("current _old wins over legacy __old when both exist") {
    val root = Files.createTempDirectory("graft_swap").toString
    val live = new Path(s"$root/hashes")
    val fs = fsFor(live)
    mkDir(root, "hashes_old", "data-current")
    mkDir(root, "hashes__old", "data-legacy")
    assert(StagedSwap.restoreIfInterrupted(fs, live))
    assert(fs.exists(new Path(live, "data-current")))
  }

  test("a live dir suppresses legacy adoption") {
    val root = Files.createTempDirectory("graft_swap").toString
    val live = mkDir(root, "hashes", "data-live")
    val fs = fsFor(live)
    mkDir(root, "hashes__old", "data-legacy")
    assert(!StagedSwap.restoreIfInterrupted(fs, live))
    assert(fs.exists(new Path(live, "data-live")))
  }

  test("swapIn sweeps stale legacy leftovers") {
    val root = Files.createTempDirectory("graft_swap").toString
    val live = mkDir(root, "hashes", "data-live")
    val fs = fsFor(live)
    mkDir(root, "hashes__old", "stale")
    mkDir(root, "hashes__compact", "stale")
    val tmp = mkDir(root, "hashes_staging", "data-new")
    StagedSwap.swapIn(fs, live, tmp)
    assert(fs.exists(new Path(live, "data-new")))
    assert(!fs.exists(new Path(s"$root/hashes__old")))
    assert(!fs.exists(new Path(s"$root/hashes__compact")))
    assert(!fs.exists(new Path(s"$root/hashes_old")))
  }
}
