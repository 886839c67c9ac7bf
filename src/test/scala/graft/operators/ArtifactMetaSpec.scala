package graft.operators

import graft.SparkSpec

class ArtifactMetaSpec extends SparkSpec {

  private def fsAndPath(): (org.apache.hadoop.fs.FileSystem,
      org.apache.hadoop.fs.Path) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_meta").toString
    val p = new org.apache.hadoop.fs.Path(s"$dir/meta")
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  test("write/read round-trips keys and stamps the version") {
    val (fs, p) = fsAndPath()
    ArtifactMeta.write(fs, p, Seq("mode" -> "audio", "span" -> "42"))
    val m = ArtifactMeta.read(fs, p).get
    assert(m("mode") == "audio" && m("span") == "42")
    assert(m(ArtifactMeta.VersionKey) == "1")
    assert(ArtifactMeta.line(fs, p, "span").contains("42"))
    assert(ArtifactMeta.line(fs, p, "absent").isEmpty)
    // overwrite replaces, never merges
    ArtifactMeta.write(fs, p, Seq("mode" -> "image"))
    assert(ArtifactMeta.read(fs, p).get.get("span").isEmpty)
  }

  test("a missing sidecar reads as None, never as defaults") {
    val (fs, p) = fsAndPath()
    assert(ArtifactMeta.read(fs, p).isEmpty)
    assert(ArtifactMeta.valueOrLegacy(fs, p, "mode").isEmpty)
  }

  test("legacy bare-value files surface through valueOrLegacy") {
    val (fs, p) = fsAndPath()
    // the pre-round-15 hash_mode form: one bare token, no k=v
    StagedSwap.writeSidecar(fs, p, "audio")
    assert(ArtifactMeta.valueOrLegacy(fs, p, "mode").contains("audio"))
    // the pre-round-15 bloom-meta form: "items fpp", space-separated
    StagedSwap.writeSidecar(fs, p, "4096 0.01")
    assert(ArtifactMeta.read(fs, p).get("value") == "4096 0.01")
    // once rewritten in the new format, the named key wins
    ArtifactMeta.write(fs, p, Seq("mode" -> "image"))
    assert(ArtifactMeta.valueOrLegacy(fs, p, "mode").contains("image"))
  }

  test("newlines and '=' in keys are rejected before anything is written") {
    val (fs, p) = fsAndPath()
    intercept[IllegalArgumentException] {
      ArtifactMeta.write(fs, p, Seq("bad=key" -> "v"))
    }
    intercept[IllegalArgumentException] {
      ArtifactMeta.write(fs, p, Seq("k" -> "multi\nline"))
    }
    assert(ArtifactMeta.read(fs, p).isEmpty, "a rejected write left a file")
  }
}
