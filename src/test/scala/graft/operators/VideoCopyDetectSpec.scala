package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.multimodal.VideoCopyDetect

class VideoCopyDetectSpec extends SparkSpec {
  import spark.implicits._

  // (video id, frame fingerprint); video 1 and 2 share frames 10,11,12;
  // 1 and 3 share only frame 13; fingerprint 99 appears in all four
  // videos (the "black frame"); video 2 carries frame 10 twice.
  private val frames = Seq(
    (1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
    (2L, 10L), (2L, 10L), (2L, 11L), (2L, 12L),
    (3L, 13L), (3L, 20L),
    (4L, 21L),
    (1L, 99L), (2L, 99L), (3L, 99L), (4L, 99L)
  ).toDF("vid", "fc")

  test("pairs require minShared distinct shared fingerprints") {
    val out = VideoCopyDetect
      .pairs(frames, col("vid"), col("fc"), minShared = 2, maxDocs = 3)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (1L, 2L, 3L))
  }

  test("within-video repeats count once (distinct vote)") {
    val out = VideoCopyDetect
      .pairs(frames, col("vid"), col("fc"), minShared = 3, maxDocs = 3)
      .collect()
    // 1-2 share exactly {10,11,12}: repeat of 10 in video 2 adds nothing
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 3L)))
  }

  test("ubiquitous fingerprints are capped out of pair mining") {
    // with the cap loose enough to admit fingerprint 99 (fan-in 4),
    // every video pair shares it; with the cap at 3 it contributes none
    val loose = VideoCopyDetect
      .pairs(frames, col("vid"), col("fc"), minShared = 1, maxDocs = 4)
      .collect()
    assert(loose.length == 6) // all C(4,2) pairs via frame 99
    val capped = VideoCopyDetect
      .pairs(frames, col("vid"), col("fc"), minShared = 1, maxDocs = 3)
      .collect()
    val pairsSet = capped.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsSet == Set((1L, 2L), (1L, 3L)))
  }

  test("degenerate parameters are rejected") {
    intercept[IllegalArgumentException] {
      VideoCopyDetect.pairs(frames, col("vid"), col("fc"), 0, 3)
    }
    intercept[IllegalArgumentException] {
      VideoCopyDetect.pairs(frames, col("vid"), col("fc"), 1, 1)
    }
  }
}
