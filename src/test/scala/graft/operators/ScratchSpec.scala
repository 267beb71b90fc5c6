package graft.operators

import graft.SparkSpec

/** Pins the sliced-pass scratch-directory guard (Scratch.claimSliceDir —
  * the shared protection for Bpe.docByteTokensSliced and
  * EntityResolution.matchByEditDistanceSliced against a data directory
  * mistakenly handed in as scratch).
  */
class ScratchSpec extends SparkSpec {
  import java.nio.file.{Files, Paths}

  private def tmp(): String =
    Files.createTempDirectory("graft_scratch_spec").toString

  test("absent directory is fine; stale slice children are cleared") {
    val dir = tmp()
    Files.delete(Paths.get(dir))
    Scratch.claimSliceDir(spark, dir) // absent: no-op
    Files.createDirectories(Paths.get(dir, "slice=3"))
    Files.write(Paths.get(dir, "slice=3", "part-0.parquet"), Array[Byte](1))
    Scratch.claimSliceDir(spark, dir)
    assert(!Files.exists(Paths.get(dir)), "stale slices cleared")
  }

  test("a plain file handed in as scratch fails with a not-a-directory error") {
    val dir = tmp()
    val f = Paths.get(dir, "some_file")
    Files.write(f, Array[Byte](1))
    val e = intercept[IllegalArgumentException] {
      Scratch.claimSliceDir(spark, f.toString)
    }
    assert(e.getMessage.contains("not a directory"))
    assert(Files.exists(f), "the file must survive")
  }

  test("an empty parquet dataset root (only _SUCCESS) is refused, not deleted") {
    // the r16 advice hole: the old dot/underscore whitelist accepted
    // _SUCCESS and recursively deleted the mistaken dataset root
    val dir = tmp()
    Files.write(Paths.get(dir, "_SUCCESS"), Array.emptyByteArray)
    val e = intercept[IllegalArgumentException] {
      Scratch.claimSliceDir(spark, dir)
    }
    assert(e.getMessage.contains("non-slice"))
    assert(Files.exists(Paths.get(dir, "_SUCCESS")), "nothing deleted")
  }

  test("a data directory (part files) is refused, not deleted") {
    val dir = tmp()
    Files.write(Paths.get(dir, "part-00000.parquet"), Array[Byte](1))
    val e = intercept[IllegalArgumentException] {
      Scratch.claimSliceDir(spark, dir)
    }
    assert(e.getMessage.contains("non-slice"))
    assert(Files.exists(Paths.get(dir, "part-00000.parquet")))
  }
}
