package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared guard for the sliced-pass scratch directories
  * ([[Bpe.docByteTokensSliced]], [[EntityResolution.matchByEditDistanceSliced]]).
  */
private[operators] object Scratch {

  /** Claim `scratchDir` for a sliced pass: clear any stale `slice=N`
    * children (they would silently union into the final `slice=*` read),
    * but REFUSE to delete a directory holding anything else — a mistaken
    * path (a data directory handed in as scratch) must fail loudly
    * instead of being recursively destroyed before the first write.
    * Absent directories are fine; the slice writers create them.
    */
  def claimSliceDir(spark: SparkSession, scratchDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(scratchDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      require(fs.getFileStatus(p).isDirectory,
        s"scratchDir $scratchDir is a file, not a directory — pass a " +
          "directory dedicated to this sliced pass")
      // whitelist only what a prior sliced pass itself leaves behind at
      // the scratch ROOT: slice=N children (each is its own parquet
      // dataset carrying its own _SUCCESS inside), a crashed committer's
      // _temporary, and local-FS .crc shadows. Notably NOT a bare
      // _SUCCESS: the sliced writers never produce one at the root, so
      // accepting it would let an empty parquet dataset root mistakenly
      // handed in as scratch be deleted (the r16 advice finding — the old
      // broad dot/underscore whitelist had exactly that hole).
      val children = fs.listStatus(p).map(_.getPath.getName)
      val foreign = children.filterNot(n =>
        n.startsWith("slice=") || n == "_temporary" ||
          (n.startsWith(".") && n.endsWith(".crc")))
      require(foreign.isEmpty,
        s"refusing to clear scratchDir $scratchDir: it holds non-slice " +
          s"entries ${foreign.take(3).mkString(", ")} — pass a directory " +
          "dedicated to this sliced pass")
      fs.delete(p, true)
    }
  }
}
