package graft.ops

/** Shared lifecycle for write-once persisted index artifacts (IVF centroid
  * tables, trained IVF, the lexical inverted index). Two concerns live here
  * so every artifact family gets the same guarantees:
  *
  *  1. CONTENT fingerprinting. Artifact directories are named by a
  *     fingerprint of their source dataset, making them write-once: new
  *     data maps to a new name, and a rebuild never deletes a directory a
  *     concurrent reader is serving from. For a Spark-written dataset the
  *     path is a DIRECTORY — `File.length()` is the inode size and mtime
  *     granularity is coarse, so a regenerated corpus could silently alias
  *     a stale index. The fingerprint therefore hashes the sorted list of
  *     data-file (relative-name, size, mtime) tuples inside the dataset
  *     (hidden/metadata files excluded), recursively; a plain file hashes
  *     its own (size, mtime).
  *
  *  2. SERIALIZED install. The recheck-committed → delete-leftovers →
  *     ATOMIC_MOVE sequence previously had an instruction-scale TOCTOU
  *     window (a racing builder could commit between the recheck and the
  *     delete). The critical section now runs under a JVM-global monitor
  *     (threads in one JVM — the racing-builder specs' shape) PLUS an OS
  *     file lock on `<base>/.install.lock` (builders in separate JVMs
  *     sharing a target dir, e.g. verify racing bench). The commit marker
  *     is re-checked inside the lock, so exactly one complete artifact is
  *     ever installed and a committed directory is never deleted.
  */
object ArtifactStore {

  /** 8-hex-char content fingerprint of a dataset path (file or Spark
    * dataset directory), salted with builder parameters so differently
    * configured artifacts never alias. */
  def fingerprint(path: java.io.File, salt: String): String = {
    def entries(f: java.io.File, rel: String): Seq[String] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten
          .filterNot(c => c.getName.startsWith("_") || c.getName.startsWith("."))
          .sortBy(_.getName)
          .flatMap(c => entries(c, s"$rel/${c.getName}"))
      else Seq(s"$rel:${f.length}:${f.lastModified}")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest((entries(path, "") :+ salt).mkString("|").getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
  }

  /** Install `tmp` (a COMPLETE, marker-carrying build) as `dir`, unless a
    * racing builder already committed `dir` — then `tmp` is dropped. The
    * whole decision+rename runs under the install lock; on return either
    * `dir` holds a committed artifact built by someone, or this throws. */
  def install(base: java.io.File, dir: java.io.File, tmp: java.io.File,
      committed: () => Boolean): Unit = this.synchronized {
    base.mkdirs()
    val lockFile = new java.io.File(base, ".install.lock")
    val ch = java.nio.channels.FileChannel.open(lockFile.toPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      val lock = ch.lock()
      try {
        if (committed()) VectorOps.deleteRecursively(tmp)
        else {
          VectorOps.deleteRecursively(dir) // uncommitted leftovers only
          java.nio.file.Files.move(tmp.toPath, dir.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
      } finally lock.release()
    } finally ch.close()
  }
}
