package graft.core

/** Content fingerprinting for content-addressed staging keys (the
  * q112/q131 skip-if-current contract). A dataset path may be a single
  * parquet FILE or a Spark-style DIRECTORY of part files, and a
  * directory's own (length, mtime) does not change when a part file is
  * rewritten in place — so a top-level stat fingerprint would silently
  * reuse a staged table built from the OLD corpus. The fingerprint
  * walks the tree and folds every regular file's (relative path,
  * length, mtime-millis): any part-file change, addition, removal or
  * rename changes the key. Callers hash the returned string into their
  * MD5 key, so its size (one line per file) never leaks into path
  * length.
  *
  * Residual caveat — mtime granularity: on filesystems with coarse
  * mtime resolution (1 s on ext3/older HFS+, 2 s on FAT), a part file
  * rewritten IN PLACE to the same byte length within the same
  * timestamp tick leaves (path, length, mtime) unchanged, and the
  * skip-if-current reuse serves the stale staged table. Spark's own
  * writers never do this (every job writes fresh part-file names via
  * task attempt IDs, so the path component changes), but an external
  * tool that rewrites a file in place can. Same trust model as
  * rsync's quick-check or make's mtime comparison; force a restage
  * (delete the staged dir) after any such out-of-band rewrite. */
object Staging {
  def contentFingerprint(f: java.io.File): String = {
    val sb = new StringBuilder
    def walk(cur: java.io.File, rel: String): Unit =
      if (cur.isDirectory) {
        val kids = cur.listFiles()
        if (kids != null)
          kids.sortBy(_.getName)
            .foreach(c => walk(c, s"$rel/${c.getName}"))
      } else {
        sb.append(rel).append('|').append(cur.length)
          .append('|').append(cur.lastModified).append('\n')
      }
    walk(f, "")
    sb.toString
  }
}
