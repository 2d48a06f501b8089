package graft.ml

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import org.apache.spark.sql.SparkSession

/** Store for the persisted per-corpus artifacts (hybrid index, recall
  * truth tables, ExactSubstr gram table): one root, one registry of what
  * is built, one keying + freshness discipline shared by every artifact
  * kind.
  *
  * Keying (ADVICE r10): the artifact dir is the sanitized FULL corpus
  * path plus a SHA-256 prefix of the raw path — the former
  * `Integer.toHexString(path.hashCode)` key could collide across two
  * corpus dirs in one JVM and silently serve the wrong artifact. The key
  * also carries [[FormatVersion]], so a persistent root never serves an
  * artifact written by older builder code.
  *
  * Freshness: each artifact records the content FINGERPRINT of the
  * source tables it derives from — a (path, size, mtime, tail-bytes)
  * walk, the poor man's table-format snapshot id. The tail-bytes signal
  * (last ≤16 bytes per file — for parquet, the end of the compressed
  * footer metadata plus the footer-length word and magic) closes the
  * ADVICE-r11 gap where a same-size same-millisecond overwrite could
  * serve a stale artifact: different content means different footer
  * statistics, so the tail differs even when (size, mtime) do not. The
  * walk stays O(file count) — one pread of 16 bytes per file, never a
  * data scan; at 100 TB the same contract is the warehouse table's
  * snapshot/version id.
  *
  * Cross-process lifecycle (round 12): the fingerprint an artifact was
  * built from is also persisted INSIDE the artifact dir as a
  * `_FINGERPRINT` marker, written last. A ensure() in a fresh JVM whose
  * in-memory registry is empty re-derives the corpus fingerprint,
  * compares it to the marker, and ADOPTS the on-disk artifact without
  * rebuilding iff they match — the second half of the q309 lifecycle
  * (build once per corpus CONTENT, serve from disk, rebuild iff
  * changed), graded end-to-end by q313. Builds land in a sibling temp
  * dir and move into place atomically, so a concurrent process never
  * observes a half-written artifact (losing a move race re-checks the
  * winner's marker and adopts it).
  *
  * Root: a per-JVM temp dir by default (removed by a recursive shutdown
  * hook — ADVICE r10: `File.deleteOnExit` cannot remove non-empty dirs),
  * so every process rebuilds from the fixtures exactly once and a
  * forgotten [[FormatVersion]] bump cannot bite. Set
  * `-Dgraft.artifacts.root=…` or `GRAFT_ARTIFACT_ROOT` to a stable path
  * to share warm artifacts ACROSS processes (tests → Verify → Bench pay
  * the ~30 s corpus build once per machine instead of once per JVM);
  * the marker + versioned key make that safe, and q313's cold-JVM
  * phases grade exactly the adopt/stale paths such a root exercises.
  */
object ArtifactStore {
  /** Bumped whenever any builder changes its artifact layout or content
    * contract — part of every artifact key, so a persistent root treats
    * old-format artifacts as absent rather than adopting them. */
  val FormatVersion = 2

  private val MarkerFile = "_FINGERPRINT"

  private lazy val rootConf: (Path, Boolean) =
    sys.props.get("graft.artifacts.root").orElse(sys.env.get("GRAFT_ARTIFACT_ROOT")) match {
      case Some(p) =>
        val path = Paths.get(p)
        Files.createDirectories(path)
        (path, true)
      case None =>
        val p = Files.createTempDirectory("graft-artifacts-")
        Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p.toFile)))
        (p, false)
    }

  private def root: Path = rootConf._1

  /** Whether artifacts outlive this JVM (configured shared root). */
  def isPersistent: Boolean = rootConf._2

  private[ml] def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** artifact dir -> source-table fingerprint it was built/adopted from */
  private val built = scala.collection.mutable.HashMap.empty[String, String]
  /** per-artifact-dir build locks, so one corpus's multi-second build
    * never blocks another corpus's ensure (ADVICE r11 on q309's global
    * lock — same discipline applied here at the store layer). */
  private val dirLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]

  private def sha(text: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
  }

  /** Collision-proof filesystem key for an arbitrary path: sanitized
    * tail for readability + SHA prefix for uniqueness. Public because
    * the q309/q313 probes key their scratch corpora the same way. */
  def pathKey(d: String): String =
    s"${d.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(60)}-${sha(d)}"

  private def keyOf(kind: String, d: String): String =
    s"$kind-v$FormatVersion-${pathKey(d)}"

  /** Last ≤16 bytes of a regular file, hex — the cheap content signal
    * folded into the fingerprint (see class doc). Reads until the
    * buffer fills (a single positional read may legally return short,
    * e.g. on network filesystems — exactly the shared-root deployment;
    * a zero-padded short read would make the fingerprint
    * nondeterministic across walks). */
  private def tailSig(f: Path, size: Long): String = {
    val n = math.min(16L, size).toInt
    if (n == 0) "empty"
    else {
      val ch = java.nio.channels.FileChannel.open(f, StandardOpenOption.READ)
      try {
        val bb = java.nio.ByteBuffer.allocate(n)
        var pos = size - n
        while (bb.hasRemaining) {
          val r = ch.read(bb, pos)
          if (r < 0) bb.limit(bb.position()) // concurrent truncation: stop
          else pos += r
        }
        bb.array().take(bb.position()).map(b => f"$b%02x").mkString
      } finally ch.close()
    }
  }

  /** Content fingerprint of `tables` under corpus dir `d`: every regular
    * file's (relative path, size, mtime, tail bytes), sorted, hashed.
    * O(file count) — no data scan (one 16-byte pread per file). */
  def fingerprint(d: String, tables: Seq[String]): String = {
    import scala.jdk.CollectionConverters._
    val parts = tables.sorted.flatMap { t =>
      val p = Paths.get(d, t + ".parquet")
      if (!Files.exists(p)) Seq(s"$t:absent")
      else {
        val stream = Files.walk(p)
        try stream.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map { f =>
            val size = Files.size(f)
            s"${p.relativize(f)}:$size:${Files.getLastModifiedTime(f).toMillis}:" +
              tailSig(f, size)
          }
          .toSeq.sorted
        finally stream.close()
      }
    }
    sha(parts.mkString("\n"))
  }

  private def markerOf(dir: String): Option[String] = {
    val m = Paths.get(dir, MarkerFile)
    if (Files.isRegularFile(m))
      Some(new String(Files.readAllBytes(m), java.nio.charset.StandardCharsets.UTF_8))
    else None
  }

  /** Build-once-per-corpus-CONTENT: returns the artifact dir and whether
    * a (re)build fired this call. Resolution order: in-memory registry
    * (warm JVM) → on-disk `_FINGERPRINT` marker (cold JVM, artifact
    * already on disk — adopt without rebuilding) → build. Per-artifact
    * locking: concurrent ensures of DIFFERENT corpora build in parallel;
    * concurrent ensures of the same corpus serialize. */
  def ensure(s: SparkSession, d: String, kind: String, tables: Seq[String])
      (make: String => Unit): (String, Boolean) = {
    val dir = root.resolve(keyOf(kind, d)).toString
    val lock = dirLocks.computeIfAbsent(dir, _ => new Object)
    lock.synchronized {
      val fp = fingerprint(d, tables)
      if (built.synchronized(built.get(dir)).contains(fp)) (dir, false)
      else if (markerOf(dir).contains(fp)) {
        built.synchronized { built(dir) = fp }
        (dir, false)
      } else {
        val tmp = Paths.get(dir + s".tmp-${ProcessHandle.current().pid()}-${System.nanoTime()}")
        try {
          make(tmp.toString)
          Files.createDirectories(tmp) // a builder that wrote nothing still markers
          Files.write(tmp.resolve(MarkerFile),
            fp.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
          val target = Paths.get(dir)
          deleteRecursively(target.toFile) // stale or partial predecessor
          try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
          catch { case _: java.io.IOException =>
            // lost a cross-process move race: adopt the winner iff fresh
            if (markerOf(dir).contains(fp)) deleteRecursively(tmp.toFile)
            else { deleteRecursively(target.toFile); Files.move(tmp, target): Unit }
          }
        } finally
          // a build that threw mid-make must not leak its .tmp dir into a
          // persistent root (the nano-suffixed name matches no cleanup
          // pattern, so nothing else would ever remove it)
          if (Files.exists(tmp)) deleteRecursively(tmp.toFile)
        built.synchronized { built(dir) = fp }
        (dir, true)
      }
    }
  }

  /** Drop the registry entry AND the on-disk artifact so the next ensure
    * truly rebuilds — ScaleAudit uses this to time the build itself at
    * each scale point (memo-only removal would just re-adopt the disk
    * copy via its marker). */
  def invalidate(d: String, kind: String): Unit = {
    val dir = root.resolve(keyOf(kind, d)).toString
    built.synchronized { built.remove(dir): Unit }
    deleteRecursively(new java.io.File(dir))
  }

  /** Drop ONLY the in-memory registry entry, leaving the on-disk
    * artifact and its marker intact — byte-identical to what a process
    * restart with a persistent root sees, which is how q313 grades the
    * cold-JVM adopt/stale paths inside one test JVM. */
  def dropMemo(d: String, kind: String): Unit = {
    val dir = root.resolve(keyOf(kind, d)).toString
    built.synchronized { built.remove(dir): Unit }
  }

  /** Remove every artifact (all kinds) derived from corpus dir `d` —
    * scratch-corpus probes (q309/q313) call this from their shutdown
    * hook so a persistent root never accumulates per-run temp-corpus
    * artifacts. */
  def dropForCorpus(d: String): Unit = {
    val suffix = "-" + sha(d)
    built.synchronized {
      built.keys.filter(_.endsWith(suffix)).toSeq.foreach(built.remove)
    }
    val entries = root.toFile.listFiles()
    if (entries != null)
      entries.filter(_.getName.endsWith(suffix)).foreach(deleteRecursively)
  }
}
