package graft

import org.scalatest.funsuite.AnyFunSuite

/** The ArtifactStore install discipline (round 13, ADVICE r12): dir
  * names carry the content fingerprint, a rebuild never deletes a live
  * predecessor, the lost-move-race branches actually execute (the r12
  * verdict: "the lose-and-adopt branch is currently argued in a
  * comment, never executed"), and the persistent-root init sweep
  * removes what no process can use. Round12OpsSpec keeps the
  * marker/freshness/thrown-build coverage; this spec owns the
  * concurrency and hygiene paths.
  */
class ArtifactStoreSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpCorpus(tag: String, content: String): java.nio.file.Path = {
    val c = java.nio.file.Files.createTempDirectory(tag).resolve("corpus")
    java.nio.file.Files.createDirectories(c)
    java.nio.file.Files.write(c.resolve("documents.parquet"), content.getBytes("UTF-8"))
    c
  }

  private def read(p: java.nio.file.Path): String =
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")

  test("rebuild for new content installs a NEW dir and retains the live predecessor") {
    val corpus = tmpCorpus("as13-", "v1")
    val d = corpus.toString
    def ensure(payload: String) =
      ml.ArtifactStore.ensure(spark, d, "spec13a", Seq("documents")) { out =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(out, "payload.txt"), payload.getBytes("UTF-8")): Unit
      }
    val (dir1, b1) = ensure("one")
    assert(b1)
    // content change -> different fingerprint -> DIFFERENT dir name
    java.nio.file.Files.write(corpus.resolve("documents.parquet"), "v2--".getBytes("UTF-8"))
    val (dir2, b2) = ensure("two")
    assert(b2 && dir1 != dir2, "new content must install under a new fingerprint dir")
    // the predecessor a concurrent reader may still be scanning is intact
    assert(read(java.nio.file.Paths.get(dir1, "payload.txt")) == "one")
    assert(read(java.nio.file.Paths.get(dir2, "payload.txt")) == "two")
    // the install-time sweep stamped the predecessor as superseded —
    // that stamp, not the dir mtime, is where the grace clock starts
    val stamp = java.nio.file.Paths.get(dir1, "_SUPERSEDED")
    assert(java.nio.file.Files.exists(stamp),
      "first sweep must stamp the superseded sibling, not delete it")
    // ADVICE r13 scenario: a dir INSTALLED long ago but superseded just
    // now must survive the grace period — install age proves nothing
    // about readers who adopted it seconds before the successor landed
    val old = System.currentTimeMillis() - ml.ArtifactStore.StaleGraceMs - 60000
    assert(new java.io.File(dir1).setLastModified(old))
    ml.ArtifactStore.dropMemo(d, "spec13a")
    val (dir3, b3) = ensure("three")
    assert(!b3 && dir3 == dir2, "unchanged content must adopt, not rebuild")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir1)),
      "old INSTALL time must not trigger the sweep — the clock runs from supersession")
    // …and once the SUPERSESSION stamp ages past the grace, it is swept
    assert(stamp.toFile.setLastModified(old))
    ml.ArtifactStore.dropMemo(d, "spec13a")
    val (dir4, b4) = ensure("four")
    assert(!b4 && dir4 == dir2)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir1)),
      "superseded fingerprint dir past the grace period must be swept")
  }

  test("re-supersession after a revert restarts the grace clock (ADVICE r14)") {
    val corpus = tmpCorpus("as15-", "v1")
    val d = corpus.toString
    val src = corpus.resolve("documents.parquet")
    def ensure(payload: String) =
      ml.ArtifactStore.ensure(spark, d, "spec15a", Seq("documents")) { out =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(out, "payload.txt"), payload.getBytes("UTF-8")): Unit
      }
    val mtimeV1 = java.nio.file.Files.getLastModifiedTime(src)
    val (dir1, _) = ensure("one")
    java.nio.file.Files.write(src, "v2--".getBytes("UTF-8"))
    val mtimeV2 = java.nio.file.Files.getLastModifiedTime(src)
    val (dir2, _) = ensure("two")
    val stamp1 = java.nio.file.Paths.get(dir1, "_SUPERSEDED")
    assert(java.nio.file.Files.exists(stamp1), "supersession must stamp dir1")
    // the stamp ages past the grace, but before any sweep fires the
    // corpus REVERTS to v1 (same bytes AND same mtime — the fingerprint
    // is (size, mtime, tail)) and dir1 becomes current again
    val old = System.currentTimeMillis() - ml.ArtifactStore.StaleGraceMs - 60000
    assert(stamp1.toFile.setLastModified(old))
    java.nio.file.Files.write(src, "v1".getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(src, mtimeV1)
    ml.ArtifactStore.dropMemo(d, "spec15a")
    val (dir3, b3) = ensure("three")
    assert(!b3 && dir3 == dir1, "revert must adopt the original fingerprint dir")
    assert(!java.nio.file.Files.exists(stamp1),
      "adopting a dir as current must clear its stale supersession stamp")
    // superseded a SECOND time: the first sweep must stamp FRESH and
    // retain — without the stamp-clear, the stale pre-revert clock would
    // already be past the grace and dir1 would be deleted immediately
    java.nio.file.Files.write(src, "v2--".getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(src, mtimeV2)
    ml.ArtifactStore.dropMemo(d, "spec15a")
    val (dir4, b4) = ensure("four")
    assert(!b4 && dir4 == dir2, "v2 content must re-adopt dir2")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir1)),
      "re-superseded dir must survive its fresh grace period")
    assert(java.nio.file.Files.exists(stamp1),
      "re-supersession must stamp the grace clock anew")
  }

  test("losing the move race to a FINISHED winner adopts it (branch executed, not argued)") {
    val corpus = tmpCorpus("as13r-", "race")
    val d = corpus.toString
    val fp = ml.ArtifactStore.fingerprint(d, Seq("documents"))
    var target: java.nio.file.Path = null
    val (dir, built) =
      ml.ArtifactStore.ensure(spark, d, "spec13b", Seq("documents")) { out =>
        // simulate another process winning while we build: the fp-named
        // target appears, fully marked, before our atomic move runs
        target = java.nio.file.Paths.get(
          out.substring(0, out.indexOf(".tmp-")))
        java.nio.file.Files.createDirectories(target)
        java.nio.file.Files.write(target.resolve("payload.txt"), "winner".getBytes("UTF-8"))
        java.nio.file.Files.write(target.resolve("_FINGERPRINT"), fp.getBytes("UTF-8"))
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(out, "payload.txt"), "loser".getBytes("UTF-8")): Unit
      }
    assert(built && dir == target.toString)
    assert(read(java.nio.file.Paths.get(dir, "payload.txt")) == "winner",
      "lost race against a marked winner must ADOPT the winner's artifact")
    // the loser's tmp dir must not leak
    val leaks = target.getParent.toFile.listFiles()
      .filter(f => f.getName.contains("spec13b") && f.getName.contains(".tmp-"))
    assert(leaks.isEmpty, s"leaked tmp dirs: ${leaks.mkString(", ")}")
    // and a later cold ensure adopts without rebuilding
    ml.ArtifactStore.dropMemo(d, "spec13b")
    val (_, b2) = ml.ArtifactStore.ensure(spark, d, "spec13b", Seq("documents"))(
      _ => fail("must adopt, not rebuild"))
    assert(!b2)
  }

  test("losing the move race to a MARKER-LESS partial replaces it") {
    val corpus = tmpCorpus("as13p-", "partial")
    val d = corpus.toString
    val (dir, built) =
      ml.ArtifactStore.ensure(spark, d, "spec13c", Seq("documents")) { out =>
        // a half-written fp-named dir (no marker — no process adopted it)
        val target = java.nio.file.Paths.get(out.substring(0, out.indexOf(".tmp-")))
        java.nio.file.Files.createDirectories(target)
        java.nio.file.Files.write(target.resolve("payload.txt"), "partial".getBytes("UTF-8"))
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(out, "payload.txt"), "mine".getBytes("UTF-8")): Unit
      }
    assert(built)
    assert(read(java.nio.file.Paths.get(dir, "payload.txt")) == "mine",
      "a marker-less partial predecessor must be replaced by the finished build")
    assert(java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(dir, "_FINGERPRINT")))
  }

  test("persistent-root init sweep: old tmp dirs and superseded FormatVersions go, rest stays") {
    val root = java.nio.file.Files.createTempDirectory("as13root-")
    def mk(name: String, ageMs: Long = 0): java.nio.file.Path = {
      val p = root.resolve(name)
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.write(p.resolve("f"), "x".getBytes("UTF-8"))
      if (ageMs > 0) p.toFile.setLastModified(System.currentTimeMillis() - ageMs)
      p
    }
    val v = ml.ArtifactStore.FormatVersion
    val oldVersion = mk(s"hybrid-v${v - 1}-corpus-abcd1234")
    val current = mk(s"hybrid-v$v-corpus-abcd1234--deadbeef00112233")
    val staleTmp = mk(s"hybrid-v$v-corpus-abcd1234--ff.tmp-1-2",
      ml.ArtifactStore.TmpSweepMs + 60000)
    val freshTmp = mk(s"hybrid-v$v-corpus-abcd1234--ee.tmp-3-4")
    val stray = mk("not-ours")
    ml.ArtifactStore.sweepRoot(root)
    assert(!java.nio.file.Files.exists(oldVersion), "superseded FormatVersion must be swept")
    assert(!java.nio.file.Files.exists(staleTmp), "hours-old orphan tmp must be swept")
    assert(java.nio.file.Files.exists(current), "current-version artifact must survive")
    assert(java.nio.file.Files.exists(freshTmp), "a live build's fresh tmp must survive")
    assert(java.nio.file.Files.exists(stray), "non-artifact entries are not ours to delete")
  }

  test("cross-JVM adoption: a REAL second JVM adopts without rebuilding (CI form)") {
    // the r12 verdict: q313's dropMemo phases SIMULATE a restart; this
    // forks genuinely separate JVMs (each builds its own SparkSession)
    // against one shared GRAFT_ARTIFACT_ROOT — the CI twin of
    // tools/crossjvm_check.sh, plus the STALE phase the script lacks.
    // Child 1 must build, child 2 must adopt via the _FINGERPRINT
    // marker with zero Spark jobs on the build path, and child 3 —
    // after the corpus changes under them — must rebuild.
    val root = java.nio.file.Files.createTempDirectory("crossjvm-ci-")
    // probe against a COPY of the fixture so the stale phase can mutate
    // it (the fixture itself is read-only)
    val corpus = java.nio.file.Files.createTempDirectory("crossjvm-corpus-")
    Seq("documents.parquet", "embeddings.parquet").foreach { f =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(sf, f),
        corpus.resolve(f)): Unit
    }
    // the child needs Spark's JDK-17 module opens (build.sbt injects
    // these for forked test/run JVMs; a raw ProcessBuilder java does not
    // inherit them)
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def probe(): String = {
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val cmd = Seq(javaBin) ++ opens ++ Seq("-Xmx3g",
        "-Dspark.ui.enabled=false", "-cp", System.getProperty("java.class.path"),
        "graft.CrossJvmProbe", corpus.toString)
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("GRAFT_ARTIFACT_ROOT", root.toString)
      pb.environment().put("SPARK_GRAFT_CPUS", "4")
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
      assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), "child JVM hung")
      assert(p.exitValue() == 0, s"child JVM failed:\n${out.takeRight(2000)}")
      out.linesIterator.filter(_.contains("\"probe\":\"crossjvm\"")).toSeq.last
    }
    try {
      val first = probe()
      val second = probe()
      assert(first.contains("\"built\":true"), s"jvm1 must build: $first")
      assert(second.contains("\"built\":false"), s"jvm2 must adopt: $second")
      def n(s: String) = "\"n_indexed\":(\\d+)".r.findFirstMatchIn(s).get.group(1)
      assert(n(first) == n(second), "adopted artifact must serve identical rows")
      // stale phase: the corpus changes between processes (an mtime-visible
      // rewrite — the fingerprint's snapshot-id contract) → child 3 rebuilds
      val doc = corpus.resolve("documents.parquet")
      java.nio.file.Files.setLastModifiedTime(doc,
        java.nio.file.attribute.FileTime.fromMillis(
          java.nio.file.Files.getLastModifiedTime(doc).toMillis + 73000))
      val third = probe()
      assert(third.contains("\"built\":true"), s"jvm3 must rebuild on stale corpus: $third")
    } finally {
      ml.ArtifactStore.dropForCorpus(corpus.toString)
      def del(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(del); f.delete(): Unit
      }
      del(root.toFile)
      del(corpus.toFile)
    }
  }

  test("dropForCorpus removes every kind and fingerprint version for that corpus only") {
    val cA = tmpCorpus("as13dA-", "A")
    val cB = tmpCorpus("as13dB-", "B")
    def build(d: String, kind: String) =
      ml.ArtifactStore.ensure(spark, d, kind, Seq("documents")) { out =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out)): Unit
      }._1
    val a1 = build(cA.toString, "spec13d")
    val a2 = build(cA.toString, "spec13e")
    val b1 = build(cB.toString, "spec13d")
    ml.ArtifactStore.dropForCorpus(cA.toString)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(a1)))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(a2)))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(b1)),
      "another corpus's artifacts must survive")
  }
}
