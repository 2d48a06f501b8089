package graft.pipeline

import java.io.{InputStream, OutputStream}
import java.nio.file.{Files, Path}

/** The reference's remote-source connector surface, modeled over `file://`.
  *
  * The reference's defining I/O is a paramiko SFTP pull: connect with 3
  * retries (`linehaul_source_to_bronze.py:19-34`), stat-probe each file and
  * SKIP on a miss (`:75-79`), download — whole-file with a watchdog
  * (`:47-62`) or in 5 MB chunks (`mm_source_to_bronze.py:57-79`) — verify
  * the size (`:85-89`), then stage the local file for the bronze load.
  * There is no SSH client in this environment, so the transport is an
  * abstraction ([[RemoteSource]]) with a local-filesystem implementation;
  * every *semantic* — probe→skip, retry-then-fail, chunked copy with
  * progress accounting, size gate, staging handoff — is real and tested.
  * On a cluster the same trait fronts an SFTP/object-store client.
  */
object Connector {
  /** 5 MB, the reference's chunk size (`mm_source_to_bronze.py:57`). */
  val DefaultChunkSize: Int = 5000000

  /** 200 s, the reference's download watchdog cap
    * (`linehaul_source_to_bronze.py:80`). */
  val DefaultFetchTimeoutMs: Long = 200000L

  final case class FileStat(size: Long, modifiedMs: Long)

  /** Transport tuning (`linehaul_source_to_bronze.py:24-27`): connect
    * timeout 60 s, banner timeout 200 s, keepalive every 30 s; connection
    * established with 3 attempts 5 s apart (`:19-33`). There is no SSH
    * client in this environment, so these are the configuration surface a
    * transport implementation consumes — the retry-then-fail *shape*
    * around connect is real ([[connectTransport]]). */
  final case class TransportTuning(
      connectTimeoutMs: Long = 60000L,
      bannerTimeoutMs: Long = 200000L,
      keepaliveIntervalMs: Long = 30000L,
      connectAttempts: Int = 3,
      connectRetryDelayMs: Long = 5000L)

  /** The reference's connect_to_sftp loop: up to `connectAttempts` calls,
    * `connectRetryDelayMs` apart, then fail with the last error. */
  def connectTransport[A](tuning: TransportTuning = TransportTuning())(
      connect: TransportTuning => A): A =
    Medallion.retry(tuning.connectAttempts, tuning.connectRetryDelayMs)(connect(tuning))

  /** Minimal remote transport: probe + sequential read. */
  trait RemoteSource {
    /** None = file absent (the reference's `sftp.stat` try/except). */
    def stat(path: String): Option[FileStat]
    def open(path: String): InputStream
  }

  /** `file://` transport — the local-volume pattern and the test double. */
  final class LocalSource(root: Path) extends RemoteSource {
    def stat(path: String): Option[FileStat] = {
      val p = root.resolve(path)
      if (Files.isRegularFile(p))
        Some(FileStat(Files.size(p), Files.getLastModifiedTime(p).toMillis))
      else None
    }
    def open(path: String): InputStream = Files.newInputStream(root.resolve(path))
  }

  final case class FetchReport(file: String, bytes: Long, chunks: Long, attempts: Int)

  /** Bounded-buffer copy; returns (bytes, chunks) — the reference's
    * per-chunk progress accounting (`mm_source_to_bronze.py:60-74`). */
  private def copyChunked(in: InputStream, out: OutputStream, chunkSize: Int): (Long, Long) = {
    val buf = new Array[Byte](chunkSize)
    var bytes = 0L
    var chunks = 0L
    var n = in.read(buf)
    while (n >= 0) {
      if (n > 0) { out.write(buf, 0, n); bytes += n; chunks += 1 }
      n = in.read(buf)
    }
    (bytes, chunks)
  }

  /** Download watchdog (`linehaul_source_to_bronze.py:47-62,80`): the
    * reference runs each download on a thread and `join`s with a 200 s
    * timeout so a hung transport read can't wedge the whole run. Same
    * shape here: the copy runs on a daemon worker; if it hasn't finished
    * within `timeoutMs`, the input stream is closed (which unblocks a
    * read stuck inside the transport), the worker is interrupted, and a
    * TimeoutException feeds the caller's retry loop. */
  private def copyWithWatchdog(
      in: InputStream, out: OutputStream, chunkSize: Int, timeoutMs: Long): (Long, Long) = {
    @volatile var result: Either[Throwable, (Long, Long)] = null
    val worker = new Thread(() => {
      result =
        try Right(copyChunked(in, out, chunkSize))
        catch { case t: Throwable => Left(t) }
    }, "graft-fetch-worker")
    worker.setDaemon(true)
    worker.start()
    worker.join(math.max(1L, timeoutMs))
    if (worker.isAlive) {
      try in.close() catch { case _: Throwable => () }
      worker.interrupt()
      throw new java.util.concurrent.TimeoutException(
        s"fetch exceeded watchdog timeout of $timeoutMs ms")
    }
    result match {
      case Right(v) => v
      case Left(e)  => throw e
    }
  }

  /** Probe → retrying chunked fetch → staged file → size gate.
    *
    * Returns None when the stat probe misses (the reference SKIPS absent
    * files rather than failing the run); throws after `attempts` failed
    * fetches (`Medallion.retry` semantics). Each fetch attempt is bounded
    * by the download watchdog (`timeoutMs`); a hung transport read times
    * out, feeds the retry loop, and fails cleanly after `attempts`. The
    * fetch writes to a temp name and renames into place only after the
    * size gate passes, so a torn download can never be read as a staged
    * file. */
  def fetchToStaging(
      src: RemoteSource, remotePath: String, stagingDir: Path,
      chunkSize: Int = DefaultChunkSize, attempts: Int = 3,
      delayMs: Long = 0, timeoutMs: Long = DefaultFetchTimeoutMs): Option[FetchReport] =
    src.stat(remotePath).map { st =>
      Files.createDirectories(stagingDir)
      val name = remotePath.split('/').last
      val dest = stagingDir.resolve(name)
      var attempt = 0
      // Each attempt writes a DISTINCT temp file: after a watchdog timeout
      // the abandoned worker thread may still hold an open descriptor to
      // its temp and complete a stale in-flight write through it — reusing
      // one path would let that write corrupt the next attempt's bytes.
      // Stale temps are swept by cleanupStaging.
      val (bytes, chunks, tmp) = Medallion.retry(attempts, delayMs) {
        attempt += 1
        val t = stagingDir.resolve(s"$name.__fetch_tmp$attempt")
        val in = src.open(remotePath)
        val (b, c) =
          try {
            val out = Files.newOutputStream(t)
            try copyWithWatchdog(in, out, chunkSize, timeoutMs) finally out.close()
          } finally in.close()
        (b, c, t)
      }
      // Gate on the staged file's ACTUAL size, not just the copy-loop
      // count, so nothing another writer did to the inode can slip past.
      require(bytes == st.size && Files.size(tmp) == st.size,
        s"short fetch for $remotePath: got $bytes bytes " +
          s"(file ${Files.size(tmp)}), expected ${st.size}")
      Files.move(tmp, dest, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      FetchReport(name, bytes, chunks, attempt)
    }

  /** Post-run staging cleanup (`linehaul_source_to_bronze.py:167-180`):
    * delete staged files and any abandoned fetch temps left by a killed
    * run. Returns the number of entries removed; an absent directory is a
    * no-op (the reference guards with an existence check). */
  def cleanupStaging(stagingDir: Path): Int = {
    if (!Files.isDirectory(stagingDir)) return 0
    val entries = Files.list(stagingDir)
    try {
      val it = entries.iterator()
      var n = 0
      while (it.hasNext) { Files.deleteIfExists(it.next()); n += 1 }
      n
    } finally entries.close()
  }
}

/** Connection-profile / secret-scope registry (`config.py:7-17,77-82`).
  *
  * The reference resolves a workspace URL to a secret *scope*, then reads
  * a JSON credential blob from `(scope, key)` and unpacks host/port/user.
  * Here the same indirection is a pure registry: the secret store is an
  * injected map (this library holds configuration structure, never
  * credential code) and resolution failures carry the scope/key context.
  */
object ConfigRegistry {
  final case class ConnectionProfile(host: String, port: Int, user: String, secretRef: String)

  /** workspace → scope, with the reference's fall-back-to-prod on any
    * resolution failure (`config.py:7-17`: the try/except defaults to the
    * prod scope). The ".6." marker selects the non-prod scope. */
  def scopeFor(workspaceUrl: Option[String], nonProdScope: String = "cdt-scope",
      prodScope: String = "prd-scope"): String =
    workspaceUrl match {
      case Some(u) if u.contains(".6.") => nonProdScope
      case _ => prodScope
    }

  /** (scope, key) → field map; the shape of the reference's JSON secret. */
  type SecretStore = Map[(String, String), Map[String, String]]

  def resolveProfile(store: SecretStore, scope: String, key: String): ConnectionProfile = {
    val creds = store.getOrElse((scope, key),
      throw new NoSuchElementException(s"no secret for scope=$scope key=$key"))
    def field(f: String): String = creds.getOrElse(f,
      throw new NoSuchElementException(s"secret $scope/$key missing field '$f'"))
    ConnectionProfile(field("url"), field("port").toInt, field("user"), s"$scope/$key")
  }
}
