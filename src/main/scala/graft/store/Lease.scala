package graft.store

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Single-writer lease for the persisted stores ([[BandIndex]],
  * [[graft.store.IvfStore]], [[TextIndex]]). Their append contracts have
  * always FORBIDDEN concurrent writers — two jobs interleaving staged
  * renames at one index root corrupt meta counts silently — but nothing
  * enforced it; a production scheduler double-firing a nightly job is
  * exactly the event that hits it. Every mutating entry point now runs
  * under `Lease.withLease(root, op)`:
  *
  *  - **acquire**: create `<root>/_writer.lease` atomically
  *    (`FileSystem.create(overwrite = false)` — the same rename/create
  *    atomicity every staging protocol here already relies on). If a
  *    lease exists and its holder is LIVE (heartbeat younger than
  *    `staleMs`), fail fast with the holder's identity — never queue,
  *    never interleave.
  *  - **stale recovery**: a crashed writer's lease (heartbeat older than
  *    `staleMs`) is taken over by deleting it and re-creating atomically;
  *    a takeover race between two waiters resolves by the create — one
  *    wins, the loser fails fast. The crashed writer's half-done staging
  *    is then healed by the store's own open/heal matrix, which predates
  *    and is independent of the lease.
  *  - **release**: delete the lease on exit (success or exception — the
  *    heal matrix owns crash consistency; the lease only owns mutual
  *    exclusion).
  *  - **reentrant per thread**: a store operation that invokes another on
  *    the same root (e.g. `appendBatch` auto-compact, append's heal)
  *    re-enters the held lease instead of deadlocking on itself.
  *
  * A daemon heartbeat refreshes the lease timestamp every `staleMs / 3`
  * while an operation runs, so `staleMs` (default 30 min) bounds how
  * fast a CRASHED writer is detected — not how long a live compact may
  * take. Readers (probes, `open`) take no lease: every table here
  * exposes append-only or swap-published state that readers tolerate by
  * design. */
object Lease {
  import TextIndex.{fsOf, readSmall, writeSmall}

  /** Liveness horizon: a lease whose timestamp is older than this is a
    * crashed writer and may be taken over. */
  @volatile var staleMs: Long = 30L * 60 * 1000

  private val held = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue() = scala.collection.mutable.Set.empty[String]
  }

  private def ownerId: String =
    java.net.InetAddress.getLocalHost.getHostName + ":" +
      java.lang.management.ManagementFactory.getRuntimeMXBean.getPid + ":" +
      Thread.currentThread().getId

  private def leasePath(root: String) = new HPath(root, "_writer.lease")

  /** Run `body` as the sole writer at `root`. Fail-fast
    * IllegalStateException if another live writer holds the lease.
    * While held, a daemon heartbeat rewrites the lease timestamp every
    * `staleMs / 3`, so liveness detection is independent of how long the
    * operation runs — `staleMs` bounds crash DETECTION latency, not the
    * longest permissible compact. */
  def withLease[T](root: String, op: String)(body: => T): T = {
    val key = new HPath(root).toString // normalized
    if (held.get().contains(key)) return body // reentrant on this thread
    val fs = fsOf(root)
    val owner = ownerId
    acquire(fs, root, op, owner)
    held.get() += key
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val beat = new Thread(() => {
      while (!stop.get()) {
        try Thread.sleep(math.max(250L, staleMs / 3))
        catch { case _: InterruptedException => stop.set(true) }
        if (!stop.get())
          // overwrite-create; a reader catching the file mid-write parses
          // it as live (conservative) and retries
          try writeSmall(fs, leasePath(root),
            s"""{"owner":"$owner","ts":${System.currentTimeMillis()}}""")
          catch { case _: Exception => () }
      }
    }, s"graft-lease-heartbeat-$key")
    beat.setDaemon(true)
    beat.start()
    try body
    finally {
      stop.set(true)
      beat.interrupt()
      held.get() -= key
      fs.delete(leasePath(root), false)
    }
  }

  private def acquire(fs: FileSystem, root: String, op: String,
                      owner: String): Unit = {
    val p = leasePath(root)
    if (fs.exists(p)) {
      // read defensively: a lease mid-write (or 0-byte from a dying
      // holder) parses as live — conservative, the operator retries
      val s = try readSmall(fs, p) catch { case _: Exception => "" }
      val ts = TextIndex.jsonFieldOpt(s, "ts").getOrElse(Long.MaxValue)
      val age = System.currentTimeMillis() - ts
      if (age <= staleMs)
        throw new IllegalStateException(
          s"$op: another writer holds the lease at $root " +
            s"(${ownerField(s)}, ${age / 1000}s old; the append contract " +
            "forbids concurrent writers — wait for it or investigate)")
      // stale: crashed writer — take over. The delete+create races with
      // other waiters; create(overwrite=false) picks exactly one winner.
      fs.delete(p, false)
    }
    fs.mkdirs(new HPath(root))
    val out =
      try fs.create(p, false)
      catch {
        case e: java.io.IOException =>
          throw new IllegalStateException(
            s"$op: lost the lease race at $root (a concurrent writer " +
              "created the lease first) — the append contract forbids " +
              "concurrent writers", e)
      }
    try out.write(
      s"""{"owner":"$owner","ts":${System.currentTimeMillis()}}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  private def ownerField(s: String): String = {
    val i = s.indexOf("\"owner\":\"")
    if (i < 0) "owner unknown"
    else "held by " + s.substring(i + 9).takeWhile(_ != '"')
  }

  /** Spec seam: plant a lease as a FOREIGN writer would leave it —
    * `ageMs` in the past (0 = live now, > staleMs = crashed). */
  private[graft] def plant(root: String, ageMs: Long): Unit = {
    val fs = fsOf(root)
    fs.mkdirs(new HPath(root))
    writeSmall(fs, leasePath(root),
      s"""{"owner":"foreign:0:0","ts":${System.currentTimeMillis() - ageMs}}""")
  }

  private[graft] def exists(root: String): Boolean =
    fsOf(root).exists(leasePath(root))
}
