package graft

import java.nio.file.{Files, Paths}

import graft.catalog.{CatalogException, GraftStorage, ObjectStoreStorage}

/** Cross-PROCESS proof of the heartbeated marker-lease fence (round-16
  * verdict item 1): the MarkerLeaseSpec liveness matrix re-run with the
  * peer in a REAL forked JVM ([[MarkerLeaseProbe]]), the same standard
  * LockFenceSpec holds the OS-lock path to. Marker leases exist precisely
  * for multi-process deployments on lock-less stores (HDFS, object
  * stores), so in-process coverage alone proves the wrong thing: here the
  * two sides share only the storage directory — separate heartbeat
  * schedulers, separate clock calibrations, separate token universes.
  *
  * Plus the round-16 clock-skew hardening: staleness is judged against the
  * STORE's clock (probe-object mtime), so a client whose wall clock is
  * minutes off can neither break a live holder (fast clock) nor leave a
  * crashed holder's marker unbreakable (slow clock). Skew is injected by
  * overriding `localNowMillis` — exactly the quantity that diverges when a
  * fleet node's NTP drifts against the store.
  */
class ForkedMarkerLeaseSpec extends SparkSpec {

  private def shared(): String = tmpDir("graft_mlease_")

  /** Fork a JVM running [[MarkerLeaseProbe]] against `root`. */
  private def fork(root: String, staleMs: Long, action: String,
      arg: Long): Process = {
    val pb = new ProcessBuilder(
      s"${System.getProperty("java.home")}/bin/java",
      "-cp", System.getProperty("java.class.path"),
      "graft.MarkerLeaseProbe", root, staleMs.toString, action, arg.toString)
    pb.redirectErrorStream(true)
    pb.start()
  }

  private def awaitHeld(p: Process): Unit = {
    val r = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    val line = r.readLine()
    assert(line == "HELD", s"probe process failed to acquire: $line")
  }

  test("a live holder in THIS process survives a forked contender waiting " +
    "past staleMs: the heartbeat fences a real peer JVM") {
    val root = shared()
    val st = new ObjectStoreStorage(staleMs = 400)
    val lock = Paths.get(root, ".write_lock")
    val lease = st.lockExclusive(lock, 2000, "local-holder")
    try {
      // contender waits 1500ms > 3x TTL: only a heartbeat-refreshed marker
      // can hold it out that long
      val contender = fork(root, 400, "probe", 1500)
      assert(contender.waitFor() === 3,
        "the forked contender must time out against a live holder")
      assert(lease.isValidNow,
        "the fenced-out peer must not have invalidated the live lease")
    } finally lease.close()
    assert(fork(root, 400, "probe", 2000).waitFor() === 0,
      "after release the forked contender must acquire immediately")
  }

  test("a forked holder killed hard (halt) leaves a marker a peer process " +
    "breaks by age") {
    val root = shared()
    val p = fork(root, 300, "crash", 0)
    awaitHeld(p)
    p.waitFor() // halt(9): no close(), no further heartbeats — a real crash
    val st = new ObjectStoreStorage(staleMs = 300)
    val lease = st.lockExclusive(Paths.get(root, ".write_lock"), 5000, "next")
    assert(lease.isValidNow)
    lease.close()
    assert(!Files.exists(Paths.get(root, ".write_lock.x")),
      "the broken marker must be gone after release")
  }

  test("a forked holder whose heartbeats stall loses the lease to THIS " +
    "process, and its commit gate (isValidNow) detects the loss") {
    val root = shared()
    // the probe acquires with heartbeats effectively disabled, then polls
    // isValidNow — the exact read assertLeaseValid performs at commit points
    val p = fork(root, 300, "stall", 5000)
    awaitHeld(p)
    val st = new ObjectStoreStorage(staleMs = 300)
    val lease = st.lockExclusive(Paths.get(root, ".write_lock"), 5000, "breaker")
    try {
      assert(lease.isValidNow, "the breaker now legally holds the lease")
      assert(p.waitFor() === 0,
        "the stalled probe must observe isValidNow=false (exit 0 = LOST " +
          "detected) — and its close() must not have deleted our marker")
      assert(lease.isValidNow,
        "the loser's close() ran while we held: our marker must survive it")
    } finally lease.close()
  }

  test("a contender with a FAST client clock (skew >> staleMs) cannot " +
    "break a live holder: staleness rides the store's clock") {
    val root = shared()
    val st = new ObjectStoreStorage(staleMs = 400)
    val lock = Paths.get(root, ".write_lock")
    val lease = st.lockExclusive(lock, 2000, "holder")
    try {
      // +1200ms of client skew: under the r15 local-clock compare every
      // marker looks three TTLs old and gets broken on sight
      val skewed = new SkewedClientStorage(staleMs = 400, skewMs = 1200)
      intercept[CatalogException](skewed.lockExclusive(lock, 900, "skewed-peer"))
      assert(lease.isValidNow,
        "the live holder must survive a fast-clocked contender")
    } finally lease.close()
  }

  test("a contender with a SLOW client clock still breaks a genuinely " +
    "crashed marker promptly: the store clock, not the client's, ages it") {
    val root = shared()
    val x = Paths.get(root, ".write_lock.x")
    Files.createDirectories(x.getParent)
    Files.writeString(x, "dead-process-token|t")
    Thread.sleep(450) // store-clock age ≈ 450ms > staleMs
    // −1200ms of client skew: under the local-clock compare the marker
    // would look FRESH for another ~1s and this acquisition would time out
    val skewed = new SkewedClientStorage(staleMs = 300, skewMs = -1200)
    val lease = skewed.lockExclusive(Paths.get(root, ".write_lock"), 700, "slow-clock")
    assert(lease.isValidNow)
    lease.close()
  }
}

/** An [[ObjectStoreStorage]] whose CLIENT wall clock is `skewMs` off the
  * store's — the NTP-drift model for the skew tests above.
  */
final class SkewedClientStorage(staleMs: Long, skewMs: Long)
    extends ObjectStoreStorage(staleMs) {
  override protected def localNowMillis: Long =
    System.currentTimeMillis() + skewMs
}

/** Forked-JVM side of [[ForkedMarkerLeaseSpec]]: acquire the exclusive
  * marker lease on `<root>/.write_lock` through the production
  * [[ObjectStoreStorage]] path and then, per `action`:
  *
  *  - `probe <timeoutMs>` — try once with that timeout: exit 0 acquired
  *    (and released), 3 timed out;
  *  - `crash <_>` — print HELD, then `Runtime.halt`: a real kill −9 (no
  *    close, heartbeats die with the process, the marker stays);
  *  - `hold <ms>` — print HELD, hold for `ms` with live heartbeats, then
  *    close; exit 0;
  *  - `stall <maxWaitMs>` — acquire with heartbeats DISABLED (a holder in
  *    a fatal GC pause), print HELD, then poll `isValidNow` — the commit
  *    gate's read — until it flips: exit 0 when the loss is detected (and
  *    close() verified to leave the peer's marker alone), 5 if it never
  *    flips.
  */
object MarkerLeaseProbe {
  def main(args: Array[String]): Unit = {
    val Array(root, staleMsS, action, argS) = args.take(4)
    val staleMs = staleMsS.toLong
    val arg = argS.toLong
    val st = action match {
      case "stall" => new ObjectStoreStorage(staleMs) {
        override protected def heartbeatPeriodMs: Long = 3600000L
      }
      case _ => new ObjectStoreStorage(staleMs)
    }
    val lock = Paths.get(root, ".write_lock")

    def acquire(timeoutMs: Long): GraftStorage.Lease =
      st.lockExclusive(lock, timeoutMs, s"probe-$action")

    action match {
      case "probe" =>
        try { acquire(arg).close(); System.exit(0) }
        catch { case _: CatalogException => System.exit(3) }
      case "crash" =>
        acquire(2000)
        println("HELD"); System.out.flush()
        Runtime.getRuntime.halt(9)
      case "hold" =>
        val l = acquire(2000)
        println("HELD"); System.out.flush()
        Thread.sleep(arg)
        l.close(); System.exit(0)
      case "stall" =>
        val l = acquire(2000)
        println("HELD"); System.out.flush()
        val deadline = System.nanoTime + arg * 1000000L
        while (l.isValidNow && System.nanoTime < deadline) Thread.sleep(25)
        val lost = !l.isValidNow
        l.close() // must leave the new holder's marker untouched
        System.exit(if (lost) 0 else 5)
    }
  }
}
