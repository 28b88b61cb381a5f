package graft

/** Host-speed canary: a FIXED single-threaded pure-JVM workload — 10⁷
  * SHA-256 updates of one constant 64-byte block (~640 MB hashed) — timed
  * and embedded in every bench artifact. This sandbox host's effective CPU
  * speed drifts minute-to-minute (2–4× between windows), so a wall-clock
  * number alone cannot be compared across runs or rounds; the canary makes
  * each artifact SELF-CERTIFYING: two bench JSONs are comparable iff their
  * canary times are, and a "slow window" run indicts itself (round-4
  * verdict: the official r4 bench recorded a 5× apparent regression that
  * was pure host drift, unprovable because no artifact carried a speed
  * reference).
  *
  * The workload is deliberately NOT Spark: no JIT warm-up sensitivity
  * beyond the first hundred iterations, no allocation churn, no memory
  * bandwidth component — it tracks core clock speed, the drift axis.
  */
object HostCanary {

  /** One canary measurement in seconds (smaller = faster host). */
  def run(): Double = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val block = new Array[Byte](64)
    java.util.Arrays.fill(block, 0x5a.toByte)
    val t0 = System.nanoTime()
    var i = 0
    while (i < 10000000) { md.update(block); i += 1 }
    val digest = md.digest()
    val secs = (System.nanoTime() - t0) / 1e9
    // consume the digest so the loop cannot be dead-code-eliminated
    if (digest(0) == 0x7f && digest(1) == 0x13) System.err.print("")
    secs
  }

  /** Best of `n` back-to-back runs — absorbs scheduler blips within a
    * window without hiding genuine cross-window drift.
    */
  def best(n: Int = 3): Double = (1 to n).map(_ => run()).min
}
