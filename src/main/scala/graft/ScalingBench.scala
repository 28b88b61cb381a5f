package graft

import scala.jdk.CollectionConverters._
import scala.io.Source

/** Scaling-efficiency evidence for the north rule's two-cluster-size
  * criterion: the SAME CDC replay job (identical deterministic input) at
  * local[N] and local[4N] stands in for N vs 4N executors (no real cluster
  * in the sandbox). Each parallelism level runs in its OWN child JVM
  * (fresh JIT state), warm-up replay first, best-of-reps measured.
  *
  * Efficiency = throughput(4N) / (4 × throughput(N)); target ≥ 0.8.
  */
object ScalingBench {

  private val jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Run MeasureReplay in a child JVM; returns (bestSeconds, totalEvents,
    * bestCanarySeconds) — the canary stamps which host-speed window the
    * child measured in.
    */
  def measure(cpus: Int, events: Long, reps: Int): (Double, Long, Double) = {
    val java = sys.props("java.home") + "/bin/java"
    val cmd = (Seq(java, "-Xmx8g", "-Dspark.ui.enabled=false") ++ jdk17AddOpens ++
      Seq("-cp", sys.props("java.class.path"), "graft.MeasureReplay",
        cpus.toString, events.toString, reps.toString)).asJava
    val pb = new ProcessBuilder(cmd)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = Source.fromInputStream(proc.getInputStream).getLines().toVector
    proc.waitFor()
    out.foreach(l => if (l.startsWith("REP")) System.err.println(s"[local[$cpus]] $l"))
    val best = out.find(_.startsWith("BEST")).getOrElse {
      out.takeRight(20).foreach(System.err.println)
      sys.error(s"child JVM failed for local[$cpus]")
    }
    val parts = best.split(" ")
    // -1 = canary unavailable (stale child build / truncated output) — a
    // parseable sentinel; NaN would poison min-folds and print invalid JSON
    val canary = out.filter(_.startsWith("CANARY "))
      .map(_.split(" ")(1).toDouble) match {
      case Seq() => -1.0
      case cs => cs.min
    }
    (parts(1).toDouble, parts(2).toLong, canary)
  }

  def main(args: Array[String]): Unit = {
    val events = sys.env.get("SPARK_GRAFT_BENCH_EVENTS").map(_.toLong).getOrElse(12000000L)
    val n = sys.env.get("SPARK_GRAFT_N").map(_.toInt).getOrElse(2)
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(3)
    val rounds = sys.env.get("SPARK_GRAFT_ROUNDS").map(_.toInt).getOrElse(2)
    // the sandbox host's effective CPU speed drifts minute-to-minute:
    // interleave N / 4N rounds so drift doesn't bias one level, keep bests
    var bestN = Double.MaxValue
    var best4N = Double.MaxValue
    var total = 0L
    var canaryN = Double.MaxValue
    var canary4N = Double.MaxValue
    // min over AVAILABLE canaries only: a -1 sentinel from one bad child
    // must not masquerade as the fastest window
    def foldCanary(cur: Double, c: Double): Double = if (c < 0) cur else math.min(cur, c)
    (1 to rounds).foreach { _ =>
      val (sN, tot, cN) = measure(n, events, reps)
      val (s4N, _, c4N) = measure(4 * n, events, reps)
      total = tot
      bestN = math.min(bestN, sN)
      best4N = math.min(best4N, s4N)
      canaryN = foldCanary(canaryN, cN)
      canary4N = foldCanary(canary4N, c4N)
    }
    if (canaryN == Double.MaxValue) canaryN = -1.0
    if (canary4N == Double.MaxValue) canary4N = -1.0
    val rN = total / bestN
    val r4N = total / best4N
    val eff = r4N / (4.0 * rN)
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"n_cpus":$n,"4n_cpus":${4 * n},"events":$total,"throughput_n":$rN%.0f,"throughput_4n":$r4N%.0f,"seconds_n":$bestN%.2f,"seconds_4n":$best4N%.2f,"canary_sec":{"n":$canaryN%.3f,"4n":$canary4N%.3f}}""")
  }
}
