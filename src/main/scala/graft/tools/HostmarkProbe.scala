package graft.tools

/** Standalone host-speed probe — measures the three hostmarks
  * ([[graft.Bench]]'s single-thread ALU, all-cores ALU, and all-cores
  * memory-bandwidth legs) without running any query, so a new host (or a
  * requalification pass on this one) can establish its quiet references
  * for the bench's comparability verdict:
  *
  *   sbt "runMain graft.tools.HostmarkProbe [threads] [rounds]"
  *
  * Prints one line per round plus the min-of-rounds summary — the min is
  * what the verdict compares against (transient stalls filter out; a
  * co-tenant that never lets a quiet round through is exactly what the
  * verdict should see). Export the minima as
  * SPARK_GRAFT_HOSTMARK_MT_REF / SPARK_GRAFT_HOSTMARK_BW_REF (with
  * SPARK_GRAFT_HOSTMARK_MT_THREADS) on a foreign host. */
object HostmarkProbe {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.flatMap(_.toIntOption)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val rounds = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(5)
    require(threads >= 1 && rounds >= 1, "usage: HostmarkProbe [threads>=1] [rounds>=1]")
    // JIT/alloc warmup: the first call of each mark compiles the loop and
    // (for bw) faults in the 256 MB array — not host speed
    graft.Bench.hostmark(); graft.Bench.hostmarkBw(threads)
    val rows = (1 to rounds).map { r =>
      val st = graft.Bench.hostmark()
      val mt = graft.Bench.hostmarkParallel(threads)
      val bw = graft.Bench.hostmarkBw(threads)
      println(f"round $r%2d: hostmark_st=$st%.3f hostmark_mt=$mt%.3f hostmark_bw=$bw%.3f")
      (st, mt, bw)
    }
    println(f"min of $rounds%d (threads=$threads%d): " +
      f"st=${rows.map(_._1).min}%.3f mt=${rows.map(_._2).min}%.3f bw=${rows.map(_._3).min}%.3f")
  }
}
