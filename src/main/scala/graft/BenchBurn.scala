package graft

/** Busy-loop hardware probe, run as a SUBPROCESS so Bench can pin it to
  * the same CPU affinity set the timed builds use (`taskset -c …`): the
  * per-trial ceiling must be measured on the cores the job actually ran
  * on, or single-core turbo on an unpinned probe would mis-state the
  * ceiling the pinned build could reach.
  *
  * args: <threads>
  * stdout: one line `BENCHBURN_RESULT <totalIterations>`
  */
object BenchBurn {
  def burn(threads: Int): Long = {
    val counts = new java.util.concurrent.atomic.AtomicLong
    val ts = (0 until threads).map { _ =>
      new Thread(() => {
        val t0 = System.nanoTime()
        var x = 0L
        while (System.nanoTime() - t0 < 1500000000L) x += 1
        counts.addAndGet(x)
        ()
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    counts.get()
  }

  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    burn(1) // JIT warm
    println(s"BENCHBURN_RESULT ${burn(threads)}")
  }
}
