package graft.tools
/** Pure-JVM probe: multithreaded surt throughput without Spark. */
object ThreadBench {
  def main(args: Array[String]): Unit = {
    println("availableProcessors=" + Runtime.getRuntime.availableProcessors)
    for (threads <- Seq(1, 8, 32)) {
      val perThread = 2000000
      val counters = new java.util.concurrent.atomic.AtomicLong()
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          var i = 0
          var acc = 0L
          while (i < perThread) {
            val url = s"https://www.host${i % 5000}.example.org/p/$i?b=2&a=1"
            acc += graft.core.UrlCanon.surt(url).length
            i += 1
          }
          counters.addAndGet(acc)
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val el = (System.nanoTime() - t0) / 1e9
      println(f"threads=$threads total=${threads.toLong * perThread} surt_per_sec=${threads.toLong * perThread / el}%.0f sec=$el%.1f")
    }
  }
}
