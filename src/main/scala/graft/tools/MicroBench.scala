package graft.tools

import graft.build.{Datagen, IndexBuilder, InputDoc}

/** Dev tool: single-thread + multithread (no Spark) compute floor. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    def work(idx: Long): Int = {
      val r = Datagen.row(42L, idx, 100, 5000)
      val d = InputDoc(0, r.path, r.repo, r.path, r.commit, r.lang, r.content)
      // one-doc segment inversion exercises tokenize+sha+encode
      IndexBuilder.buildSegment((idx % 128).toInt, Iterator(d)).size
    }
    // warm up JIT
    (0L until 2000L).foreach(work)
    for (threads <- Seq(1, 8, 32)) {
      val t0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val chunk = n / threads
      val futs = (0 until threads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = (t * chunk until (t + 1) * chunk).foreach(i => work(i.toLong))
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"MICRO threads=$threads docs=$n ${secs}%.2f s  ${n / secs}%.0f docs/s")
    }
  }
}
