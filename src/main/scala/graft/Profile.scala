package graft

import org.apache.spark.sql.SparkSession

/** In-JVM sampling profiler for single queries — the measurement tool
  * behind the "profiled, not guessed" adjudications in SCALING.md. Runs
  * the named queries under the Bench session configuration while a
  * daemon thread snapshots every live thread's stack at ~100 Hz, then
  * prints the hottest frames (self-sample counts, RUNNABLE threads only,
  * JVM plumbing collapsed) so a regression's CPU owner is attributable
  * to a specific operator or codegen path. Local[32] only — this is a
  * diagnosis harness, not a cluster profiler.
  *
  * Usage: runMain graft.Profile <query> [query ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", ShuffleDir.path)
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      // Warm pass: JIT + codegen, so samples measure the data path.
      SparkEntry.queries(name)(spark, sf)
        .write.format("noop").mode("overwrite").save()
      TrackedCaches.release(); spark.catalog.clearCache()
      val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var run = true
      val sampler = new Thread(() => {
        while (run) {
          val traces = Thread.getAllStackTraces
          traces.forEach { (t, st) =>
            if (t.getState == Thread.State.RUNNABLE && st.nonEmpty &&
                t.getName != "graft-profiler") {
              // A thread whose TOP frame is an I/O-poll/park primitive is
              // idle despite reporting RUNNABLE (epoll waiters do) — drop
              // the sample entirely. Skipping just the frame and counting
              // the first application caller below it would credit an idle
              // Netty/shuffle event loop with ~100 samples/s and let it
              // outrank the real CPU owner.
              // contains-matching, NOT startsWith: StackTraceElement
              // .toString prefixes frames with the classloader/module
              // ("app//io.netty...", "java.base@17.0.20/java.net..."),
              // which silently defeated the original prefix guards — the
              // round-11 profile of a map-only query showed an idle epoll
              // waiter as the "hottest frame" with 98% of samples.
              val frames = st.iterator.map(_.toString).toSeq
              val idle = frames.headOption.exists(f =>
                f.contains("java.net.") || f.contains("sun.nio") ||
                  f.contains("java.io.FileDescriptor") ||
                  f.contains("Unsafe.park") || f.contains("epollWait") ||
                  f.contains("Reference.waitForReferencePendingList") ||
                  f.contains("Object.wait"))
              val top = if (idle) None else frames.headOption
              top.foreach(f => counts.merge(f, 1, (a, b) => a + b))
              // Optional caller attribution: when the top frame matches
              // GRAFT_PROFILE_CALLER_OF, also count the nearest enclosing
              // spark/graft frame so "who calls the hot leaf" is answerable.
              sys.env.get("GRAFT_PROFILE_CALLER_OF").foreach { pat =>
                if (top.exists(_.contains(pat))) {
                  frames.filter(f => f.contains("spark") || f.contains("graft"))
                    .take(4).zipWithIndex.foreach { case (f, i) =>
                      counts.merge(s"CALLER[$i] $f", 1, (a, b) => a + b)
                    }
                }
              }
            }
          }
          Thread.sleep(10)
        }
      }, "graft-profiler")
      sampler.setDaemon(true)
      val t0 = System.nanoTime()
      sampler.start()
      (1 to 3).foreach { _ =>
        SparkEntry.queries(name)(spark, sf)
          .write.format("noop").mode("overwrite").save()
        TrackedCaches.release(); spark.catalog.clearCache()
      }
      run = false
      sampler.join()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name 3 timed runs in $dt%.2f s; hottest frames:")
      import scala.jdk.CollectionConverters._
      counts.asScala.toSeq.sortBy(-_._2.intValue()).take(30).foreach {
        case (f, c) => println(f"[profile]   $c%6d  $f")
      }
    }
    spark.stop()
  }
}
