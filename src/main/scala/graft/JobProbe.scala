package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** r20 fixed-overhead attribution probe (guide §1): the sf0.001-vs-sf0.1
  * comparison showed the bench suite is ~85% PER-QUERY FIXED OVERHEAD —
  * Spark jobs, stages and task scheduling, not data. This probe runs one
  * warmed timed rep of each named query under a SparkListener and prints
  * the job/stage/task counts plus per-job wall time, so "remove a job /
  * remove an exchange" work targets the queries where scheduling actually
  * dominates. Ad-hoc tool, not part of the bench contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.JobProbe q1 q2 ..."
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSet else Set.empty[String]
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }

    @volatile var jobs = Vector.empty[(Int, Long)] // (jobId, wallNanos)
    @volatile var stages = 0
    @volatile var tasks = 0
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts.put(e.jobId, System.nanoTime())
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(e.jobId)
        jobs :+= (e.jobId, System.nanoTime() - t0)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += e.stageInfo.numTasks
      }
    }
    spark.sparkContext.addSparkListener(listener)

    qs.foreach { case (name, fn) =>
      // warm once (side-channel exports, codegen)
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
      graft.dedup.MinHash.clearPermCache()
      System.gc()
      jobs = Vector.empty; stages = 0; tasks = 0
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a moment to drain
      Thread.sleep(300)
      val jobSecs = jobs.map(_._2 / 1e9)
      println(f"[jobprobe] $name%-28s wall=$wall%7.3f jobs=${jobs.size}%3d " +
        f"stages=$stages%3d tasks=$tasks%5d " +
        s"perJob=[${jobSecs.map(s => f"$s%.3f").mkString(",")}]")
    }
    spark.stop()
  }
}
