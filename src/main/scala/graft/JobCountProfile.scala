package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler (dev-only): run named declared queries once and print
  * the Spark JOB / STAGE / TASK counts each submitted — the structural,
  * box-independent cost signature guide §1.2 targets ("don't compute
  * things you throw away": a redundant job shows up here regardless of
  * co-tenant noise). Warm artifacts are built before counting, like the
  * bench; each query runs twice and the SECOND run's counts are printed
  * (first-run listing/session warmup jobs excluded).
  *
  * Usage: runMain graft.JobCountProfile <sfDir> <queryName> [...]
  */
object JobCountProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.ui.enabled", "false")
      .appName("job-count-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    SparkEntry.warmArtifacts(spark, sfDir)

    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    val verbose = sys.env.contains("SPARK_GRAFT_JOBS_VERBOSE")
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size.toLong)
        tasks.addAndGet(j.stageInfos.map(_.numTasks.toLong).sum)
        if (verbose) {
          val site = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
          val stageNames = j.stageInfos.map(si => s"${si.name}(${si.numTasks}t)").mkString(" | ")
          println(s"[job] id=${j.jobId} stages=${j.stageInfos.size} " +
            s"tasks=${j.stageInfos.map(_.numTasks).sum} site=$site :: $stageNames")
        }
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val byName = SparkEntry.queries
    names.foreach { name =>
      byName.get(name) match {
        case None => println(s"[jobs] UNKNOWN query $name")
        case Some(fn) =>
          fn(spark, sfDir).count() // warm run (listings, codegen)
          Thread.sleep(500)
          jobs.set(0); stages.set(0); tasks.set(0)
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          Thread.sleep(1000) // listener bus drain
          println(f"[jobs] $name%-32s jobs=${jobs.get()}%-4d stages=${stages.get()}%-5d tasks=${tasks.get()}%-6d sec=$sec%.3f")
      }
    }
    spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}
