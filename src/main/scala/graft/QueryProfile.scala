package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}
import scala.collection.concurrent.TrieMap

/** Optimization-round tooling: run one query (construction + execution)
  * under a job listener and print per-job wall times + stage shuffle
  * metrics, so the expensive phase of a multi-job operator (eager
  * localCheckpoints, iterative loops, store builds) is attributable.
  * Usage: SPARK_GRAFT_ONLY=q48_jaccard_join java -cp ... graft.QueryProfile <sfDir>
  * Runs each selected query WARMUPS+1 times; reports the last run. */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmups = sys.env.getOrElse("SPARK_GRAFT_PROFILE_WARMUPS", "1").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_COALESCE_FLOOR", "64k"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.quietAdjudicatedWarnings()
    val jobStart = TrieMap[Int, (Long, String)]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart(js.jobId) = (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse(""))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobStart.remove(je.jobId).foreach { case (t0, desc) =>
          jobs.add((je.jobId, (System.nanoTime() - t0) / 1e9, desc))
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        val dur = (for {
          t0 <- sc.stageInfo.submissionTime; t1 <- sc.stageInfo.completionTime
        } yield (t1 - t0) / 1e3).getOrElse(0.0)
        stages.add((sc.stageInfo.stageId, dur, sc.stageInfo.numTasks,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
          sc.stageInfo.name))
      }
    })
    // pre-build memoized stores so profiles measure query plans, not ingest
    try graft.registry.Registry.warehouseFor(spark, sfDir) catch { case _: Throwable => () }
    try graft.registry.Registry.cloneFor(spark, sfDir) catch { case _: Throwable => () }
    try graft.registry.Registry.multiWarehouseFor(spark, sfDir) catch { case _: Throwable => () }
    try graft.registry.Registry.ivfIndexFor(spark, sfDir) catch { case _: Throwable => () }
    try graft.registry.Registry.curationLayoutFor(spark, sfDir) catch { case _: Throwable => () }
    try graft.registry.Registry.textIndexFor(spark, sfDir) catch { case _: Throwable => () }
    try graft.registry.Registry.textIndexDeltaFor(spark, sfDir) catch { case _: Throwable => () }
    try graft.registry.Registry.textIndexPosFor(spark, sfDir) catch { case _: Throwable => () }
    try graft.registry.Registry.bandIndexFor(spark, sfDir) catch { case _: Throwable => () }
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        for (_ <- 1 to warmups) {
          try fn(spark, sfDir).queryExecution.toRdd
            .foreachPartition(it => while (it.hasNext) it.next())
          catch { case e: Throwable => System.err.println(s"[prof] $name warm: ${e.getMessage}") }
        }
        jobs.clear(); stages.clear()
        val t0 = System.nanoTime()
        var tBuilt = 0L
        try {
          val df = fn(spark, sfDir)
          tBuilt = System.nanoTime()
          df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
        } catch { case e: Throwable => System.err.println(s"[prof] $name: ${e.getMessage}") }
        val tEnd = System.nanoTime()
        import scala.jdk.CollectionConverters._
        val js = jobs.asScala.toSeq.sortBy(_._1)
        println(f"== $name total=${(tEnd - t0) / 1e9}%.3f s " +
          f"(construct=${(tBuilt - t0) / 1e9}%.3f, execute=${(tEnd - tBuilt) / 1e9}%.3f), ${js.size} jobs")
        js.foreach { case (id, sec, desc) =>
          println(f"   job $id%4d  $sec%7.3f s  $desc")
        }
        stages.asScala.toSeq.sortBy(-_._2).take(12).foreach {
          case (sid, dur, nt, sr, sw, nm) =>
            println(f"   stage $sid%4d  $dur%7.3f s  tasks=$nt%3d shufR=${sr / 1024}%6d KiB shufW=${sw / 1024}%6d KiB  $nm")
        }
      }
    spark.stop()
  }
}
