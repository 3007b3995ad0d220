package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-call-site job census for a named SparkEntry query — the
  * job-count profiler behind the micro-batch ingest tuning: prints
  * every Spark job's call site with its occurrence count so a
  * fixed-latency action can be attributed to the exact line that
  * fires it. Usage: runMain graft.tools.JobMap <sfDir> <query>. */
object JobMap {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = if (args.length > 1) args(1) else "ingest_neardup_pipeline"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)
    graft.plans.WindowTopK.enable(spark)
    // one warm pass so the census run isn't polluted by first-use jobs
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    val sites = mutable.LinkedHashMap.empty[String, Int]
    val dump = mutable.ArrayBuffer.empty[String]
    var n = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        sites.synchronized {
          n += 1
          // the result stage's `details` holds the action's full stack
          // trace; the first graft frame below the streaming machinery
          // is the line that fired the job (stage NAME only carries the
          // stream-start call site for micro-batch jobs)
          val site = j.stageInfos.lastOption.map { st =>
            val frames = st.details.linesIterator
              .filter(l => l.contains("graft") && !l.contains("JobMap"))
              .take(2).map(_.trim.replaceAll("^at ", "")).toSeq
            if (frames.nonEmpty) frames.mkString(" <- ")
            else st.name.takeWhile(_ != '+').trim
          }.getOrElse("?")
          sites.update(site, sites.getOrElse(site, 0) + 1)
          val props = Option(j.properties)
          val execId = props.flatMap(p =>
            Option(p.getProperty("spark.sql.execution.id"))).getOrElse("-")
          val desc = props.flatMap(p =>
            Option(p.getProperty("spark.job.description"))).getOrElse("-")
          val stages = j.stageInfos.map { st =>
            val scopes = st.rddInfos.flatMap(_.scope)
              .map(_.name).distinct.mkString(",")
            s"[tasks=${st.numTasks} $scopes]"
          }.mkString(" ")
          dump += s"job=${j.jobId} exec=$execId $stages " +
            s"desc=${desc.linesIterator.take(1).mkString}"
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    println(f"[jobmap] $name: $n jobs, $sec%.2f s")
    sites.toSeq.sortBy(-_._2).foreach { case (s, c) =>
      println(f"[jobmap]   $c%4d  $s")
    }
    // full per-job dump for deep triage
    sys.env.get("JOBMAP_DUMP").foreach { path =>
      val w = new java.io.PrintWriter(path)
      dump.foreach(w.println)
      w.close()
      println(s"[jobmap] dumped ${dump.size} job traces to $path")
    }
    spark.stop()
  }
}
