package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable
/** Optimization-round instrumentation: run ONE registry query with a
  * stage-metrics listener and print a per-stage cost table (wall span,
  * summed executor run time, shuffle read/write bytes, task count, name)
  * for the WARM pass, so the expensive stage of a multi-job query is
  * identifiable without the Spark UI. Usage:
  *   runMain graft.Probe <sfDir> <q_a,q_b,...>
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class St(name: String, var submitted: Long = 0L, var completed: Long = 0L,
      var runMs: Long = 0L, var cpuMs: Long = 0L, var srBytes: Long = 0L,
      var swBytes: Long = 0L, var tasks: Int = 0, var rows: Long = 0L)
    names.split(',').map(_.trim).filter(_.nonEmpty).foreach { name =>
      val fn = SparkEntry.queries(name)
      // cold pass: codegen/JIT, mirrors Bench's discarded warm-up
      fn(spark, sfDir).count()
      spark.catalog.clearCache()
      val stages = mutable.LinkedHashMap.empty[Int, St]
      val listener = new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val st = stages.getOrElseUpdate(i.stageId, St(i.name))
          st.submitted = i.submissionTime.getOrElse(0L)
          st.completed = i.completionTime.getOrElse(0L)
          st.tasks = i.numTasks
          val m = i.taskMetrics
          if (m != null) {
            st.runMs = m.executorRunTime
            st.cpuMs = m.executorCpuTime / 1000000L
            st.srBytes = m.shuffleReadMetrics.totalBytesRead
            st.swBytes = m.shuffleWriteMetrics.bytesWritten
            st.rows = m.outputMetrics.recordsWritten
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
      Thread.sleep(500) // let the listener bus drain
      println(f"%nPROBE $name warm pass: $dt%.3f s, ${stages.size} stages")
      println(f"${"stage"}%6s ${"wall_ms"}%8s ${"run_ms"}%8s ${"cpu_ms"}%8s ${"sh_r_kb"}%8s ${"sh_w_kb"}%8s ${"tasks"}%6s  name")
      stages.toSeq.sortBy(_._1).foreach { case (id, s) =>
        val wall = if (s.completed > 0 && s.submitted > 0) s.completed - s.submitted else -1L
        println(f"$id%6d $wall%8d ${s.runMs}%8d ${s.cpuMs}%8d ${s.srBytes / 1024}%8d ${s.swBytes / 1024}%8d ${s.tasks}%6d  ${s.name.take(90)}")
      }
    }
    spark.stop()
  }
}
