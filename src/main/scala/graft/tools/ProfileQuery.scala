package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.{SparkListenerSQLExecutionEnd, SparkListenerSQLExecutionStart}

import scala.collection.mutable

/** Per-action attribution for one SparkEntry query (guide §1: measure
  * first): runs the query warm, then records every SQL execution's
  * call-site description and wall time on the final rep — the breakdown
  * that tells a fixture query whether its cost is commits, pin collects,
  * or the final aggregation. `runMain graft.tools.ProfileQuery <sfDir> <q> [reps]`. */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val q = args(1)
    val warmReps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(5000000L).selectExpr("sum(id)").collect()

    case class Exec(desc: String, start: Long, var end: Long = -1L)
    val execs = mutable.LinkedHashMap[Long, Exec]()
    var jobTimeMs = 0L
    val jobStarts = mutable.HashMap[Int, Long]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (record) jobStarts(e.jobId) = e.time
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobStarts.remove(e.jobId).foreach(t0 => jobTimeMs += e.time - t0)
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case e: SparkListenerSQLExecutionStart =>
          if (record) execs(e.executionId) = Exec(e.description, e.time)
        case e: SparkListenerSQLExecutionEnd =>
          execs.get(e.executionId).foreach(_.end = e.time)
        case _ => ()
      }
    })

    q.split(',').foreach { qn =>
      val fn = graft.SparkEntry.queries(qn)
      execs.clear(); jobTimeMs = 0L
      (1 to warmReps).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        println(f"[prof] $qn warm rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
      record = true
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      record = false
      Thread.sleep(1500) // let the listener bus drain
      println(f"[prof] $qn RECORDED rep ${wall}%.3f s ($n rows); spark job time ${jobTimeMs / 1e3}%.3f s")
      val byDesc = execs.values.toSeq.filter(_.end > 0)
        .groupBy(_.desc)
        .map { case (d, es) => (d, es.size, es.map(e => e.end - e.start).sum) }
        .toSeq.sortBy(-_._3)
      val totalMs = byDesc.map(_._3).sum
      println(f"[prof] $qn sum of SQL executions ${totalMs / 1e3}%.3f s over ${execs.size} executions")
      byDesc.take(20).foreach { case (d, cnt, ms) =>
        println(f"[prof]   ${ms}%6d ms x$cnt%-3d $d")
      }
    }
    spark.stop()
  }
}
