package graft.tools

import org.apache.spark.sql.SparkSession

/** Suite-wide plan hygiene scan: builds every catalog query's physical
  * plan against a sf dir and reports any CartesianProduct (there must be
  * none — the intended all-pairs shapes use broadcast nested-loop with a
  * bounded build side) plus the SortMergeJoin count per query for
  * eyeballing unexpected wide joins. Exit 1 on any cartesian.
  *
  *   sbt "runMain graft.tools.PlanScan /root/testdata/sf0.001"
  */
object PlanScan {

  /** Empty-partitionSpec (single-task) windows that sort ROW-LEVEL data —
    * the wrong-shape-at-100× class. One structural exemption: the
    * rangeCumsum bucket-offsets window, recognizable because its input is
    * an aggregate grouped SOLELY by the `__bkt` bucket column — that
    * relation is bounded at ≤ ~1040 rows by octaveBucket16's range (the
    * q145-octave bounded-state idiom), so its single task holds ~KBs no
    * matter the corpus. Naming an unbounded grouping column `__bkt` would
    * fool this lint; the name is reserved for StatOps.rangeCumsum. */
  def rowLevelGlobalWindows(plan: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
    plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty && !isBucketTotalsWindow(w) => w.nodeName
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
        if w.partitionSpec.isEmpty => w.nodeName
    }

  private def isBucketTotalsWindow(
      w: org.apache.spark.sql.execution.window.WindowExec): Boolean = {
    import org.apache.spark.sql.execution._
    // the aggregate must be the window's DIRECT input (through sort/
    // exchange/project/codegen wrappers only) — a collect over the whole
    // subtree would also exempt a genuine row-level global window that
    // merely has a rangeCumsum somewhere upstream
    @annotation.tailrec
    def walk(p: SparkPlan): Boolean = p match {
      case a: aggregate.BaseAggregateExec =>
        a.groupingExpressions.nonEmpty &&
          a.groupingExpressions.forall(_.name == "__bkt")
      case s: SortExec => walk(s.child)
      case e: exchange.ShuffleExchangeExec => walk(e.child)
      case pr: ProjectExec => walk(pr.child)
      case c: WholeStageCodegenExec => walk(c.child)
      case i: InputAdapter => walk(i.child)
      case _ => false
    }
    walk(w.child)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-planscan")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // the view queries (q261) need the parse-time DDL routing every
      // other session builder carries
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    var cartesians = List.empty[String]
    var globalWindows = List.empty[String]
    var errors = List.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val exec = fn(spark, dir).queryExecution.executedPlan
        val p = exec.toString
        val smj = "SortMergeJoin".r.findAllIn(p).size
        // empty-partitionSpec window = Exchange SinglePartition + one task
        // sorting every row — the wrong-shape-at-100× class (see
        // rowLevelGlobalWindows for the one bounded exemption)
        if (rowLevelGlobalWindows(exec).nonEmpty) {
          globalWindows ::= name; println(s"GLOBALWIN $name")
        }
        if (p.contains("CartesianProduct")) {
          cartesians ::= name
          println(s"CARTESIAN $name")
        } else if (smj > 2) println(s"WIDE      $name ($smj SortMergeJoin)")
      } catch {
        // an unbuildable plan is NOT clean — its plan was never inspected
        case e: Throwable =>
          errors ::= name
          println(s"ERROR     $name ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
    println(if (cartesians.isEmpty && errors.isEmpty && globalWindows.isEmpty)
      "PLANSCAN: clean (no cartesian products, no global windows)"
    else s"PLANSCAN: ${cartesians.size} cartesian products " +
      s"(${cartesians.mkString(",")}); ${globalWindows.size} global windows " +
      s"(${globalWindows.mkString(",")}); ${errors.size} uninspectable " +
      s"(${errors.mkString(",")})")
    if (cartesians.nonEmpty || errors.nonEmpty || globalWindows.nonEmpty) sys.exit(1)
  }
}
