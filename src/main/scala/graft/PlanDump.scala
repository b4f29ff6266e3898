package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the FORMATTED physical plan of named queries (or the
  * N heaviest is the caller's choice) against a fixture dir —
  * `runMain graft.PlanDump <sfDir> q_a q_b ...`. Complements
  * PlanAuditSpec (which asserts plan SHAPES mechanically): this is the
  * eyeball pass — WholeStageCodegen span width, PushedFilters,
  * ReadSchema pruning, exchange count — per the build rule "explain
  * every operator until it's the plan you'd want, not the first one
  * that passed". */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable => println(s"FAILED: ${e.getMessage}") }
      Hygiene.dropLeakedBlocks(spark)
    }
    spark.stop()
  }
}
