package graft
import org.apache.spark.sql.SparkSession
object MiniBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val names = args.toSeq
    names.foreach { n => try SparkEntry.queries(n)(spark, sfDir).count() catch { case e: Throwable => System.err.println(s"warm $n: $e") } }
    names.foreach { n =>
      (1 to reps).foreach { r =>
        Hygiene.dropLeakedBlocks(spark)
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(n)(spark, sfDir).count()
          println(f"MINIBENCH $n rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
        } catch {
          case e: Throwable => println(s"MINIBENCH $n rep$r FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
