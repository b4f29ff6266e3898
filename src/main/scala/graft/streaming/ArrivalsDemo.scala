package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end demo of the `arrivals` source — the Spark equivalent of the
  * reference's deployed Flume topology (source → channel → sink,
  * CephFsSource.java lifecycle): watch a directory, emit one metadata row
  * per arriving file, mark files consumed by rename, and maintain a
  * 5-minute tumbling count of arrivals with a watermark (late files beyond
  * 10 minutes are dropped from the aggregate).
  *
  * Usage: runMain graft.streaming.ArrivalsDemo <watchDir> <outDir> [seconds]
  * Writes per-file rows to <outDir>/files (parquet, exactly-once) and
  * prints windowed counts to the console.
  */
object ArrivalsDemo {
  def main(args: Array[String]): Unit = {
    val watchDir = args(0)
    val outDir = args(1)
    val runSeconds = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("arrivals-demo")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val arrivals = spark.readStream.format("arrivals")
      .option("path", watchDir)
      .option("consumeOrder", "OLDEST")
      .option("maxFilesPerTrigger", "100")
      .load()

    // sink 1: the raw metadata rows, exactly-once into parquet
    val files = arrivals
      .withColumn("body_utf8", col("body").cast("string"))
      .writeStream.format("parquet")
      .option("path", s"$outDir/files")
      .option("checkpointLocation", s"$outDir/cp-files")
      .trigger(Trigger.ProcessingTime("500 milliseconds")) // ref poll cadence
      .start()

    // sink 2: watermarked tumbling-window arrival counts (ref R6 cadence
    // generalized to event-time analytics on the arrival stream)
    val windowed = arrivals
      .withWatermark("last_modified", "10 minutes")
      .groupBy(window(col("last_modified"), "5 minutes"))
      .agg(count(lit(1)).as("files"))
      .writeStream.outputMode("update").format("console")
      .option("checkpointLocation", s"$outDir/cp-windows")
      .option("truncate", "false")
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()

    Thread.sleep(runSeconds * 1000L)
    files.stop(); windowed.stop()
    spark.stop()
  }
}
