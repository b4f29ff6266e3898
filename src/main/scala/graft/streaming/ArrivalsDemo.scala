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

    // EXACTLY ONE consuming query per watched directory: the source
    // renames files on commit, so two independent readStream queries on
    // the same path would race and steal files from each other. The
    // windowed analytics query chains off the first query's parquet sink
    // instead (a second, non-destructive file stream).
    val arrivals = spark.readStream.format("arrivals")
      .option("path", watchDir)
      .option("consumeOrder", "OLDEST")
      .option("maxFilesPerTrigger", "100")
      .load()

    // query 1 (the only directory consumer): raw metadata rows,
    // exactly-once into parquet
    val files = arrivals
      .withColumn("body_utf8", col("body").cast("string"))
      .writeStream.format("parquet")
      .option("path", s"$outDir/files")
      .option("checkpointLocation", s"$outDir/cp-files")
      .trigger(Trigger.ProcessingTime("500 milliseconds")) // ref poll cadence
      .start()

    // query 2: watermarked tumbling-window arrival counts (ref R6 cadence
    // generalized to event-time analytics), reading the sink of query 1
    new java.io.File(s"$outDir/files").mkdirs()
    val sinkSchema = graft.sources.arrivals.ArrivalsTable.schema
      .add("body_utf8", org.apache.spark.sql.types.StringType)
    val windowed = spark.readStream
      .schema(sinkSchema)
      .parquet(s"$outDir/files")
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
