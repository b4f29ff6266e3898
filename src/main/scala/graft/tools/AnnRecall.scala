package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: measured pair recall of the occupancy-aware ANN join
  * (`q_ann_join`) against the exact cosine near-dup baseline
  * (`q_embed_neardup`) at an arbitrary scale factor — the evidence run
  * behind the annJoinAuto banding-curve calibration (the analytic curve
  * is conservative on this fixture: measured per-band collision runs
  * well below the random-hyperplane theory for uniform vectors, so the
  * derived band counts must be validated by measurement, not algebra).
  *
  *   SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.AnnRecall /root/testdata/sf0.1 q_ann_join'
  *
  * The second arg picks the approximate query: `q_ann_join` (directed
  * top-k, (vec_id, neighbor_id) columns) or `q_ann_pairs` (undirected
  * rank-free pairs, (vec_a, vec_b) columns). Default: q_ann_join.
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val annQuery = args.drop(1).headOption.getOrElse("q_ann_join")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val exact = graft.SparkEntry.queries("q_embed_neardup")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val ann = graft.SparkEntry.queries(annQuery)(spark, sfDir).collect()
      .map { r =>
        val (a, b) =
          if (annQuery == "q_ann_pairs")
            (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))
          else (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"))
        (math.min(a, b), math.max(a, b))
      }.toSet
    val hit = exact.count(ann.contains)
    println(s"""{"sf":"$sfDir","query":"$annQuery","exact_pairs":${exact.size},"ann_pairs":${ann.size},"hit":$hit,"recall":${
      if (exact.isEmpty) 1.0 else hit.toDouble / exact.size}}""")
    spark.stop()
  }
}
