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
  *
  * A third arg `atk` switches the DENOMINATOR to the exact top-5
  * neighbor set (recall@k, directed) instead of the exact ≥θ pair set.
  * The pair-set denominator is right for the rank-free pair queries,
  * but for a top-k JOIN it conflates index quality with the built-in
  * k-truncation: once the corpus is dense enough that the ≥θ pair
  * count exceeds k·n/2 (the sf1.0 fixture: 181k exact pairs vs ≤64k
  * coverable by a 5-NN join), even a PERFECT index is capped well
  * below 1.0 — measured ceiling 0.55 there — and the number stops
  * meaning what the 0.8 contract means. recall@k is the standard
  * ANN-benchmark metric for the join form.
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val annQuery = args.drop(1).headOption.getOrElse("q_ann_join")
    val atK = args.drop(2).headOption.contains("atk")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val exact: Set[(Long, Long)] =
      if (atK) {
        // exact DIRECTED top-5 per vector via the quadratic baseline
        // (the q_knn_eval exemption class — evidence tooling, not a
        // registered operator)
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        val em = graft.Tables.embeddings(spark, sfDir)
          .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
          .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("e"))
        val pr = em.as("a").join(em.as("b"), col("a.id") =!= col("b.id"))
          .select(col("a.id").as("ia"), col("b.id").as("ib"),
            aggregate(zip_with(col("a.e"), col("b.e"), (x, y) => x * y),
              lit(0.0), (acc, x) => acc + x)
              .divide(sqrt(aggregate(col("a.e"), lit(0.0), (acc, x) => acc + x * x))
                * sqrt(aggregate(col("b.e"), lit(0.0), (acc, x) => acc + x * x)))
              .as("sim"))
        pr.withColumn("rn", row_number().over(
            Window.partitionBy("ia").orderBy(col("sim").desc, col("ib").asc)))
          .filter(col("rn") <= 5)
          .collect().map(r => (r.getAs[Long]("ia"), r.getAs[Long]("ib"))).toSet
      } else
        graft.SparkEntry.queries("q_embed_neardup")(spark, sfDir).collect()
          .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val ann = graft.SparkEntry.queries(annQuery)(spark, sfDir).collect()
      .map { r =>
        val (a, b) =
          if (annQuery == "q_ann_pairs")
            (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))
          else (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"))
        if (atK) (a, b) else (math.min(a, b), math.max(a, b))
      }.toSet
    val hit = exact.count(ann.contains)
    println(s"""{"sf":"$sfDir","query":"$annQuery","metric":"${if (atK) "recall@5" else "pair_recall"}","exact_pairs":${exact.size},"ann_pairs":${ann.size},"hit":$hit,"recall":${
      if (exact.isEmpty) 1.0 else hit.toDouble / exact.size}}""")
    spark.stop()
  }
}
