package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable similarity-search operators over an embedding column
  * (`array<float>` or `array<double>`) — the library surface behind the
  * `q_similarity_*` / `q_ann_*` / `q_embed_*` queries. Dot products run
  * through the codegen'd `vec_dot` native expression.
  */
object Similarity {

  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
  def norm(a: Column): Column = sqrt(dot(a, a))
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def reg(df: DataFrame): Unit =
    graft.functions.VectorExprs.register(df.sparkSession)

  /** Exact cosine top-k neighbors of one probe row. The probe is
    * broadcast; the corpus is scanned map-side and reduced via
    * per-partition top-k (TakeOrderedAndProject) — no corpus shuffle.
    * Returns (id, sim) ordered by sim desc (4dp-rounded), id asc. */
  def cosineTopK(corpus: DataFrame, idCol: String, embCol: String,
      probeId: Long, k: Int = 10): DataFrame = {
    reg(corpus)
    val probe = corpus.filter(col(idCol) === probeId).select(col(embCol).as("pe"))
    corpus.filter(col(idCol) =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col(idCol).as("id"), round(cosine(col(embCol), col("pe")), 4).as("sim"))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
  }

  /** LABEL-NOISE audit over the embedding space (the confident-learning
    * signal — Northcutt et al. 2021: examples far from their own class
    * and close to another are the mislabel candidates): per label, a
    * DECIMAL-EXACT centroid ([[graft.functions.VecSumDecAgg]] scaled-
    * long sums + HALF_UP 6dp means — partition-order-invariant by
    * VALUE, the fitIvf discipline), then every vector scores its
    * cosine to its OWN centroid and to its best OTHER centroid, and
    * the `kWorst` least-typical members per label are reported with
    * the suggested relabel (`flipped` = the other centroid actually
    * scores higher).
    *
    * Scale shape: one hash aggregate for the centroids (model-sized
    * collect: |labels| × dim doubles), one label-cardinality broadcast
    * cross (|labels| centroid rows × corpus — the q_naive_bayes spine
    * class), label-partitioned bottom-k windows.
    *
    * Returns (label, rank ≤ kWorst, vec_id, self_sim, best_other_label,
    * best_other_sim, flipped). */
  def labelNoise(corpus: DataFrame, idCol: String, embCol: String,
      labelCol: String, kWorst: Int = 3): DataFrame = {
    require(kWorst >= 1, s"kWorst must be ≥1, got $kWorst")
    reg(corpus)
    val spark = corpus.sparkSession
    import spark.implicits._
    val em = corpus.filter(col(embCol).isNotNull && size(col(embCol)) > 0 &&
        col(labelCol).isNotNull)
      .select(col(idCol).as("id"), col(labelCol).cast("long").as("label"),
        col(embCol).as("e"))
    val cents: Seq[(Long, Seq[Double])] = em
      .withColumn("ed", expr("transform(e, x -> cast(x as double))"))
      .groupBy("label")
      .agg(graft.functions.VecSumDecAgg.fn(col("ed")).as("s"),
        count(lit(1)).as("cnt"))
      .collect()
      .map { r =>
        val cnt = r.getAs[Long]("cnt")
        r.getAs[Long]("label") ->
          r.getSeq[Long](1).map(v => graft.functions.VecSumDecAgg.mean6(v, cnt))
      }.toSeq
    val centDf = cents.toDF("clabel", "c")
    val scored = em.crossJoin(broadcast(centDf))
      .select(col("id"), col("label"), col("clabel"),
        round(cosine(col("e"), col("c")), 4).as("sim"))
    val ow = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(desc("sim"), asc("clabel"))
    val own = scored.filter(col("label") === col("clabel"))
      .select(col("id"), col("label"), col("sim").as("self_sim"))
    val other = scored.filter(col("label") =!= col("clabel"))
      .withColumn("r", row_number().over(ow))
      .filter(col("r") === 1)
      .select(col("id"), col("clabel").as("best_other_label"),
        col("sim").as("best_other_sim"))
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy("label").orderBy(asc("self_sim"), asc("id"))
    own.join(other, "id")
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter(col("rank") <= kWorst)
      .select(col("label"), col("rank"), col("id").as("vec_id"),
        col("self_sim"), col("best_other_label"), col("best_other_sim"),
        (col("best_other_sim") > col("self_sim")).as("flipped"))
  }

  /** GREEDY k-CENTER CORESET selection (farthest-point traversal —
    * Gonzalez 1985; the geometric heart of data-pruning selections
    * like Sener & Savarese 2018's core-set active learning): seed with
    * the smallest id, then repeatedly add the vector LEAST similar to
    * everything already selected — argmin over unselected of
    * max_{s∈selected} cos(v, s), ties to the smaller id. The selected
    * set is a diversity-maximal sketch of the embedding space; the
    * per-step `far_sim` values (each pick's similarity to the prior
    * set, non-decreasing) are the coverage-radius curve a pruning run
    * reads to choose its budget.
    *
    * Each step is ONE distributed corpus pass (the selected set rides
    * along as ≤ k literal vectors — model-sized, the fitIvf pattern)
    * ending in a 1-row argmin collect (k-bounded, the
    * pageRankConverged class); k passes total, exactly what greedy
    * k-center costs at any scale. Returns (rank 1..k, vec_id,
    * far_sim — null for the seed). */
  def kcenterCoreset(corpus: DataFrame, idCol: String, embCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 1, s"k must be ≥1, got $k")
    reg(corpus)
    val spark = corpus.sparkSession
    import spark.implicits._
    val em = corpus.filter(col(embCol).isNotNull && size(col(embCol)) > 0)
      .select(col(idCol).as("id"), col(embCol).as("e"))
    val seed = em.orderBy(asc("id")).limit(1).collect().head
    var selected = Vector[(Long, Seq[Float], Option[Double])](
      (seed.getLong(0), seed.getSeq[Float](1), None))
    for (_ <- 2 to k) {
      val simCols = selected.map { case (_, se, _) =>
        round(cosine(col("e"), typedLit(se)), 4)
      }
      val maxSim = if (simCols.size == 1) simCols.head else greatest(simCols: _*)
      val next = em.filter(!col("id").isin(selected.map(_._1): _*))
        .select(col("id"), col("e"), maxSim.as("ms"))
        .orderBy(asc("ms"), asc("id")).limit(1)
        .collect().head
      selected :+= ((next.getLong(0), next.getSeq[Float](1),
        Some(next.getDouble(2))))
    }
    selected.zipWithIndex
      .map { case ((i, _, ms), ix) => (ix + 1L, i, ms) }
      .toDF("rank", "vec_id", "far_sim")
  }

  /** MAXIMAL MARGINAL RELEVANCE rerank (Carbonell & Goldstein,
    * SIGIR'98 — the diversity reranker RAG stacks run on a retrieved
    * page): greedily select `k` of the probe's cosine top-`kCand`
    * shortlist, each step taking the argmax of
    * `λ·sim(q, d) − μ·max_{s∈selected} sim(d, s)` — relevance traded
    * against redundancy with what is already selected. λ and μ are
    * SEPARATE literals (never μ = 1−λ, whose float value is
    * 0.30000000000000004) so the score chain is bit-reproducible in
    * the DuckDB replay ([[graft.operators.MmrOracleSql]]).
    *
    * The corpus-sized work (exact top-`kCand` retrieval, pair cosines
    * among the shortlist) runs distributed and EAGERLY; the greedy
    * election then folds over the collected shortlist — kCand + kCand²
    * rows, k-bounded and corpus-size-INDEPENDENT (the rerank page IS
    * the model: MMR reranks a retrieved page, never the corpus — the
    * fitIvf/bpeLearn collect-exemption class). Ties pin to the
    * smaller id at every step.
    *
    * Returns (rank 1..k, doc_id, rel_sim, mmr_score floor-6dp); the
    * per-step scores are provably non-increasing (the penalty is
    * monotone in the growing selected set). */
  def mmrRerank(corpus: DataFrame, idCol: String, embCol: String,
      probeId: Long, kCand: Int = 20, k: Int = 8,
      lambda: Double = 0.7, mu: Double = 0.3): DataFrame = {
    require(k >= 1 && kCand >= k, s"need kCand ≥ k ≥ 1, got kCand=$kCand k=$k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val shortlist = cosineTopK(corpus, idCol, embCol, probeId, kCand)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("sim")))
    val ids = shortlist.map(_._1)
    val ce = corpus.filter(col(embCol).isNotNull && size(col(embCol)) > 0)
      .select(col(idCol).as("id"), col(embCol).as("e"))
      .filter(col("id").isin(ids: _*))
    val pairSim = ce.as("a").join(ce.as("b"), col("a.id") =!= col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        round(cosine(col("a.e"), col("b.e")), 4).as("s"))
      .collect()
      .map(r => ((r.getAs[Long]("ia"), r.getAs[Long]("ib")), r.getAs[Double]("s")))
      .toMap
    var picked = Vector.empty[Long]
    val simq = shortlist.toMap
    val out = Vector.newBuilder[(Long, Long, Double, Double)]
    for (step <- 1 to math.min(k, shortlist.length)) {
      val (pick, scv) =
        if (picked.isEmpty) {
          val (i, s) = shortlist.head // already (sim desc, id asc) ordered
          (i, lambda * s)
        } else {
          shortlist.filterNot(c => picked.contains(c._1))
            .map { case (i, s) =>
              (i, lambda * s - mu * picked.map(j => pairSim((i, j))).max)
            }
            .sortBy { case (i, sc) => (-sc, i) }.head
        }
      picked :+= pick
      out += ((step.toLong, pick, simq(pick), math.floor(scv * 1e6) / 1e6))
    }
    out.result().toDF("rank", "doc_id", "rel_sim", "mmr_score")
  }

  /** MATRYOSHKA truncation evaluation (Kusupati et al. 2022, MRL —
    * "Matryoshka Representation Learning"): how much retrieval quality
    * survives keeping only the first `d` of the embedding's dimensions?
    * For each probe, the exact full-dim cosine top-`k` is the gold set;
    * each truncated dim re-ranks by prefix-`d` cosine and reports
    * overlap@k — the table read before committing to a cheaper index
    * width (a 4× dim cut is a 4× scan/memory cut at 100 TB if recall
    * holds). Truncated-rank rows LEFT-join the gold membership so a
    * zero-overlap (probe, dim) still reports 0, not absence.
    *
    * Scale shape: one probe-set-cardinality broadcast cross (|probes|
    * rows × corpus — the cosineTopK class), all sims computed in the
    * same pass; windows partition by (probe, dim) over shortlists.
    *
    * Returns (probe_id, dim, n_overlap, recall = overlap/k, 4dp). */
  def matryoshkaEval(corpus: DataFrame, idCol: String, embCol: String,
      probeIds: Seq[Long], dims: Seq[Int], k: Int = 10): DataFrame = {
    require(probeIds.nonEmpty && dims.nonEmpty && k >= 1)
    reg(corpus)
    val em = corpus.filter(col(embCol).isNotNull && size(col(embCol)) > 0)
      .select(col(idCol).as("id"), col(embCol).as("e"))
    val probes = em.filter(col("id").isin(probeIds: _*))
      .select(col("id").as("pid"), col("e").as("pe"))
    val scored = em.crossJoin(broadcast(probes))
      .filter(col("id") =!= col("pid"))
      .select(col("pid"), col("id"),
        round(cosine(col("e"), col("pe")), 4).as("sim_full"),
        explode(array(dims.map(d => struct(lit(d).as("dim"),
          round(cosine(slice(col("e"), 1, d), slice(col("pe"), 1, d)), 4)
            .as("sim_d"))): _*)).as("t"))
      .select(col("pid"), col("id"), col("sim_full"),
        col("t.dim").as("dim"), col("t.sim_d").as("sim_d"))
    val gw = org.apache.spark.sql.expressions.Window
      .partitionBy("pid", "dim").orderBy(desc("sim_full"), asc("id"))
    val tw = org.apache.spark.sql.expressions.Window
      .partitionBy("pid", "dim").orderBy(desc("sim_d"), asc("id"))
    val ranked = scored
      .withColumn("grank", row_number().over(gw))
      .withColumn("trank", row_number().over(tw))
    val gold = ranked.filter(col("grank") <= k)
      .select(col("pid"), col("dim"), col("id"), lit(1L).as("hit"))
    ranked.filter(col("trank") <= k)
      .select(col("pid"), col("dim"), col("id"))
      .join(gold, Seq("pid", "dim", "id"), "left")
      .groupBy(col("pid").as("probe_id"), col("dim"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
      .select(col("probe_id"), col("dim").cast("bigint").as("dim"),
        col("n_overlap"),
        round(col("n_overlap").cast("double") / k, 4).as("recall"))
  }

  /** Scalar quantization of an embedding column: per-vector min/max
    * range mapped to integer codes in [0, levels−1] — the int8 (levels
    * = 256) storage-compression step a 100 TB embedding pipeline runs
    * before indexing (4× smaller than float32, 8× than float64).
    * Adds `qmin` / `qscale` (the per-vector dequantization params),
    * `codes` (array<long>), and `max_abs_err` (the worst per-element
    * reconstruction error, ≤ qscale/2 by construction). A constant
    * vector (qscale = 0) codes to all-zeros with zero error.
    *
    * Pure map-side per-row math, no shuffle. `codes` and `max_abs_err`
    * are INDEPENDENT lambda transforms (the error recomputes the code
    * inline) so no computed HOF column is referenced twice in one
    * projection (CLAUDE.md invariant 5); the scalar min/max/scale
    * columns that CollapseProject inlines into them are plain
    * array scans — bounded ×refs, not a HOF chain. Every step (cast
    * float→double, subtract, divide, HALF-UP round of a non-negative
    * value, multiply, abs, min/max over identical elements) is
    * bit-reproducible on any IEEE engine, so quantized CODES — not just
    * stats — can be compared across engines exactly. */
  def quantize(df: DataFrame, vecCol: String, levels: Int = 256): DataFrame = {
    require(levels >= 2, s"levels must be ≥2, got $levels")
    // an ELEMENT-level NULL would diverge cross-engine (Spark's
    // aggregate fold poisons to NULL, DuckDB's list_sum skips, and
    // array_min/max skip → codes with null holes instead of a loud
    // NULL) — normalize such vectors to the whole-vector-NULL
    // convention up front: every output column goes NULL together.
    // `exists` is a plain array scan — bounded ×refs under
    // CollapseProject, like the min/max scans below.
    val raw = col(vecCol).cast("array<double>")
    val v = when(!exists(raw, e => e.isNull), raw)
    val mn = array_min(v)
    val sc = (array_max(v) - mn) / (levels - 1)
    // when/when WITHOUT otherwise: a NULL vector (sc null) yields NULL
    // codes/err consistently, never a fabricated 0
    df.withColumn("qmin", mn)
      .withColumn("qscale", sc)
      .withColumn("codes",
        when(sc > 0, transform(v, e => round((e - mn) / sc).cast("long")))
          .when(sc === 0, transform(v, _ => lit(0L))))
      .withColumn("max_abs_err",
        when(sc > 0,
          array_max(transform(v, e => abs(e - (mn + round((e - mn) / sc) * sc)))))
          .when(sc === 0, lit(0.0)))
  }

  /** L2 nearest-codeword assignment against a SMALL literal codebook:
    * per-row distances via one zip_with/aggregate HOF per codeword,
    * argmin with first-occurrence (= smallest index) tie break. The
    * distance array is referenced twice (position + min) — a bounded
    * ×2 of k×dsub scalar ops, the same documented trade the quantize
    * min/max scans make, not an unbounded HOF-chain re-evaluation. */
  private def l2Code(sub: Column, codebook: Seq[Seq[Double]]): Column = {
    val dists = transform(typedLit(codebook), c =>
      aggregate(zip_with(sub, c, (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, t) => a + t))
    struct((array_position(dists, array_min(dists)) - 1).cast("int").as("code"),
      array_min(dists).as("err"))
  }

  /** Fit a PRODUCT-QUANTIZATION codebook (Jégou et al., "Product
    * quantization for nearest neighbor search", TPAMI 2011): the vector
    * splits into `m` contiguous subvectors of dim/m, and each subspace
    * fits its own k-codeword L2 quantizer (hash-seeded + Lloyd rounds,
    * the [[fitIvf]] recipe with L2 assignment) — m·log2(k) bits per
    * vector, 8× smaller than int8 scalar codes at m=8/k=256-free
    * configs, and the codebook is the MODEL (m × k × dim/m doubles).
    * Fit on a deterministic sample at 100 TB, apply to the corpus —
    * the same split every graft fit uses. Deterministic: seeds are
    * hash-ordered, means round 6dp, assignment ties take the smallest
    * codeword index. */
  def pqFit(corpus: DataFrame, idCol: String, embCol: String,
      m: Int = 8, k: Int = 16, dim: Int = 64, iterations: Int = 1): Seq[Seq[Seq[Double]]] = {
    require(dim % m == 0, s"m must divide dim, got m=$m dim=$dim")
    val dsub = dim / m
    val em = corpus.filter(col(embCol).isNotNull && size(col(embCol)) === dim)
      .select(col(idCol).as("id"), col(embCol).cast("array<double>").as("e"))
    // one hash-ordered seed collect serves every subspace (k rows)
    val seedRows: Seq[Seq[Double]] = em
      .orderBy(xxhash64(col("id")), col("id")).limit(k)
      .select(col("e")).collect().map(_.getSeq[Double](0).toSeq).toSeq
    var books: Seq[Seq[Seq[Double]]] =
      (0 until m).map(s => seedRows.map(_.slice(s * dsub, s * dsub + dsub)))
    // ALL m subspace Lloyd updates ride ONE job per round: each row fans
    // out to its m (subspace, code, subvector) assignments via
    // posexplode (a bounded ×m of dsub-arrays = exactly the original
    // row's doubles re-sliced, never a corpus-scale blowup), then a
    // single (s, cid)-keyed aggregation computes every codebook's sums.
    // The per-subspace form ran m sequential Spark jobs per round —
    // identical arithmetic, m× the scheduling/scan latency.
    var it = 0
    while (it < iterations) {
      val bks = books
      val sums = em
        .select(posexplode(array((0 until m).map { s =>
          val sub = slice(col("e"), s * dsub + 1, dsub)
          struct(l2Code(sub, bks(s)).getField("code").as("cid"), sub.as("sd"))
        }: _*)).as(Seq("s", "r")))
        .groupBy(col("s"), col("r.cid").as("cid"))
        .agg(graft.functions.VecSumDecAgg.fn(col("r.sd")).as("sum"), count(lit(1)).as("cnt"))
        .collect()
        .map(r => (r.getAs[Int]("s"), r.getAs[Int]("cid")) ->
          (r.getSeq[Long](2), r.getAs[Long]("cnt"))).toMap
      books = (0 until m).map { s =>
        books(s).indices.map { ci =>
          sums.get((s, ci)) match {
            case Some((v, cnt)) =>
              // DECIMAL-exact mean — see fitIvf; makes the codebook
              // VALUE partition-order-invariant (SQL-replayable)
              v.map(x => graft.functions.VecSumDecAgg.mean6(x, cnt))
            case None => books(s)(ci)
          }
        }
      }
      it += 1
    }
    books
  }

  /** Apply a [[pqFit]] codebook: per vector, the m nearest-codeword
    * indices and the total squared reconstruction error. Pure map-side
    * math against the literal codebook — no shuffle, no join; the
    * codes column is the 100 TB storage form (m small ints per vector).
    * Returns (everything in `corpus`, `codes` array<int>, `pq_sqerr`
    * double). Vectors that are NULL or of the wrong dimension get NULL
    * codes/err (the quantize whole-vector-NULL convention). */
  def pqEncode(corpus: DataFrame, embCol: String,
      codebooks: Seq[Seq[Seq[Double]]], dim: Int = 64): DataFrame = {
    require(codebooks.nonEmpty, "empty codebook")
    val m = codebooks.size
    require(dim % m == 0, s"codebook count $m must divide dim $dim")
    require(m * codebooks.head.head.size == dim,
      s"codebook geometry ${m}×${codebooks.head.head.size} does not cover dim $dim")
    reg(corpus)
    // ONE native m×k×dsub argmin loop per row (graft_pq_encode) — this
    // runs over the FULL corpus (the standing-index build), so per-row
    // cost here IS the 100 TB encode cost; the HOF spelling it replaces
    // paid a lambda frame per element. NULL / wrong-dim / NULL-element
    // vectors → NULL struct, so codes and pq_sqerr null TOGETHER (the
    // quantize whole-vector-NULL convention). The struct is referenced
    // twice in the projection (codes + err) — the documented bounded ×2
    // trade, matching the min/max scans in quantize.
    val pq = call_function("graft_pq_encode",
      col(embCol).cast("array<double>"), typedLit(codebooks))
    corpus
      .withColumn("codes", pq.getField("codes"))
      .withColumn("pq_sqerr", pq.getField("err"))
  }

  /** Exact cosine near-dup pairs ≥ threshold. Quadratic — the
    * correctness baseline; use [[annTopK]]'s bucket index at scale.
    * Norms are precomputed per vector. */
  def nearDupPairs(corpus: DataFrame, idCol: String, embCol: String,
      threshold: Double): DataFrame = {
    reg(corpus)
    val em = corpus.select(col(idCol).as("id"), col(embCol).as("e"),
      norm(col(embCol)).as("nrm"))
    // the theta-join streams side a against a broadcast b: a's partition
    // count IS the task count for the whole n² scoring loop, and the
    // single-row-group fixture scan serializes it (guide §2.5) — spread
    // the streamed side (no-op when the scan is already parallel)
    val a = graft.Par.spread(
      em.select(col("id").as("id_a"), col("e").as("ea"), col("nrm").as("na")),
      col("id_a"))
    val b = em.select(col("id").as("id_b"), col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_sim", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }

  /** Leave-one-out k-NN label evaluation over a labeled embedding
    * corpus: every vector is classified by the majority label of its k
    * cosine-nearest OTHER vectors, and the result is reported as the
    * (label, predicted, n_vecs) confusion matrix — "are these
    * embeddings good enough to separate the classes?", the standard
    * embedding-quality probe before committing to an index or a
    * classifier head.
    *
    * EXACT all-pairs baseline — quadratic, the [[nearDupPairs]]
    * correctness class over fixed-small corpora; at scale the neighbor
    * lists come from [[annJoin]] and the vote is the same two windows.
    * Determinism / cross-engine exactness: similarities are rounded to
    * 4dp BEFORE ranking (the q_embed_neardup parity surface), neighbor
    * ties break by id ascending, vote ties by (count desc, label asc) —
    * every comparison is on exactly-agreed values, so the matrix is
    * engine-exact. Null labels/vectors are excluded. */
  def knnLooConfusion(corpus: DataFrame, idCol: String, embCol: String,
      labelCol: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be ≥1, got $k")
    reg(corpus)
    val em = corpus
      .filter(col(idCol).isNotNull && col(embCol).isNotNull &&
        col(labelCol).isNotNull)
      .select(col(idCol).as("id"), col(embCol).as("e"),
        col(labelCol).as("lab"), norm(col(embCol)).as("nrm"))
    // spread the streamed side of the all-pairs theta-join: the n²
    // scoring loop's task count is a's partition count (guide §2.5)
    val a = graft.Par.spread(
      em.select(col("id").as("ia"), col("e").as("ea"),
        col("lab").as("la"), col("nrm").as("na")),
      col("ia"))
    val b = em.select(col("id").as("ib"), col("e").as("eb"),
      col("lab").as("lb"), col("nrm").as("nb"))
    val top = a.join(b, col("ia") =!= col("ib"))
      .select(col("ia"), col("la"), col("ib"), col("lb"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 4).as("sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("ia").orderBy(col("sim").desc, col("ib").asc)))
      .filter(col("rn") <= k)
    majorityConfusion(top)
  }

  /** The shared majority-vote → confusion reduction: `nbrs` carries one
    * row per (probe, retained neighbor) with columns `ia` (probe id),
    * `la` (probe label), `lb` (neighbor label). Vote ties break
    * (count desc, label asc); probes with no rows are absent. */
  private def majorityConfusion(nbrs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    nbrs.groupBy("ia", "la", "lb").agg(count(lit(1)).as("c"))
      .withColumn("vr", row_number().over(
        Window.partitionBy("ia").orderBy(col("c").desc, col("lb").asc)))
      .filter(col("vr") === 1)
      .groupBy(col("la").as("label"), col("lb").as("predicted"))
      .agg(count(lit(1)).as("n_vecs"))
  }

  /** The SCALE form of [[knnLooConfusion]]: identical majority-vote and
    * confusion reduction, but the neighbor lists come from
    * [[annJoinAuto]]'s bucketed LSH index instead of the quadratic
    * exact pair frame — candidate generation is band equi-joins with
    * the occupancy-derived parameters and hot-bucket cap, so the whole
    * evaluation is bucketed at any corpus size. Approximate ONLY in
    * which neighbors are found (candidates are exact-cosine re-ranked);
    * probes whose every bucket missed drop out of the matrix (recall is
    * the property-tested contract, matching the rest of the ANN
    * family). */
  def knnAnnConfusion(corpus: DataFrame, idCol: String, embCol: String,
      labelCol: String, k: Int = 5, dim: Int = 64): DataFrame = {
    require(k >= 1, s"k must be ≥1, got $k")
    val base = corpus.filter(col(idCol).isNotNull && col(embCol).isNotNull &&
      col(labelCol).isNotNull)
    val lab = base.select(col(idCol).as("__nid"), col(labelCol).as("__nlab"))
    val nn = annJoinAuto(base, idCol, embCol, k = k, dim = dim)
    val nbrs = nn
      .join(lab.select(col("__nid").as("id"), col("__nlab").as("la")), "id")
      .join(lab.select(col("__nid").as("neighbor_id"), col("__nlab").as("lb")),
        "neighbor_id")
      .select(col("id").as("ia"), col("la"), col("lb"))
    majorityConfusion(nbrs)
  }

  /** Deterministic ±1 random-hyperplane matrix (nPlanes × dim) — same
    * bit-identical formula as the native `graft_hyperplane_keys`
    * expression ([[graft.functions.VectorExprs.planeSign]]), so the
    * DataFrame and native paths index the same buckets. */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map(d => graft.functions.VectorExprs.planeSign(p, d))
    }

  /** Approximate cosine top-k via random-hyperplane LSH with multi-probe:
    * corpus indexed under `bands` sign-bit band keys; the probe also
    * queries every band key at Hamming distance 1; candidates are
    * re-ranked with exact cosine. Index cost: `bands` rows/vector. */
  def annTopK(corpus: DataFrame, idCol: String, embCol: String,
      probeId: Long, k: Int = 10, nPlanes: Int = 16, bands: Int = 4,
      dim: Int = 64): DataFrame = {
    reg(corpus)
    require(nPlanes % bands == 0, "bands must divide nPlanes")
    val w = nPlanes / bands
    val sigd = corpus
      .withColumn("planes", typedLit(hyperplanes(nPlanes, dim)))
      .withColumn("sig", expr(
        s"transform(planes, pl -> CASE WHEN vec_dot($embCol, pl) >= 0 THEN 1 ELSE 0 END)"))
    def key(bitExprs: Seq[String]): String =
      s"concat_ws(':', cast(b AS STRING), ${bitExprs.mkString(", ")})"
    val exactBits = (0 until w).map(r => s"cast(sig[b*$w+$r] AS STRING)")
    val corpusIdx = sigd.filter(col(idCol) =!= probeId)
      .select(col(idCol).as("id"), col(embCol).as("e"), col("sig"),
        explode(expr(s"sequence(0, ${bands - 1})")).as("b"))
      .select(col("id"), col("e"), expr(key(exactBits)).as("band"))
    val probeKeys = sigd.filter(col(idCol) === probeId)
      .select(col(embCol).as("pe"), col("sig"),
        explode(expr(s"sequence(0, ${bands - 1})")).as("b"))
      .select(col("pe"), col("sig"), col("b"),
        explode(expr(s"sequence(-1, ${w - 1})")).as("fl"))
      .select(col("pe"), expr(key((0 until w).map(r =>
        s"cast(IF(fl = $r, 1 - sig[b*$w+$r], sig[b*$w+$r]) AS STRING)"))).as("band"))
    corpusIdx
      .join(broadcast(probeKeys), "band")
      .select(col("id"), col("e"), col("pe")).distinct()
      .select(col("id"), round(cosine(col("e"), col("pe")), 4).as("sim"))
      .orderBy(desc("sim"), asc("id"))
      .limit(k)
  }

  /** Approximate top-k neighbors for EVERY vector — the form a 100 TB
    * embedding dedup actually runs (vs [[annTopK]]'s single probe).
    * Every vector is indexed under `bands` sign-bit band keys and, as a
    * probe, additionally under every hamming-1 flip of each key
    * (multi-probe); candidates come from the band-key EQUI-join (work ∝
    * bucket collisions, never all-pairs).
    *
    * The collision stream (one row per probe-key × index-key match,
    * before dedup) is kept to two longs wide: candidates are deduped on
    * (pid, id) with a distinct, then embeddings are joined back for the
    * exact re-rank. Two alternatives were MEASURED slower on the bench
    * corpus and rejected: carrying both embedding arrays through the
    * join (+55% — fat rows in the pre-dedup stream dominate), and a
    * stateless first-colliding-band bit_count filter instead of the
    * distinct (+40% — per-row key-array comparisons across 16M collision
    * rows cost more than the dedup hash aggregate).
    *
    * The signature fold runs once per row (packed BIGINT band keys;
    * probe flips are one XOR each), and each HOF-computed column is
    * referenced exactly once per downstream projection — the
    * CollapseProject re-evaluation trap CLAUDE.md invariant 5 documents.
    *
    * Returns (id, neighbor_id, sim, rank ≤ k), rank ordered by sim desc
    * (4dp) with neighbor-id tiebreak. */
  def annJoin(corpus: DataFrame, idCol: String, embCol: String,
      k: Int = 10, nPlanes: Int = 16, bands: Int = 8,
      dim: Int = 64, multiProbe: Boolean = true,
      maxBucketVecs: Int = 0): DataFrame = {
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(desc("sim"), asc("id"))
    lshScored(corpus, idCol, embCol, nPlanes, bands, dim, multiProbe,
        maxBucketVecs, undirected = false)
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter(col("rank") <= k)
      .select(col("pid").as("id"), col("id").as("neighbor_id"),
        col("sim"), col("rank"))
  }

  /** The shared LSH candidate core behind [[annJoin]], [[annPairs]],
    * and [[hardNegatives]]: packed band keys, optional hot-bucket cap,
    * hamming-1 multi-probe, skinny distinct candidates, exact-cosine
    * scoring — ending at the SCORED frame (pid, id, sim 4dp) with no
    * rank or threshold applied (each consumer's election differs).
    * `undirected = true` keeps pid < id (the pair form — XOR probing is
    * symmetric, so the undirected candidate set is identical while the
    * verify work halves); otherwise pid ≠ id (the join form).
    *
    * Per-band keys pack into ONE BIGINT: high bits = band id, low w
    * bits = sign bits — computed by the NATIVE graft_hyperplane_keys
    * expression (one tight loop per row; a typedLit(planes) +
    * transform + per-plane vec_dot chain generated enormous Java whose
    * janino compile dominated cold runs). Hamming-1 probe variants are
    * a single XOR on the packed key; the HOF-computed probe column is
    * referenced exactly once per projection (CLAUDE.md invariant 5).
    *
    * maxBucketVecs > 0 = the HOT-BUCKET guard (the TextDedup
    * bandBucketCandidates pattern): index-side buckets aggregate under
    * a capped-set buffer (≤ cap + 1 longs per bucket, never the full
    * membership) and buckets past the cap are dropped whole — kept
    * buckets are provably untruncated, so per-bucket candidate fan-out
    * is bounded by cap × probes. A pair is lost only if EVERY band
    * bucket it shares is hot; buckets that hot are mass-duplication
    * that exact dedup upstream owns. Requires long-ish ids (the
    * capped-set aggregate is typed over Long). */
  private def lshScored(corpus: DataFrame, idCol: String, embCol: String,
      nPlanes: Int, bands: Int, dim: Int, multiProbe: Boolean,
      maxBucketVecs: Int, undirected: Boolean): DataFrame = {
    reg(corpus)
    require(nPlanes % bands == 0, "bands must divide nPlanes")
    val w = nPlanes / bands
    // spread the corpus projection BEFORE the key fold: the signature
    // computation, both explode streams, and — when the index side is
    // small enough to broadcast — the entire collision fan-out run at
    // the scan's partition count, which the single-row-group fixture
    // pins to 1 (guide §2.5; no-op on an already-parallel scan)
    // NOT checkpointed (r14 measured it): a localCheckpoint here looks
    // like §2.4 (sigd is referenced four times) but the LogicalRDD it
    // leaves behind carries NO size statistics, so the planner stops
    // BROADCASTING the small band-bucket join sides and the candidate
    // join degrades to sort-merge over the exploded streams —
    // q_ann_join measured 1.6 → 9.1 s with the checkpoint. The repeated
    // signature fold is the cheaper price.
    val sigd = graft.Par
      .spread(corpus.select(col(idCol).as("id"), col(embCol).as("e")), col("id"))
      .withColumn("ks", expr(s"graft_hyperplane_keys(e, $nPlanes, $bands, $dim)"))
    val rawIndexKeys = sigd.select(col("id"), explode(col("ks")).as("band"))
    val indexKeys =
      if (maxBucketVecs <= 0) rawIndexKeys
      else rawIndexKeys
        .select(col("id").cast("long").as("id"), col("band"))
        .groupBy("band")
        .agg(graft.functions.CappedSetAgg.fn(maxBucketVecs + 1)(col("id")).as("ids"))
        .filter(size(col("ids")) <= maxBucketVecs)
        .select(col("band"), explode(col("ids")).as("id"))
    val probeExpr =
      if (multiProbe) expr(
        s"""flatten(transform(ks, k0 ->
              concat(array(k0), transform(sequence(0, ${w - 1}),
                r -> cast(k0 ^ shiftleft(1L, r) AS BIGINT)))))""")
      else col("ks")
    val probeKeys = sigd.select(col("id").as("pid"), explode(probeExpr).as("band"))
    val candFilter =
      if (undirected) col("pid") < col("id") else col("pid") =!= col("id")
    val cand = probeKeys
      .join(indexKeys, "band")
      .filter(candFilter)
      .select("pid", "id").distinct()
    val em = sigd.select(col("id"), col("e"))
    cand
      .join(em.select(col("id").as("pid"), col("e").as("pe")), "pid")
      .join(em, "id")
      .select(col("pid"), col("id"),
        round(cosine(col("e"), col("pe")), 4).as("sim"))
  }

  /** UNDIRECTED ANN pair generation — the clustering form of
    * [[annJoin]]: same band-key index/probe streams and hot-bucket
    * guard, but candidates keep only `pid < id` (hamming-1 probing is
    * symmetric under XOR, so the undirected candidate set is identical
    * while the verify work halves), there is NO per-probe top-k window
    * (one whole shuffle+sort deleted), and every exact-cosine-verified
    * pair ≥ `threshold` is returned rather than each probe's best k —
    * for connected-components clustering, k-truncation only LOSES
    * edges, so this is both faster AND higher-recall than filtering
    * [[annJoin]] output. Returns (id_a, id_b, sim), id_a < id_b,
    * precision 1.0 (edges are exact-verified; only recall is
    * probabilistic). */
  def annPairs(corpus: DataFrame, idCol: String, embCol: String,
      threshold: Double, nPlanes: Int = 16, bands: Int = 8,
      dim: Int = 64, multiProbe: Boolean = true,
      maxBucketVecs: Int = 0): DataFrame =
    lshScored(corpus, idCol, embCol, nPlanes, bands, dim, multiProbe,
        maxBucketVecs, undirected = true)
      .filter(col("sim") >= threshold)
      .select(col("pid").as("id_a"), col("id").as("id_b"), col("sim"))

  /** IVF-cell-blocked UNDIRECTED pair generation against a PRE-FIT
    * centroid model — the RAW-pair-set twin of [[semDedup]]'s candidate
    * space: every vector probes its `nProbe` nearest cells
    * SYMMETRICALLY, a pair is a candidate iff the two vectors share ANY
    * probed cell (the boundary-pair recovery argument [[semDedup]]
    * measures), candidates dedup on (id_a, id_b) while still two longs
    * wide (a pair can meet in up to `nProbe` shared cells — the
    * [[annJoin]] skinny-dedup lesson: dedup BEFORE the embeddings join
    * back), and every surviving pair is exact-cosine verified ≥
    * `threshold` — precision 1.0, recall = the blocking's (the ANN
    * family contract). Returns (id_a, id_b, sim), id_a < id_b.
    *
    * Scale shape: candidate volume is Σ over cells of the probe-set
    * self-join ≈ n · nProbe² · targetCell (cell occupancy is what
    * [[ivfCellsFor]] holds constant), never n²; the fit is the
    * model-sized [[fitIvf]]. This is the pair family's escape from the
    * LSH band-clamp regime — see [[annPairsAuto]]. */
  def ivfPairsWith(corpus: DataFrame, idCol: String, embCol: String,
      threshold: Double, centers: Seq[Seq[Double]], nProbe: Int = 2): DataFrame = {
    require(nProbe >= 1, s"nProbe must be ≥1, got $nProbe")
    reg(corpus)
    // spread (guide §2.5): the probe self-join's map sides and — when a
    // side is broadcast — the in-cell pair fan-out run at the scan's
    // partition count (1 on the single-row-group fixture).
    // NOT checkpointed despite the 4 references (r14): a localCheckpoint
    // strips size statistics, and the planner then stops broadcasting
    // the small sides of the probe/pair joins (the q_ann_join 1.6→9.1 s
    // lesson from lshScored) — the sf1.0 routed pair path runs through
    // here, so the broadcast choice matters more than the re-scans.
    val em = graft.Par.spread(
      corpus.filter(col(embCol).isNotNull && size(col(embCol)) > 0)
        .select(col(idCol).as("id"), col(embCol).as("e")),
      col("id"))
    val cc = typedLit(centers)
    val probes = em.select(col("id"),
      explode(call_function("graft_nearest_centroids", col("e"), cc, lit(nProbe)))
        .as("cell"))
    val cand = probes.as("a").join(probes.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    cand
      .join(em.select(col("id").as("id_a"), col("e").as("ea")), "id_a")
      .join(em.select(col("id").as("id_b"), col("e").as("eb")), "id_b")
      .withColumn("sim", round(cosine(col("ea"), col("eb")), 4))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Fit-and-pair in one call: [[fitIvf]] at the occupancy-derived cell
    * count ([[ivfCellsFor]] — one scalar corpus count, the family's
    * standard derivation), then [[ivfPairsWith]]. At 100 TB fit on a
    * deterministic sample like every graft fit. */
  def ivfPairsAuto(corpus: DataFrame, idCol: String, embCol: String,
      threshold: Double, targetCell: Int = 128, iterations: Int = 1,
      nProbe: Int = 3): DataFrame = {
    val n = corpus.filter(col(embCol).isNotNull && size(col(embCol)) > 0).count()
    val centers = fitIvf(corpus, idCol, embCol, ivfCellsFor(n, targetCell), iterations)
    ivfPairsWith(corpus, idCol, embCol, threshold, centers, nProbe)
  }

  /** [[annPairs]] with the [[annJoinAuto]] occupancy/banding-curve
    * derivation (one scalar corpus count; hard bucket cap at 8× the
    * target occupancy). `simThreshold` is BOTH the edge threshold and
    * the banding-curve operating point — for pair generation they are
    * the same quantity, which is the calibration [[annJoinAuto]]'s
    * separate contract threshold had to be told about.
    *
    * CLAMP ROUTING (r13 — the [[annJoinAuto]] rule, pair-shaped): when
    * the banding curve demands more than `maxBands` tables, LSH cannot
    * meet the recall contract and its dup-heavy bucket depth sends cost
    * superlinear (measured at sf1.0/θ=0.4: demanded 160 bands, 82-185 s
    * at pair recall ~0.35) — so the clamped regime routes to
    * [[ivfPairsAuto]] at the [[semDedup]] candidate-space
    * parameterization widened to symmetric top-3 probing (targetCell=128,
    * one Lloyd round; measured at sf1.0/θ=0.4: recall 0.703 → 0.777 for
    * 8.8 → 15.1 s — the closest the IVF blocking gets to the 0.8 LSH
    * contract inside the ≤30 s class, vs the clamped-LSH 0.346 at
    * 82-185 s). The oracle replays the same decision from the
    * same corpus count, so routed queries stay hash-matched at every
    * scale; callers who want the degraded-LSH behavior can raise
    * `maxBands` to pay the banding-curve price explicitly. */
  def annPairsAuto(corpus: DataFrame, idCol: String, embCol: String,
      threshold: Double, dim: Int = 64, targetBucket: Int = 32,
      targetRecall: Double = 0.8, multiProbe: Boolean = true,
      maxBucketVecs: Int = -1, maxBands: Int = 64): DataFrame = {
    val n = corpus.filter(col(embCol).isNotNull && size(col(embCol)) > 0).count()
    val d = deriveBanding(n, targetBucket, threshold, targetRecall, maxBands)
    if (d.clamped)
      ivfPairsAuto(corpus, idCol, embCol, threshold)
    else {
      val cap = if (maxBucketVecs < 0) 8 * targetBucket else maxBucketVecs
      annPairs(corpus, idCol, embCol, threshold, nPlanes = d.w * d.bands,
        bands = d.bands, dim = dim, multiProbe = multiProbe, maxBucketVecs = cap)
    }
  }

  /** Occupancy-derived sign bits per band: with n indexed vectors and
    * w sign bits, expected bucket occupancy under a balanced hash is
    * n / 2^w — so w = ceil(log2(n / targetBucket)) holds occupancy near
    * `targetBucket` at ANY corpus size (the fix for occupancy-blind
    * fixed parameters, which degrade toward quadratic candidate
    * generation as n grows past 2^w × bucket). Clamped to
    * [minW, maxW]. */
  def planesPerBand(n: Long, targetBucket: Int = 32,
      minW: Int = 2, maxW: Int = 16): Int = {
    require(targetBucket > 0 && minW >= 1 && maxW >= minW)
    val raw = math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket))
      / math.log(2.0)).toInt
    math.min(maxW, math.max(minW, raw))
  }

  /** Banding-curve band count: per-band collision probability of a pair
    * at cosine `simThreshold` under random hyperplanes is
    * p = (1 − acos(sim)/π)^w, so `bands` independent bands catch it
    * with probability 1 − (1 − p)^bands ≥ targetRecall when
    * bands = ceil(ln(1 − targetRecall) / ln(1 − p)) — the OTHER half of
    * the occupancy trade: raising w to keep buckets small LOWERS
    * per-band recall, and the principled response is more bands (more
    * hash tables — the published LSH cost of recall at scale), never
    * fatter buckets. Multi-probe pushes effective recall above this
    * floor, so the derived count is conservative. Clamped to
    * [1, maxBands]. */
  def bandsForRecall(w: Int, simThreshold: Double = 0.5,
      targetRecall: Double = 0.8, maxBands: Int = 64): Int = {
    require(simThreshold > 0 && simThreshold < 1 && targetRecall > 0 && targetRecall < 1)
    val pBit = 1.0 - math.acos(simThreshold) / math.Pi
    val p = math.pow(pBit, w)
    // denominator spelled log(1 − p), NOT log1p(−p): the DuckDB oracle
    // replays ln(1.0 − p) (no log1p there), and after the ceil an
    // ulp-level spelling difference near an integer boundary could flip
    // the band count — and, worse, the CLAMP ROUTING flag. Pinning both
    // sides to the identical float chain makes the derivation
    // bit-reproducible cross-engine. (The numerator stays log1p: the
    // oracle emits Java's math.log1p(−targetRecall) as a literal.)
    val b = math.ceil(math.log1p(-targetRecall) / math.log(1.0 - p)).toInt
    math.min(maxBands, math.max(1, b))
  }

  /** The full banding derivation as a VALUE — what [[annJoinAuto]] /
    * [[annPairsAuto]] decide from one corpus count, including what the
    * `maxBands` clamp costs. `demandedBands` is the UNCLAMPED
    * banding-curve requirement; `clamped` means the curve demands more
    * tables than the budget allows, i.e. LSH at this (w, threshold)
    * operating point CANNOT meet `targetRecall` — the regime the r11
    * sf1.0 stress run hit (20k vectors, θ=0.4: demanded 160 vs
    * maxBands 64). `predictedRecall` = 1 − (1−p)^bands at the CLAMPED
    * band count — the analytic contract actually shipped (the curve is
    * conservative on uniform fixtures, so measured recall sits above
    * it; the point is that in the clamped regime even the optimistic
    * analytic bound falls below target, which is why [[annJoinAuto]]
    * routes to the IVF family there). */
  final case class BandingDerivation(n: Long, w: Int, demandedBands: Int,
      bands: Int, clamped: Boolean, predictedRecall: Double)

  /** Derive (w, bands) from one corpus count — [[planesPerBand]] +
    * the [[bandsForRecall]] curve — returning the whole
    * [[BandingDerivation]] so callers can see whether the `maxBands`
    * clamp bound and what recall the clamped configuration predicts. */
  def deriveBanding(n: Long, targetBucket: Int = 32,
      simThreshold: Double = 0.5, targetRecall: Double = 0.8,
      maxBands: Int = 64): BandingDerivation = {
    require(simThreshold > 0 && simThreshold < 1 && targetRecall > 0 && targetRecall < 1)
    val w = planesPerBand(n, targetBucket)
    val pBit = 1.0 - math.acos(simThreshold) / math.Pi
    val p = math.pow(pBit, w)
    // log(1 − p) to match the oracle's ln(1.0 − p) exactly — see
    // [[bandsForRecall]]; an ulp flip here would diverge the ROUTING
    // flag, not just one band
    val demanded =
      math.max(1, math.ceil(math.log1p(-targetRecall) / math.log(1.0 - p)).toInt)
    val bands = math.min(maxBands, demanded)
    BandingDerivation(n, w, demanded, bands, demanded > maxBands,
      1.0 - math.pow(1.0 - p, bands))
  }

  /** OCCUPANCY-AWARE [[annJoin]] — the scale entry point: one scalar
    * count of the corpus (a 1-row stat read, like every graft model
    * fit) derives sign-bits-per-band from the target bucket occupancy
    * ([[planesPerBand]]) and the band count from the banding curve at
    * (`simThreshold`, `targetRecall`) ([[bandsForRecall]]), so candidate
    * volume stays ≈ n × bands × targetBucket and recall stays on
    * contract at ANY corpus size — at fixture scale (n ≈ 500,
    * targetBucket 32, sim 0.5, recall 0.8) this reproduces exactly the
    * measured 32-plane/8-band configuration, and at 10× the corpus it
    * moves to finer buckets + more bands instead of letting each bucket
    * grow 10× (candidate fan-out ∝ occupancy per probe, so fixed params
    * degrade toward quadratic). `maxBucketVecs` defaults to 8× the
    * target occupancy as a hard guard against skewed (non-uniform)
    * bucket distributions — kept buckets are provably untruncated. */
  def annJoinAuto(corpus: DataFrame, idCol: String, embCol: String,
      k: Int = 10, dim: Int = 64, targetBucket: Int = 32,
      simThreshold: Double = 0.5, targetRecall: Double = 0.8,
      multiProbe: Boolean = true, maxBucketVecs: Int = -1,
      maxBands: Int = 64): DataFrame = {
    val n = corpus.filter(col(embCol).isNotNull && size(col(embCol)) > 0).count()
    val d = deriveBanding(n, targetBucket, simThreshold, targetRecall, maxBands)
    // CLAMP ROUTING (the r11 sf1.0 lesson): when the banding curve
    // demands more bands than the budget, LSH can no longer meet the
    // recall contract — it silently trades recall away while its
    // dup-heavy bucket depth ALSO sends cost superlinear (measured:
    // 185 s at 20k vectors/θ=0.4 for an unverified recall, vs 24.6 s
    // at measured ≥0.69 recall on the IVF path over the same corpus).
    // So the clamped regime routes to [[ivfJoinAuto]] at exactly the
    // q_ann_ivf parameterization (nProbe=4, targetCell=128, one Lloyd
    // round) — the oracle replays the same decision from the same
    // corpus count, so the routed query stays hash-matched at every
    // scale. Callers who want the degraded-LSH behavior anyway can
    // raise `maxBands` to pay the banding-curve price explicitly.
    if (d.clamped)
      ivfJoinAuto(corpus, idCol, embCol, k)
    else {
      val cap = if (maxBucketVecs < 0) 8 * targetBucket else maxBucketVecs
      annJoin(corpus, idCol, embCol, k, nPlanes = d.w * d.bands, bands = d.bands,
        dim = dim, multiProbe = multiProbe, maxBucketVecs = cap)
    }
  }

  /** Margin-based BITEXT MINING (Artetxe & Schwenk, "Margin-based
    * Parallel Corpus Mining with Multilingual Sentence Embeddings",
    * ACL 2019 — the LASER/CCMatrix miner): given two embedding sides A
    * (source) and B (target), score every candidate pair with the
    * RATIO margin  cos(x,y) / ((mₖ(x) + mₖ(y)) / 2)  where mₖ(x) is the
    * mean of x's k best cosines into the OTHER side — the normalization
    * that kills cosine's hubness problem (a generically-central vector
    * scores high against everything; dividing by its own neighborhood
    * average cancels that) — and keep, per source vector, the
    * argmax-margin target iff its margin clears `threshold` (forward
    * mining; ties → smallest target id).
    *
    * `candidates` carries the pair pool: (a_id, b_id, both embeddings).
    * The EXACT baseline passes the full A×B cross (the q_knn_eval
    * quadratic-evidence class); the scale path passes an IVF-cell
    * blocked pool ([[bitextMineBlocked]]) — the kNN means are then
    * computed over the same pool, which is the standard blocked-mining
    * approximation (the pool IS the retrieval universe).
    *
    * Determinism/cross-engine: cosines are sequential vec_dot folds;
    * each mₖ is the k-column pivot sum (coalesce(cᵢ, 0), left-assoc +,
    * divide by the constant k) in (cos DESC, id ASC) rank order, so
    * every float is bit-reproducible and the margin ranking replays in
    * SQL. Returns (a_id, b_id, cos_sim 4dp, margin 4dp). */
  def bitextMineFrom(candidates: DataFrame, k: Int = 4,
      threshold: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    val pr = candidates.select(col("a_id"), col("b_id"),
      (dot(col("ea"), col("eb")) / (norm(col("ea")) * norm(col("eb")))).as("c"))
      .transform(Ckpt.apply) // the pair frame feeds 3 consumers (2 windows + the margin join); Ckpt registers the pinned block for bench hygiene
    def sideMean(part: String, tie: String, out: String): DataFrame = {
      val rn = row_number().over(
        Window.partitionBy(part).orderBy(col("c").desc, col(tie).asc))
      val ranked = pr.withColumn("rn", rn).filter(col("rn") <= k)
      // pinned left-associative k-term sum of the rank-ordered cosines
      val terms = (1 to k).map(i => coalesce(max(when(col("rn") === i, col("c"))), lit(0.0)))
      ranked.groupBy(part).agg((terms.reduceLeft(_ + _) / k).as(out))
    }
    val ma = sideMean("a_id", "b_id", "m_a")
    val mb = sideMean("b_id", "a_id", "m_b")
    val mg = pr.join(ma, "a_id").join(mb, "b_id")
      .withColumn("margin", col("c") / ((col("m_a") + col("m_b")) / 2))
    val best = row_number().over(
      Window.partitionBy("a_id").orderBy(col("margin").desc, col("b_id").asc))
    mg.withColumn("brn", best)
      .filter(col("brn") === 1 && col("margin") >= threshold)
      .select(col("a_id"), col("b_id"),
        (floor(col("c") * 10000) / 10000.0).as("cos_sim"),
        (floor(col("margin") * 10000) / 10000.0).as("margin"))
  }

  /** EXACT bitext mining over the full A×B cross — the correctness
    * baseline (quadratic; the [[knnLooConfusion]] evidence class). */
  def bitextMine(a: DataFrame, b: DataFrame, idCol: String, embCol: String,
      k: Int = 4, threshold: Double = 1.0): DataFrame = {
    reg(a)
    // spread the streamed cross side: the |A|·|B| cosine loop's task
    // count is av's partition count (guide §2.5)
    val av = graft.Par.spread(
      a.filter(col(embCol).isNotNull && size(col(embCol)) > 0)
        .select(col(idCol).as("a_id"), col(embCol).as("ea")),
      col("a_id"))
    val bv = b.filter(col(embCol).isNotNull && size(col(embCol)) > 0)
      .select(col(idCol).as("b_id"), col(embCol).as("eb"))
    bitextMineFrom(av.crossJoin(bv), k, threshold)
  }

  /** IVF-cell BLOCKED bitext mining — the scale path: fit the coarse
    * quantizer on A∪B (occupancy-derived cells, [[ivfCellsFor]]), probe
    * each vector's top-`nProbe` cells symmetrically, and mine over the
    * cross-side pairs that share ANY probed cell (distinct, skinny
    * two-long rows through the dedup — the [[ivfPairsWith]] shape).
    * Candidate volume ≈ n · nProbe² · targetCell, never |A|·|B|; the
    * kNN means run over the same blocked pool (the standard
    * blocked-mining approximation). */
  def bitextMineBlocked(corpus: DataFrame, idCol: String, embCol: String,
      sideCol: Column, k: Int = 4, threshold: Double = 1.0,
      targetCell: Int = 128, iterations: Int = 1, nProbe: Int = 3): DataFrame = {
    reg(corpus)
    // spread (guide §2.5): probe streams and candidate fan-out otherwise
    // run at the scan's partition count (1 on the fixture).
    // EAGER checkpoint (r14, guide §2.4): em is consumed SIX times —
    // the count, the fitIvf Lloyd jobs, BOTH probe branches of the
    // candidate join (two references in one job — the lzy race case),
    // and the two pool embedding joins — each reference otherwise
    // re-runs the scan + spread exchange
    val em = Ckpt(graft.Par.spread(
      corpus.filter(col(embCol).isNotNull && size(col(embCol)) > 0)
        .select(col(idCol).as("id"), col(embCol).as("e"), sideCol.as("side")),
      col("id")))
    val n = em.count()
    val centers = fitIvf(em, "id", "e", ivfCellsFor(n, targetCell), iterations)
    val cc = typedLit(centers)
    val probes = em.select(col("id"), col("side"),
      explode(call_function("graft_nearest_centroids", col("e"), cc, lit(nProbe)))
        .as("cell"))
    val cand = probes.filter(!col("side")).as("a")
      .join(probes.filter(col("side")).as("b"), col("a.cell") === col("b.cell"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id")).distinct()
    val pool = cand
      .join(em.select(col("id").as("a_id"), col("e").as("ea")), "a_id")
      .join(em.select(col("id").as("b_id"), col("e").as("eb")), "b_id")
    bitextMineFrom(pool, k, threshold)
  }

  /** Fit the IVF coarse quantizer: deterministic hash-sampled seed
    * centers + `iterations` Lloyd rounds, returning the centroid MODEL
    * (nCentroids × dim doubles). Split out from [[ivfJoin]] because the
    * 100 TB pattern is fit-on-a-sample, apply-to-the-corpus: pass a
    * sampled frame here (e.g. [[Sampling.sample]]'s output) and give the
    * centers to [[ivfJoinWith]] over the full corpus — the fit cost then
    * scales with the sample, and the same model can be reused across
    * runs/queries (it is a plain `Seq[Seq[Double]]`, trivially
    * serializable). */
  def fitIvf(corpus: DataFrame, idCol: String, embCol: String,
      nCentroids: Int = 16, iterations: Int = 1): Seq[Seq[Double]] = {
    reg(corpus)
    // null/empty embeddings can neither index nor probe; dropping them
    // HERE (not implicitly downstream) keeps the Lloyd update clean — a
    // null row would otherwise form a null cell whose getAs[Int] unboxes
    // to 0 and corrupts real cell 0's centroid
    val em = corpus.filter(col(embCol).isNotNull && size(col(embCol)) > 0)
      .select(col(idCol).as("id"), col(embCol).as("e"))
    // deterministic hash-sampled seed centers (bounded: nCentroids rows)
    var centers: Seq[Seq[Double]] = em
      .orderBy(xxhash64(col("id")), col("id")).limit(nCentroids)
      .select(col("e").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq
    var it = 0
    while (it < iterations) {
      // assign every vector to its nearest center, recompute means with
      // the element-wise vector-sum aggregate: the Lloyd shuffle carries
      // ONE (cell, dim-array, count) row per cell — |corpus| input rows,
      // not the posexplode form's |corpus| × dim — and partial
      // aggregation means only nCentroids × dim doubles cross the wire.
      // The collected model update stays nCentroids × dim (means rounded
      // 6dp, killing FP association jitter exactly like the avg form).
      val assigned = em.select(
        element_at(call_function("graft_nearest_centroids",
          col("e"), typedLit(centers), lit(1)), 1).as("cid"),
        col("e").cast("array<double>").as("ed"))
      val sums = assigned.groupBy("cid")
        .agg(graft.functions.VecSumDecAgg.fn(col("ed")).as("s"), count(lit(1)).as("cnt"))
        .collect()
        .map(r => r.getAs[Int]("cid") ->
          (r.getSeq[Long](1), r.getAs[Long]("cnt"))).toMap
      centers = centers.indices.map { ci =>
        sums.get(ci) match {
          case Some((s, cnt)) =>
            // DECIMAL-exact mean (scaled-long sums + HALF_UP 6dp): the
            // centroid VALUE is partition-order-invariant, which is what
            // lets IvfOracleSql replay the Lloyd round in DuckDB
            s.map(v => graft.functions.VecSumDecAgg.mean6(v, cnt))
          case None => centers(ci) // empty cell keeps its previous center
        }
      }
      it += 1
    }
    centers
  }

  /** IVF top-k join against a PRE-FIT centroid model (see [[fitIvf]]):
    * assign every vector to its nearest center (cosine), probe the
    * `nProbe` nearest cells, exact-cosine re-rank the cell EQUI-join
    * candidates. On clustered real embeddings the cells carry the
    * structure; bucket occupancy, not n², drives cost. Per-pair
    * multiplicity: the index side holds exactly one cell per vector,
    * probe cells are distinct, so a directed pair meets at most once —
    * no distinct needed anywhere.
    *
    * Returns (id, neighbor_id, sim, rank ≤ k) like [[annJoin]]. */
  def ivfJoinWith(corpus: DataFrame, idCol: String, embCol: String,
      centers: Seq[Seq[Double]], k: Int = 10, nProbe: Int = 4): DataFrame = {
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(desc("sim"), asc("id"))
    ivfScored(corpus, idCol, embCol, centers, nProbe)
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter(col("rank") <= k)
      .select(col("pid").as("id"), col("id").as("neighbor_id"),
        col("sim"), col("rank"))
  }

  /** The IVF probe-vs-top-1-index candidate core behind [[ivfJoinWith]]
    * and the routed [[hardNegatives]]: each vector probes its `nProbe`
    * nearest cells, each is indexed under its single nearest cell, a
    * candidate is a (probe, indexed) pair sharing a cell — at most one
    * meeting per pair (the index side is top-1), so no dedup is needed.
    * Ends at the SCORED frame (pid, id, sim 4dp), no rank applied. */
  private def ivfScored(corpus: DataFrame, idCol: String, embCol: String,
      centers: Seq[Seq[Double]], nProbe: Int): DataFrame = {
    reg(corpus)
    // spread (guide §2.5): with the index side broadcast, the probe
    // stream's partition count is the task count for the whole
    // cell-collision scoring loop — 1 on the single-row-group fixture
    val em = graft.Par.spread(
      corpus.filter(col(embCol).isNotNull && size(col(embCol)) > 0)
        .select(col(idCol).as("id"), col(embCol).as("e")),
      col("id"))
    val cc = typedLit(centers)
    val index = em.select(col("id"), col("e"),
      element_at(call_function("graft_nearest_centroids", col("e"), cc, lit(1)), 1)
        .as("cid"))
    val probes = em.select(col("id").as("pid"), col("e").as("pe"),
      explode(call_function("graft_nearest_centroids", col("e"), cc, lit(nProbe)))
        .as("cid"))
    probes
      .join(index, "cid")
      .filter(col("pid") =!= col("id"))
      .select(col("pid"), col("id"),
        round(cosine(col("e"), col("pe")), 4).as("sim"))
  }

  /** HARD-NEGATIVE mining for contrastive training (the dense-retrieval
    * / embedding-finetune data op — e.g. DPR, Karpukhin et al. 2020:
    * negatives that score HIGH under the current encoder train the
    * margin; random negatives are too easy to carry gradient): for
    * every labeled anchor, the top-`k` cosine-nearest vectors whose
    * label DIFFERS, windowed to `simThreshold ≤ sim < posCutoff` — the
    * floor keeps the negatives hard, the ceiling drops near-duplicates
    * (a different-label vector at ≥ 0.95 cosine is far more likely a
    * mislabel or un-deduped copy than a legitimate negative — the
    * false-negative trap the ceiling is standard practice against).
    *
    * Candidates ride the SAME routed ANN machinery as [[annJoinAuto]]:
    * the occupancy/banding derivation from one scalar corpus count,
    * LSH band buckets below the `maxBands` clamp, the IVF cell index
    * past it ([[fitIvf]] at the [[ivfCellsFor]] occupancy, nProbe=4 —
    * the exact parameterization the oracle replays). The label filter
    * and the rank election happen AFTER exact-cosine verify, so
    * precision is exact given the candidate pool; only which
    * candidates are FOUND is approximate (the ANN family contract).
    *
    * Returns (vec_id, label, neg_id, neg_label, sim, rank ≤ k). */
  def hardNegatives(corpus: DataFrame, idCol: String, embCol: String,
      labelCol: String, k: Int = 3, posCutoff: Double = 0.95,
      simThreshold: Double = 0.4, dim: Int = 64, targetBucket: Int = 32,
      targetRecall: Double = 0.8, maxBands: Int = 64): DataFrame = {
    val filtered = corpus.filter(col(embCol).isNotNull &&
      size(col(embCol)) > 0 && col(labelCol).isNotNull)
    val n = filtered.count()
    val d = deriveBanding(n, targetBucket, simThreshold, targetRecall, maxBands)
    val scored =
      if (d.clamped) {
        val centers = fitIvf(filtered, idCol, embCol, ivfCellsFor(n, 128), 1)
        ivfScored(filtered, idCol, embCol, centers, nProbe = 4)
      } else
        lshScored(filtered, idCol, embCol, nPlanes = d.w * d.bands,
          bands = d.bands, dim = dim, multiProbe = true,
          maxBucketVecs = 8 * targetBucket, undirected = false)
    val lab = filtered.select(col(idCol).as("id"), col(labelCol).as("lbl"))
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(desc("sim"), asc("id"))
    scored
      .join(lab.select(col("id").as("pid"), col("lbl").as("label")), "pid")
      .join(lab.select(col("id"), col("lbl").as("neg_label")), "id")
      .filter(col("label") =!= col("neg_label") &&
        col("sim") < posCutoff && col("sim") >= simThreshold)
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter(col("rank") <= k)
      .select(col("pid").as("vec_id"), col("label"),
        col("id").as("neg_id"), col("neg_label"), col("sim"), col("rank"))
  }

  /** Fit-and-join in one call: [[fitIvf]] on the full corpus, then
    * [[ivfJoinWith]]. At 100 TB prefer fitting on a deterministic
    * sample ([[Sampling.sample]]) and applying the model to the corpus —
    * the split exists precisely so the Lloyd passes never scan 100 TB. */
  def ivfJoin(corpus: DataFrame, idCol: String, embCol: String,
      k: Int = 10, nCentroids: Int = 16, nProbe: Int = 4,
      iterations: Int = 1): DataFrame =
    ivfJoinWith(corpus, idCol, embCol,
      fitIvf(corpus, idCol, embCol, nCentroids, iterations), k, nProbe)

  /** Occupancy-derived IVF cell count: cells = clamp(⌈n / targetCell⌉,
    * 16, 4096). A FIXED cell count is the IVF scale bug the r11 sf1.0
    * stress run caught: cells must grow with the corpus or per-cell
    * occupancy — and with it the candidate volume of every probe
    * equi-join — grows linearly, sending the join quadratic exactly
    * like an underivated LSH (the r8 flag annJoinAuto's `planesPerBand`
    * fixed for the hyperplane family). */
  def ivfCellsFor(n: Long, targetCell: Int = 128): Int =
    math.min(4096, math.max(16, math.ceil(n.toDouble / targetCell).toInt))

  /** OCCUPANCY-AWARE [[ivfJoin]]: derive the cell count from the corpus
    * size ([[ivfCellsFor]] — one scalar count, the annJoinAuto
    * derivation pattern) so per-cell occupancy stays ≈ targetCell at
    * any scale. At the gate SFs (≤ 2000 vectors) the derivation lands
    * exactly on the historical 16, so results are unchanged there;
    * at sf1.0 (20k vectors) it fits 157 cells instead of letting
    * 1250-vector cells send the probe join quadratic. */
  def ivfJoinAuto(corpus: DataFrame, idCol: String, embCol: String,
      k: Int = 10, nProbe: Int = 4, targetCell: Int = 128,
      iterations: Int = 1): DataFrame = {
    val n = corpus.filter(col(embCol).isNotNull && size(col(embCol)) > 0).count()
    ivfJoin(corpus, idCol, embCol, k, ivfCellsFor(n, targetCell), nProbe, iterations)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication"):
    * k-means cluster the embedding space, then inside each cluster mark
    * as SEMANTIC DUPLICATES the vectors whose cosine to a cluster-mate
    * exceeds `simThreshold`. The paper keeps a random member per
    * duplicate neighborhood; this engine's deterministic variant keeps
    * the SMALLEST id — a vector is a duplicate iff some smaller-id
    * cluster-mate sits above the threshold, so the minimum id of every
    * neighborhood provably survives and the output is a pure function
    * of the data (the keep-min election every graft dedup uses).
    *
    * Returns one row per vector: (id, cell, keep 1/0, dup_sim = the
    * strongest smaller-id in-cell similarity, null for keepers).
    *
    * Scale shape: the clustering IS the blocking — candidate pairs are
    * the within-cell self equi-join, cost Σ|cell|², and the cell count
    * is occupancy-derived ([[ivfCellsFor]] — ⌈n/targetCell⌉ keeps
    * per-cell occupancy ≈ targetCell at any corpus size, the r11 sf1.0
    * lesson), so candidate volume stays ≈ n · targetCell. The fit is
    * [[fitIvf]] (model-sized collect, documented exemption); the count
    * here is the same ONE-scalar occupancy derivation as
    * [[annJoinAuto]]/[[ivfJoinAuto]]. At 100 TB fit on a deterministic
    * sample and raise `targetCell` to taste — recall of the blocking is
    * the standard IVF trade the recall properties measure. */
  def semDedup(corpus: DataFrame, idCol: String, embCol: String,
      simThreshold: Double = 0.4, targetCell: Int = 128,
      iterations: Int = 1, nProbe: Int = 2): DataFrame = {
    require(nProbe >= 1, s"nProbe must be ≥1, got $nProbe")
    reg(corpus)
    // spread (guide §2.5): the within-cell pair fan-out otherwise runs
    // at the scan's partition count (1 on the single-row-group fixture)
    val em = graft.Par.spread(
      corpus.filter(col(embCol).isNotNull && size(col(embCol)) > 0)
        .select(col(idCol).as("id"), col(embCol).as("e")),
      col("id"))
    val n = em.count()
    val centers = fitIvf(corpus, idCol, embCol, ivfCellsFor(n, targetCell), iterations)
    val cc = typedLit(centers)
    val asg = em.select(col("id"), col("e"),
      element_at(call_function("graft_nearest_centroids", col("e"), cc, lit(1)), 1)
        .as("cell"))
    // MULTI-PROBE candidate generation (the measured IVF lesson: top-1
    // blocking caught only 0.32 of exact θ=0.4 pairs on the fixture —
    // boundary pairs usually hold each other's cell as their SECOND
    // nearest, so symmetric top-nProbe probing recovers them at
    // nProbe²× candidate cost): a pair is a candidate iff the two
    // vectors share ANY probed cell. A pair meeting in two shared cells
    // duplicates its (id, sim) row — max() absorbs the multiplicity.
    val probes = em.select(col("id"), col("e"),
      explode(call_function("graft_nearest_centroids", col("e"), cc, lit(nProbe)))
        .as("cell"))
    val pairs = probes.as("a").join(probes.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("b.id").as("id"), cosine(col("a.e"), col("b.e")).as("sim"))
      .filter(col("sim") >= simThreshold)
    // round commutes with max (monotone), so the 4dp cut happens once,
    // after the aggregate — identical to the oracle's round(max(sim))
    val dup = pairs.groupBy("id").agg(round(max(col("sim")), 4).as("dup_sim"))
    asg.join(dup, Seq("id"), "left")
      .select(col("id"), col("cell").cast("long").as("cell"),
        when(col("dup_sim").isNull, 1L).otherwise(0L).as("keep"),
        col("dup_sim"))
  }

  /** Fit PQ codebooks on RESIDUALS v − center(cell(v)) — the model
    * [[ivfPqJoin]]'s `residual = true` mode expects (Jégou TPAMI'11
    * §IV: the coarse quantizer absorbs the between-cell variance, PQ
    * spends its codewords on the within-cell remainder). Assignment and
    * residualization are map-side against the literal centers; the
    * Lloyd rounds are the standard [[pqFit]] on the residual frame —
    * fit on a deterministic sample at 100 TB like every graft fit. */
  def pqFitResidual(corpus: DataFrame, idCol: String, embCol: String,
      centers: Seq[Seq[Double]], m: Int = 8, k: Int = 16, dim: Int = 64,
      iterations: Int = 1): Seq[Seq[Seq[Double]]] = {
    reg(corpus)
    val cc = typedLit(centers)
    val res = corpus.filter(col(embCol).isNotNull && size(col(embCol)) === dim)
      .select(col(idCol).as("id"),
        zip_with(col(embCol).cast("array<double>"),
          element_at(cc,
            element_at(call_function("graft_nearest_centroids",
              col(embCol), cc, lit(1)), 1) + 1),
          (x, c) => x - c).as("res"))
    pqFit(res, "id", "res", m, k, dim, iterations)
  }

  /** IVF-ADC search over PQ CODES (the IVFADC composition of Jégou et
    * al., TPAMI 2011 §IV — what real 100 TB vector stores run): the
    * index side carries only (cell, m PQ codes) per vector — never the
    * embedding — so at scale the standing index is m bytes/vector, 64×
    * smaller than float64 at m=8/dim=64. Per probe: the `nProbe`
    * nearest cells are probed (cell EQUI-join, the [[ivfJoinWith]]
    * shape), each candidate scored with the asymmetric distance
    * Σ_s lut[s][codes[s]] (m lookups against the probe's precomputed
    * [[adcLut]]), the best `k·shortlist` ADC candidates per probe kept,
    * and ONLY that shortlist joins the embeddings back for the exact
    * re-rank — the two-level filter (coarse cells → ADC → exact) that
    * makes the expensive exact math shortlist-sized, never
    * collision-sized.
    *
    * The probe stream rides the LUT (m·k doubles) through the cell
    * shuffle — a per-probe constant, the published IVFADC trade
    * (recomputing the LUT per candidate would be m·k·dsub flops × the
    * collision count). The ADC projection runs pipelined on the join
    * output, so the window shuffle that ranks the shortlist carries
    * (pid, id, adc) triples only. Per-pair multiplicity: one cell per
    * index vector × distinct probe cells → a pair meets at most once
    * (no distinct — the [[ivfJoinWith]] argument).
    *
    * ADC orders by L2 of whatever vectors were encoded; for a COSINE
    * contract, pass unit-normalized vectors (then L2 = 2 − 2·cos,
    * order-identical) and re-rank stays cosine — the q_ann_ivfpq
    * recipe. Returns (id, neighbor_id, sim, rank ≤ k) like [[annJoin]].
    *
    * `residual = true` is the FULL IVFADC of the paper: codes quantize
    * the residual v − center(cell(v)) instead of v itself (fit the
    * codebooks with [[pqFitResidual]]). Since p − x =
    * (p − center) − (x − center) inside a probed cell, ADC still
    * estimates the same ||p − x||² — but residuals cluster far tighter
    * than raw vectors, so the same m×k codebook spends its codewords on
    * a smaller ball = lower quantization error = a more faithful ADC
    * shortlist at identical index bytes. Price: the LUT is per
    * (probe, probed-cell) — nProbe LUTs per probe instead of one (the
    * published trade, §IV.A); everything downstream of the cell join is
    * unchanged.
    */
  def ivfPqJoin(corpus: DataFrame, idCol: String, embCol: String,
      centers: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      k: Int = 10, nProbe: Int = 4, shortlist: Int = 4,
      dim: Int = 64, residual: Boolean = false): DataFrame = {
    reg(corpus)
    require(codebooks.nonEmpty && dim % codebooks.size == 0,
      s"codebook count ${codebooks.size} must divide dim $dim")
    // spread (guide §2.5): the LUT builds, the ADC scoring of every
    // cell collision, and the PQ encode otherwise run at the scan's
    // partition count (1 on the single-row-group fixture)
    val em = graft.Par.spread(
      corpus.filter(col(embCol).isNotNull && size(col(embCol)) === dim)
        .select(col(idCol).as("id"), col(embCol).as("e")),
      col("id"))
    val cc = typedLit(centers)
    def minus(v: Column, cid: Column): Column =
      zip_with(v, element_at(cc, cid + 1), (x, c) => x - c)
    // the standing index: (cell, codes) only — m small ints per vector;
    // residual mode encodes v − center(own cell)
    val withCell = em.withColumn("cid",
      element_at(call_function("graft_nearest_centroids", col("e"), cc, lit(1)), 1))
    val encIn =
      if (residual)
        withCell.withColumn("enc", minus(col("e").cast("array<double>"), col("cid")))
      else withCell.withColumn("enc", col("e"))
    val index = pqEncode(encIn, "enc", codebooks, dim)
      .select(col("id"), col("cid"), col("codes"))
    // probe stream: cells first, then the LUT — raw mode computes ONE
    // LUT per probe (cell-independent); residual mode computes one per
    // (probe, probed cell) from the probe's residual in that cell's
    // frame (both native — graft_adc_lut is one m·k·dsub loop per row)
    val probeCells = em.select(col("id").as("pid"), col("e"),
        explode(call_function("graft_nearest_centroids", col("e"), cc, lit(nProbe)))
          .as("cid"))
    val probes = probeCells.select(col("pid"), col("cid"),
      call_function("graft_adc_lut",
        if (residual) minus(col("e").cast("array<double>"), col("cid"))
        else col("e").cast("array<double>"),
        typedLit(codebooks)).as("lut"))
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(asc("adc"), asc("id"))
    val cand = probes.join(index, "cid")
      .filter(col("pid") =!= col("id"))
      // project to (pid, id, adc) IN the join stage: the lut/codes never
      // cross the window shuffle; graft_adc keeps the per-collision
      // scoring inside whole-stage codegen (one m-lookup loop per row)
      .select(col("pid"), col("id"),
        call_function("graft_adc", col("lut"), col("codes")).as("adc"))
      .withColumn("arnk", row_number().over(wAdc))
      .filter(col("arnk") <= k * shortlist)
      .select("pid", "id")
    // exact re-rank on the shortlist only
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(desc("sim"), asc("id"))
    cand
      .join(em.select(col("id").as("pid"), col("e").as("pe")), "pid")
      .join(em, "id")
      .withColumn("sim", round(cosine(col("e"), col("pe")), 4))
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter(col("rank") <= k)
      .select(col("pid").as("id"), col("id").as("neighbor_id"),
        col("sim"), col("rank"))
  }
}
