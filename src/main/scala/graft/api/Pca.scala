package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed principal-component analysis over an embedding column —
  * the standard preprocessing step in front of vector indexing (OPQ-style
  * rotation/whitening before product quantization, variance-ranked
  * dimension pruning before ANN) and the corpus-drift lens ("did the new
  * crawl move the embedding cloud?").
  *
  * Shape: ONE aggregation pass collapses the corpus to its second-moment
  * frame — `n`, `Σv` (d doubles) and `Σ vvᵀ` (d² doubles, flattened) via
  * the dedicated [[graft.functions.MomentAgg]] (primitive fused loops,
  * map-side partial aggregation) — so the driver sees a single row of
  * d²+d+1 doubles
  * (d = 64 → ~33 KB), never data. The eigendecomposition runs on the
  * driver over the d×d covariance (cyclic Jacobi — model-sized, the
  * ML-fit exemption class, like [[Similarity.fitIvf]]'s centroid
  * materialization). Projection is a map-side expression over literal
  * component vectors: no shuffle, no join, corpus never moves.
  *
  * Determinism: Jacobi with a fixed cyclic sweep order is a pure
  * function of the covariance; eigenvector SIGN is pinned by making the
  * largest-|coordinate| entry positive (ties → lowest index), and equal
  * eigenvalues order by original dimension index.
  */
object Pca {

  /** `components(j)` is the j-th unit eigenvector (descending
    * eigenvalue); `eigenvalues` are the corresponding covariance
    * eigenvalues (variance along each component). */
  final case class PcaModel(dim: Int, n: Long, mean: Array[Double],
      eigenvalues: Array[Double], components: Array[Array[Double]],
      totalVariance: Double) {
    /** λᵢ / trace(C) — fraction of TOTAL corpus variance along each
      * retained component (not of the retained subspace). */
    def varianceExplained: Array[Double] =
      if (totalVariance <= 0) eigenvalues.map(_ => 0.0)
      else eigenvalues.map(_ / totalVariance)
  }

  /** One corpus pass → covariance → driver-side Jacobi. Rows with null
    * or wrong-dimension vectors are excluded (the [[VecSumAgg]] ragged
    * guard would otherwise throw). */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    require(dim >= 2, s"dim must be ≥2, got $dim")
    require(k >= 1 && k <= dim, s"k must be in [1,$dim], got $k")
    // one MomentAgg pass: [n, Σv, Σvvᵀ] in a single primitive-loop
    // buffer (the nested-HOF outer-product spelling was interpreted
    // per element — measured 35 s at sf0.1; this runs in ~0.1 s)
    val row = df
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(vecCol).cast("array<double>").as("v"))
      .agg(graft.functions.MomentAgg.fn(col("v")).as("m"))
      .head() // MODEL-sized: 1 row of d²+d+1 doubles (the ML-fit exemption)
    val m = row.getSeq[Double](0).toArray
    require(m.nonEmpty, s"no vectors of dim $dim to fit PCA on")
    val n = m(0).toLong
    require(n >= 2, s"need ≥2 vectors of dim $dim to fit PCA, got $n")
    val s1 = java.util.Arrays.copyOfRange(m, 1, 1 + dim)
    val s2 = java.util.Arrays.copyOfRange(m, 1 + dim, 1 + dim + dim * dim)
    val mean = s1.map(_ / n)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      s2(i * dim + j) / n - mean(i) * mean(j))
    val (evals, evecs) = jacobiEig(cov)
    // order: eigenvalue desc, tie → original index asc; sign: largest
    // |coordinate| positive, tie → lowest index
    val order = evals.indices.sortBy(i => (-evals(i), i)).take(k)
    val comps = order.map { j =>
      val v = Array.tabulate(dim)(i => evecs(i)(j))
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(pivot) < 0) v.map(x => -x) else v
    }.toArray
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    PcaModel(dim, n, mean, order.map(evals).toArray, comps, trace)
  }

  /** ORACLE-REPLAYABLE PCA fit: decimal-exact moments + fixed-budget
    * power iteration with deflation.
    *
    * [[fit]]'s float moment sums are partition-order-dependent (ulp
    * drift) and its Jacobi runs a data-dependent number of rotations —
    * fine as a pure function, but unreplayable in a SQL oracle at
    * tolerable cost (~20k recursive rotations over an 8k-element
    * state). This variant is value-deterministic end to end and cheap
    * to replay:
    *
    *  - moments via [[graft.functions.MomentDecAgg]]: every per-row
    *    term fixed to 10dp scaled longs, summed exactly — the moment
    *    frame is partition-order-invariant by VALUE (the r11
    *    VecSumDecAgg discipline that unlocked IvfOracleSql);
    *  - covariance from the exact moments with a PINNED op order
    *    (`(S/1e10)/n`, then `e2 − mean·mean`), every step an
    *    exactly-rounded IEEE op DuckDB reproduces bit-for-bit;
    *  - eigenpairs by POWER ITERATION: v₀ = 1/√d (exact 0.125 at
    *    d=64), `iters` rounds of v ← (C·v)/‖C·v‖ (matvec rows fold
    *    ascending-j from 0.0; the norm folds ascending), λ = vᵀ(C·v),
    *    then deflate C ← C − λ·vvᵀ and repeat for the next component —
    *    only +,−,×,÷,√ with a fixed schedule, so the whole solve is a
    *    closed-form chain of exactly-rounded ops ([[graft.operators
    *    .PcaOracleSql]] replays it as one recursive CTE);
    *  - sign pinned as in [[fit]]: largest-|coordinate| entry positive
    *    (ties → lowest index).
    *
    * Fidelity: with a near-isotropic spectrum power iteration at a
    * fixed budget mixes adjacent close eigenvectors more than Jacobi —
    * the spec pins fitPower against [[fit]] (eigenvalues within
    * tolerance, components aligned up to the expected mixing). Use
    * [[fit]] when you want the tightest eigenbasis; use this when the
    * answer must be value-reproducible across engines. */
  def fitPower(df: DataFrame, vecCol: String, dim: Int, k: Int,
      iters: Int = 300): PcaModel = {
    require(dim >= 2, s"dim must be ≥2, got $dim")
    require(k >= 1 && k <= dim, s"k must be in [1,$dim], got $k")
    require(iters >= 1, s"iters must be ≥1, got $iters")
    val row = df
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(vecCol).cast("array<double>").as("v"))
      .agg(graft.functions.MomentDecAgg.fn(col("v")).as("m"))
      .head() // MODEL-sized: 1 row of d²+d+1 longs (the ML-fit exemption)
    val m = row.getSeq[Long](0).toArray
    require(m.nonEmpty, s"no vectors of dim $dim to fit PCA on")
    val n = m(0)
    require(n >= 2, s"need ≥2 vectors of dim $dim to fit PCA, got $n")
    val nd = n.toDouble
    val mean = Array.tabulate(dim)(i => (m(1 + i).toDouble / 1e10) / nd)
    // cov in a flat row-major array — the exact layout the oracle's
    // list state uses
    val a = new Array[Double](dim * dim)
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) {
        a(i * dim + j) =
          (m(1 + dim + i * dim + j).toDouble / 1e10) / nd - mean(i) * mean(j)
        j += 1
      }
      i += 1
    }
    var trace = 0.0
    i = 0
    while (i < dim) { trace += a(i * dim + i); i += 1 }
    val evals = new Array[Double](k)
    val comps = new Array[Array[Double]](k)
    var c = 0
    while (c < k) {
      val v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
      var it = 0
      while (it < iters) {
        val w = matvec(a, v, dim)
        var nrm = 0.0
        var x = 0
        while (x < dim) { nrm += w(x) * w(x); x += 1 }
        nrm = math.sqrt(nrm)
        if (nrm > 0) {
          var y = 0
          while (y < dim) { v(y) = w(y) / nrm; y += 1 }
        }
        it += 1
      }
      val w = matvec(a, v, dim)
      var lam = 0.0
      var x = 0
      while (x < dim) { lam += v(x) * w(x); x += 1 }
      // deflate BEFORE the sign flip (vvᵀ is sign-invariant, but the
      // oracle replays this exact order)
      var p = 0
      while (p < dim) {
        var q = 0
        while (q < dim) { a(p * dim + q) -= lam * v(p) * v(q); q += 1 }
        p += 1
      }
      val pivot = v.indices.maxBy(z => (math.abs(v(z)), -z))
      evals(c) = lam
      comps(c) = if (v(pivot) < 0) v.map(z => -z) else v.clone()
      c += 1
    }
    PcaModel(dim, n, mean, evals, comps, trace)
  }

  /** Row-major matvec, each row folded ascending-j from 0.0 — the op
    * order [[fitPower]]'s oracle replays. */
  private def matvec(a: Array[Double], v: Array[Double], dim: Int): Array[Double] = {
    val w = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      var s = 0.0
      var j = 0
      while (j < dim) { s += a(i * dim + j) * v(j); j += 1 }
      w(i) = s
      i += 1
    }
    w
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with eigenvectors as COLUMNS).
    * Fixed sweep order (upper triangle row-major), fixed sweep budget,
    * early exit when off-diagonal mass underflows — deterministic. */
  private[graft] def jacobiEig(m: Array[Array[Double]],
      maxSweeps: Int = 64, tol: Double = 1e-13): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < maxSweeps && off > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 // theta == 0 → 45° rotation
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Project every vector onto the model's top components: output
    * (`idCol`, `pc_1`…`pc_k`), each `pc_j = (v − mean)·c_j` rounded
    * 4dp. The mean folds into a per-component scalar offset on the
    * driver (`pc_j = v·c_j − mean·c_j`), so the projection references
    * the RAW vector column only — no computed HOF column is referenced
    * twice (the CollapseProject re-evaluation hazard), and the whole
    * thing is a map-side expression over literals. */
  def project(df: DataFrame, idCol: String, vecCol: String,
      model: PcaModel): DataFrame = {
    val base = df
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === model.dim)
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val pcs = model.components.zipWithIndex.map { case (comp, j) =>
      val offset = comp.zip(model.mean).map { case (c, m) => c * m }.sum
      round(
        aggregate(
          zip_with(col("__v"), typedLit(comp.toSeq), (x, c) => x * c),
          lit(0.0), (acc, x) => acc + x) - lit(offset),
        4).as(s"pc_${j + 1}")
    }
    base.select((col(idCol) +: pcs.toSeq): _*)
  }
}
