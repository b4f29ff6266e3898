package graft.operators

/** DuckDB oracle SQL for the PCA pair — `q_embed_pca`,
  * `q_pca_variance` — built programmatically.
  *
  * These were the repo's last no-oracle sub-family: the float moment
  * sums were partition-order-dependent and the driver-side Jacobi runs
  * a data-dependent number of rotations over an 8k-double state —
  * unreplayable at tolerable cost. r12 moves the registered queries to
  * [[graft.api.Pca.fitPower]], which is value-deterministic end to end
  * and replays as one recursive CTE:
  *
  *  - moments: every per-row term fixed to 10dp scaled longs
  *    (`floor(x·1e10 + 0.5)` ≡ `Math.round`, exact below 2^51) and
  *    summed exactly — [[graft.functions.MomentDecAgg]]'s long sums are
  *    order-free, so the moment frame replays as plain integer SQL;
  *  - covariance with the pinned op order `(S/1e10)/n − mean·mean` —
  *    exactly-rounded IEEE ops both engines reproduce bit-for-bit;
  *  - the eigen-solve: `Iters` power-iteration rounds per component
  *    (matvec rows fold ascending from the first term — the pinned
  *    `list_sum ≡ sequential-Java-fold` equivalence the cosine oracles
  *    established on this fixture), λ = vᵀ(C·v), rank-one deflation
  *    `C − (λ·vᵢ)·vⱼ`, restart from the exact v₀ = 0.125 (= 1/√64);
  *    the recursion carries (comp, iter, matrix-as-4096-list,
  *    v-as-64-list) and steps through k·(Iters+1) states;
  *  - sign pinning: first index attaining max |vᵢ| made positive
  *    (`list_position` returns the FIRST match, ≡ Scala's maxBy);
  *  - projections/variances: per-row sequential dots minus the
  *    mean-offset scalar, `round(·, 4)` / `floor(·e4)/1e4` exactly as
  *    the Spark side.
  *
  * The recursive term binds the matvec/norm/λ once per step through
  * nested subqueries (not per list element — a lambda-hoisting hazard
  * measured at >100M interpreted ops otherwise). Validated through the
  * driver-gate replica at sf0.001/0.01/0.1.
  */
object PcaOracleSql {
  private val D = 64
  private val D2 = D * D
  /** Fixed power-iteration budget — mirrored by the registered
    * queries' `Pca.fitPower(iters = Iters)` calls. */
  val Iters = 300

  /** Anchor start vector 1/√64 — exact in both engines. */
  private val V0 = s"list_transform(range(0, $D), z0 -> 0.125::DOUBLE)"

  /** Shared CTE chain: corpus → exact moments → covariance list +
    * mean list + trace → the power-iteration recursion → signed
    * components with eigenvalues (`sgn`: comp, lam, c). */
  private def chain(k: Int): String = {
    val w = s"list_transform(range(0, $D), wi -> " +
      s"list_sum(list_transform(range(0, $D), wj -> m[wi*$D + wj + 1] * v[wj + 1])))"
    s"""base AS (SELECT vec_id, embedding AS e FROM embeddings
         WHERE embedding IS NOT NULL AND len(embedding) = $D),
nrow AS (SELECT count(*) AS n FROM base),
s1 AS (SELECT ii.i,
         sum(CAST(floor(CAST(e[ii.i + 1] AS DOUBLE) * 1e10 + 0.5) AS BIGINT)) AS s
       FROM base CROSS JOIN (SELECT unnest(range(0, $D)) AS i) ii
       GROUP BY ii.i),
meanl AS MATERIALIZED (
  SELECT list((CAST(s1.s AS DOUBLE) / 1e10) / nrow.n ORDER BY s1.i) AS mu
  FROM s1 CROSS JOIN nrow),
cell AS (SELECT ii.i, jj.j,
           sum(CAST(floor((CAST(e[ii.i + 1] AS DOUBLE) * CAST(e[jj.j + 1] AS DOUBLE))
                 * 1e10 + 0.5) AS BIGINT)) AS s2
         FROM base CROSS JOIN (SELECT unnest(range(0, $D)) AS i) ii
                   CROSS JOIN (SELECT unnest(range(0, $D)) AS j) jj
         GROUP BY ii.i, jj.j),
covl AS MATERIALIZED (
  SELECT list(((CAST(c.s2 AS DOUBLE) / 1e10) / nrow.n) - (mu[c.i + 1] * mu[c.j + 1])
              ORDER BY c.i, c.j) AS m
  FROM cell c CROSS JOIN nrow CROSS JOIN meanl),
tracev AS (SELECT list_sum(list_transform(range(0, $D), ti -> m[ti*$D + ti + 1])) AS tr
           FROM covl),
pow AS (
  SELECT 0 AS comp, 0 AS it, m, $V0 AS v FROM covl
  UNION ALL
  SELECT CASE WHEN p.it < $Iters THEN p.comp ELSE p.comp + 1 END,
         CASE WHEN p.it < $Iters THEN p.it + 1 ELSE 0 END,
         CASE WHEN p.it < $Iters THEN p.m
              ELSE list_transform(range(0, $D2), pq ->
                     p.m[pq + 1] - (p.lam * p.v[pq // $D + 1]) * p.v[pq % $D + 1]) END,
         CASE WHEN p.it < $Iters THEN
                CASE WHEN p.nrm > 0 THEN list_transform(p.w, wx -> wx / p.nrm)
                     ELSE p.v END
              ELSE $V0 END
  FROM (SELECT p1.*,
          CASE WHEN p1.it = $Iters
               THEN list_sum(list_transform(range(0, $D), li -> p1.v[li + 1] * p1.w[li + 1]))
          END AS lam,
          CASE WHEN p1.it < $Iters
               THEN sqrt(list_sum(list_transform(p1.w, nx -> nx * nx)))
          END AS nrm
        FROM (SELECT pow.*, $w AS w
              FROM pow
              WHERE NOT (pow.comp >= ${k - 1} AND pow.it >= $Iters)) p1) p),
res AS (SELECT comp, m, v FROM pow WHERE it = $Iters),
resw AS (SELECT comp, v, $w AS w FROM res),
resl AS (SELECT comp, v,
           list_sum(list_transform(range(0, $D), li -> v[li + 1] * w[li + 1])) AS lam
         FROM resw),
sgn AS MATERIALIZED (
  SELECT comp, lam,
    CASE WHEN v[list_position(list_transform(v, ax -> abs(ax)),
                 list_max(list_transform(v, bx -> abs(bx))))] < 0
         THEN list_transform(v, sx -> -sx) ELSE v END AS c
  FROM resl)"""
  }

  /** q_pca_variance: fitPower(k=8) spectrum with per-component and
    * cumulative variance-explained (cumulative via ordered list-prefix
    * sums — the scanLeft fold order). */
  lazy val varianceSql: String =
    s"""WITH RECURSIVE
${chain(8)},
vel AS (SELECT list(s.lam / t.tr ORDER BY s.comp) AS ve
        FROM sgn s CROSS JOIN tracev t)
SELECT CAST(s.comp + 1 AS BIGINT) AS component,
       floor(s.lam * 10000) / 10000 AS eigenvalue,
       floor((s.lam / t.tr) * 10000) / 10000 AS var_explained,
       floor(list_sum(list_slice(v.ve, 1, s.comp + 1)) * 10000) / 10000
         AS cum_var_explained
FROM sgn s CROSS JOIN tracev t CROSS JOIN vel v
ORDER BY component"""

  /** q_embed_pca: fitPower(k=4) projections — per row,
    * pc_j = v·c_j − (c_j·mean), rounded 4dp. */
  lazy val projectSql: String = {
    def pc(j: Int): String =
      s"""round(list_sum(list_transform(range(0, $D), di ->
            CAST(b.e[di + 1] AS DOUBLE) * cw.c$j[di + 1])) - cw.o$j, 4) AS pc_$j"""
    s"""WITH RECURSIVE
${chain(4)},
offs AS (SELECT s.comp, s.c,
           list_sum(list_transform(range(0, $D), oi -> s.c[oi + 1] * m.mu[oi + 1])) AS off
         FROM sgn s CROSS JOIN meanl m),
cw AS MATERIALIZED (SELECT
${(1 to 4).map(j => s"  any_value(CASE WHEN comp = ${j - 1} THEN c END) AS c$j,\n" +
      s"  any_value(CASE WHEN comp = ${j - 1} THEN off END) AS o$j").mkString(",\n")}
FROM offs)
SELECT b.vec_id, ${(1 to 4).map(pc).mkString(",\n       ")}
FROM base b CROSS JOIN cw
ORDER BY vec_id"""
  }
}
