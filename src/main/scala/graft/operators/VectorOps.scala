package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (Array[Float], dim 64):
  * brute-force cosine top-k (the exact baseline), exact near-dup pairs,
  * and an LSH-bucketed ANN variant (the 100 TB scale path).
  *
  * Scale design: top-k against a probe is map-side only — the probe is
  * broadcast, each partition computes local similarities, and the global
  * top-k is a TakeOrderedAndProject (no shuffle of the corpus). The
  * pairwise query is quadratic by definition and only run on the small
  * fixed documents/embeddings corpus; at scale the ANN path (bucket →
  * in-bucket exact) replaces it.
  */
object VectorOps {

  /** dot(a,b) via the codegen'd native expression — left-fold with
    * per-element double promotion, bit-identical to DuckDB's list_sum
    * fold (see VectorExprs.VectorDot). */
  private def dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-10 against probe vec_id=0. Broadcast probe →
    * map-side similarity → TakeOrderedAndProject. */
  private val qSimilarityTopK = Q(
    "q_similarity_topk",
    (s, dir) => {
      graft.functions.VectorExprs.register(s)
      val em = Tables.embeddings(s, dir)
      val probe = em.filter(col("vec_id") === 0).select(col("embedding").as("pe"))
      em.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id"), round(cosine(col("embedding"), col("pe")), 4).as("sim"))
        .orderBy(desc("sim"), asc("vec_id"))
        .limit(10)
    },
    Some("""WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
                 sc AS (SELECT vec_id,
                   list_sum(list_transform(list_zip(embedding, pe),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot,
                   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
                   sqrt(list_sum(list_transform(pe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
                 FROM embeddings, p WHERE vec_id <> 0)
            SELECT vec_id, round(dot / (na * nb), 4) AS sim FROM sc
            ORDER BY sim DESC, vec_id LIMIT 10""")
  )

  /** Exact embedding-cosine near-dup pairs (threshold 0.4). Quadratic —
    * correctness baseline for the ANN path; corpus is fixed-small. Norms
    * are precomputed per vector (not per pair), so each pair costs one
    * codegen'd dot product. */
  private val qEmbedNearDup = Q(
    "q_embed_neardup",
    (s, dir) => {
      graft.functions.VectorExprs.register(s)
      val em = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
      val a = em.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("nrm").as("na"))
      val b = em.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("nrm").as("nb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .withColumn("cs", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
        .filter(col("cs") >= 0.4)
        .select(col("vec_a"), col("vec_b"), round(col("cs"), 4).as("cos_sim"))
        .orderBy("vec_a", "vec_b")
    },
    Some("""WITH pr AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   list_sum(list_transform(list_zip(a.embedding, b.embedding),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot,
                   sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
                   sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
                 FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
            SELECT vec_a, vec_b, round(dot / (na * nb), 4) AS cos_sim
            FROM pr WHERE dot / (na * nb) >= 0.4 ORDER BY vec_a, vec_b""")
  )

  /** Deterministic ±1 random-hyperplane matrix (16 planes × 64 dims) from
    * a fixed multiplicative hash — identical on every executor/run. */
  private[operators] def planes: Seq[Seq[Double]] =
    (0 until 16).map { p =>
      (0 until 64).map { d =>
        val x = (p * 1000003L + d * 7919L + 12345L) * 2654435761L
        if (((x >> 17) & 1L) == 0L) -1.0 else 1.0
      }
    }

  /** LSH-bucketed approximate nearest neighbors with multi-probe: 16 sign
    * bits from random hyperplanes, 4 bands of 4 bits. Corpus vectors index
    * under their exact band keys; the PROBE additionally queries every
    * band key at Hamming distance 1 (5 keys/band) — the standard
    * multi-probe trick that lifts recall sharply on near-orthogonal data
    * without growing the index. Candidates then get an exact cosine
    * re-rank → top 10. At 100 TB the band join touches only colliding
    * buckets instead of the whole corpus, and the index explodes each
    * vector into just 4 rows. Approximate (recall < 1) → no SQL oracle;
    * recall property-tested vs the exact baseline. */
  private val qAnnLsh = Q(
    "q_ann_lsh",
    (s, dir) => {
      graft.functions.VectorExprs.register(s)
      val sigd = Tables.embeddings(s, dir)
        .withColumn("planes", typedLit(planes))
        .withColumn("sig", expr(
          "transform(planes, pl -> CASE WHEN vec_dot(embedding, pl) >= 0 THEN 1 ELSE 0 END)"))
      // corpus side: one exact key per band ("b:bit0 bit1 bit2 bit3").
      // explode-first: projection collapse cannot cross the Generate, so
      // the 16-dot signature evaluates once per vector, not per reference
      val corpus = sigd.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("embedding"), col("sig"),
          explode(expr("sequence(0, 3)")).as("b"))
        .select(col("vec_id"), col("embedding"), expr(
          """concat_ws(':', cast(b AS STRING),
               cast(sig[b*4] AS STRING), cast(sig[b*4+1] AS STRING),
               cast(sig[b*4+2] AS STRING), cast(sig[b*4+3] AS STRING))""").as("band"))
      // probe side: exact key + the 4 hamming-1 variants per band
      val probeBands = sigd.filter(col("vec_id") === 0)
        .select(col("embedding").as("pe"), explode(expr(
          """flatten(transform(sequence(0, 3), b ->
               transform(sequence(-1, 3), fl -> concat_ws(':', cast(b AS STRING),
                 cast(IF(fl = 0, 1 - sig[b*4],     sig[b*4])     AS STRING),
                 cast(IF(fl = 1, 1 - sig[b*4+1],   sig[b*4+1])   AS STRING),
                 cast(IF(fl = 2, 1 - sig[b*4+2],   sig[b*4+2])   AS STRING),
                 cast(IF(fl = 3, 1 - sig[b*4+3],   sig[b*4+3])   AS STRING)))))""")).as("band"))
      corpus
        .join(broadcast(probeBands), "band")
        .select(col("vec_id"), col("embedding"), col("pe")).distinct()
        .select(col("vec_id"), round(cosine(col("embedding"), col("pe")), 4).as("sim"))
        .orderBy(desc("sim"), asc("vec_id"))
        .limit(10)
    },
    None
  )

  val all: Seq[Q] = Seq(qSimilarityTopK, qEmbedNearDup, qAnnLsh)
}
