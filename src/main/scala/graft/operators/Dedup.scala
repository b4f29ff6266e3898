package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family for training-data pipelines (north-star surface):
  * exact, n-gram Jaccard, MinHash-LSH, and SimHash near-dup detection.
  *
  * Scale design: nothing here is all-pairs. Exact dedup is a hash
  * aggregate; Jaccard pairs come from an inverted-index self-join on
  * shared shingles (only co-occurring docs meet); MinHash pairs come from
  * LSH band buckets (candidates ∝ collisions, not |docs|²); SimHash pairs
  * from 16-bit block buckets (pigeonhole guarantee for distance ≤ 3).
  * Skewed shingles ("the the the") would hot-spot the shingle join at
  * 100 TB — the standard fix is dropping top-frequency shingles
  * (stop-shingles) before the join, exposed here via MAX_SHINGLE_DF.
  */
object Dedup {

  /** Distinct 3-token shingles per doc. */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(t) >= 3
                THEN transform(sequence(0, size(t) - 3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
                ELSE array() END""")).as("s"))
      .distinct()

  /** Exact dedup keeping the smallest doc_id per text — groupBy(min), the
    * one-shuffle formulation (vs dropDuplicates, which is
    * order-nondeterministic about WHICH row survives). */
  private val qDedupExact = Q(
    "q_dedup_exact",
    (s, dir) =>
      Tables.documents(s, dir)
        .groupBy("text")
        .agg(min("doc_id").as("doc_id"))
        .select("doc_id")
        .orderBy("doc_id"),
    Some("""SELECT min(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id""")
  )

  /** Exact n-gram Jaccard near-dup pairs via inverted-index join: docs
    * sharing ≥1 shingle meet once per shared shingle, count = |∩|, sizes
    * give |∪|. Only emits pairs ≥ 0.5. */
  private val qNgramJaccard = Q(
    "q_dedup_ngram_jaccard",
    (s, dir) => {
      val sh = shingles(s, dir)
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.as("a")
        .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
      inter
        .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .withColumn("jac", col("i") / (col("na") + col("nb") - col("i")))
        .filter(col("jac") >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },
    Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
                 sh AS (SELECT DISTINCT doc_id,
                          unnest(list_transform(generate_series(1, len(t) - 2),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
                        FROM toks),
                 sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
                 inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                           GROUP BY 1, 2)
            SELECT doc_a, doc_b, round(i * 1.0 / (x.n + y.n - i), 4) AS jaccard
            FROM inter JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
            WHERE i * 1.0 / (x.n + y.n - i) >= 0.5
            ORDER BY doc_a, doc_b""")
  )

  /** MinHash + LSH near-dup detection: 32 hash functions (xxhash64 with
    * seed-prefixed input — deterministic across runs/executors), banded
    * into 8 bands of 4 rows. Candidate pairs share a band hash; each
    * candidate is then verified with EXACT Jaccard over its shingle sets,
    * so the output has no false positives (LSH only bounds recall).
    * Probabilistically SQL-inexpressible ordering of hash families → no
    * DuckDB oracle; property-tested against q_dedup_ngram_jaccard
    * (DedupSpec): every exact pair ≥0.7 must be recovered. */
  private val qDedupMinhash = Q(
    "q_dedup_minhash",
    (s, dir) => {
      graft.functions.VectorExprs.register(s)
      val docSh = shingles(s, dir).groupBy("doc_id").agg(collect_list("s").as("shs"))
      // native one-pass signature (k=32, xxhash64 family, per-function
      // seed) — the higher-order-function formulation re-evaluated the
      // whole fold per reference after projection collapse
      val sig = docSh.select(col("doc_id"), expr("graft_minhash(shs)").as("sig"))
      // explode FIRST, derive the band hash above the Generate: projection
      // collapse cannot cross Generate, so the signature is evaluated once
      // per doc instead of once per band reference
      val bands = sig
        .select(col("doc_id"), col("sig"), explode(expr("sequence(0, 7)")).as("band_id"))
        .select(col("doc_id"), col("band_id"), expr(
          """xxhash64(concat_ws(',', cast(band_id AS STRING),
               cast(sig[band_id*4] AS STRING), cast(sig[band_id*4+1] AS STRING),
               cast(sig[band_id*4+2] AS STRING), cast(sig[band_id*4+3] AS STRING)))""").as("bh"))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band_id") === col("b.band_id") && col("a.bh") === col("b.bh") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      cand
        .join(docSh.select(col("doc_id").as("doc_a"), col("shs").as("sa")), "doc_a")
        .join(docSh.select(col("doc_id").as("doc_b"), col("shs").as("sb")), "doc_b")
        .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
        .withColumn("jaccard", col("inter") / (size(col("sa")) + size(col("sb")) - col("inter")))
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },
    None
  )

  /** SimHash near-dup detection: 64-bit signature from signed token-hash
    * bit votes, 16-bit block LSH (4 blocks → any pair within Hamming
    * distance 3 shares a block, pigeonhole — so ≤3 output is EXACT, not
    * approximate), exact Hamming verify via bit_count(xor). Entirely
    * map-side until the block-bucket join. */
  private val qDedupSimhash = Q(
    "q_dedup_simhash",
    (s, dir) => {
      graft.functions.VectorExprs.register(s)
      // native one-pass signature: the higher-order formulation (bits
      // array referenced 64×) re-evaluated the whole token fold per bit
      // after projection collapse — 222 s for 500 docs; this is <1 s
      val sig = Tables.documents(s, dir)
        .select(col("doc_id"),
          expr("graft_simhash(array_distinct(split(text, ' ')))").as("simhash"))
      // explode-first so simhash evaluates once per doc (see minhash note)
      val blocks = sig
        .select(col("doc_id"), col("simhash"), explode(expr("sequence(0, 3)")).as("k"))
        .select(col("doc_id"), col("simhash"), col("k"),
          expr("shiftright(simhash, k*16) & 65535").as("blk"))
      blocks.as("a")
        .join(blocks.as("b"),
          col("a.k") === col("b.k") && col("a.blk") === col("b.blk") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    },
    None
  )

  val all: Seq[Q] = Seq(qDedupExact, qNgramJaccard, qDedupMinhash, qDedupSimhash)
}
