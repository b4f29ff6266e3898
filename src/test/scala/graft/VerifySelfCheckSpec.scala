package graft

import org.apache.spark.sql.functions._

/** The no-oracle gate (Verify's self_check.json) rests on
  * [[Verify.contentHash]] being a pure function of a result's VALUES —
  * invariant to row order, partitioning, and column order, sensitive to
  * any value change. These pins keep a refactor from silently weakening
  * the check into one that hashes layout.
  */
class VerifySelfCheckSpec extends SparkTestBase {

  private def df(rows: Seq[(Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("id", "s", "v")
  }

  private val base = Seq((1L, "a", 1.5), (2L, "b", -0.25), (3L, null.asInstanceOf[String], 2.0))

  test("contentHash is invariant to row order, partitioning, and column order") {
    val (n0, h0) = Verify.contentHash(df(base))
    assert(n0 == 3)
    val (n1, h1) = Verify.contentHash(df(base.reverse))
    assert((n1, h1) == ((n0, h0)), "row order must not matter")
    val (n2, h2) = Verify.contentHash(df(base).repartition(7))
    assert((n2, h2) == ((n0, h0)), "partitioning must not matter")
    val (n3, h3) = Verify.contentHash(df(base).select("v", "id", "s"))
    assert((n3, h3) == ((n0, h0)), "column order must not matter (hash sorts by name)")
  }

  test("contentHash is sensitive to value changes, row drops, and duplicate multiplicity") {
    val (_, h0) = Verify.contentHash(df(base))
    val (_, hVal) = Verify.contentHash(df(base.updated(0, (1L, "a", 1.5000001))))
    assert(hVal != h0, "a value change must change the hash")
    val (nDrop, hDrop) = Verify.contentHash(df(base.take(2)))
    assert(nDrop == 2 && hDrop != h0)
    // decimal SUM (not xor): a row counted twice must differ from once
    val (nDup, hDup) = Verify.contentHash(df(base ++ base.take(1)))
    assert(nDup == 4 && hDup != h0, "duplicate multiplicity must change the hash")
  }

  test("contentHash handles empty results and complex column types") {
    val (nE, hE) = Verify.contentHash(df(Nil))
    assert(nE == 0 && hE == "0")
    import spark.implicits._
    val arr = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq.empty[Float])).toDF("id", "vec")
    val (nA, hA) = Verify.contentHash(arr)
    val (nB, hB) = Verify.contentHash(arr.orderBy(desc("id")).repartition(3))
    assert(nA == 2 && (nA, hA) == ((nB, hB)), "array columns must hash stably")
  }

  test("contentHash survives a parquet round-trip (the dump IS execution one)") {
    // Verify hashes the written parquet dump as run 1 and a fresh
    // execution as run 2 — the round-trip must be hash-transparent
    val out = java.nio.file.Files.createTempDirectory("selfcheck-rt-").toString
    val d = df(base)
    d.coalesce(1).write.mode("overwrite").parquet(out)
    val (n1, h1) = Verify.contentHash(spark.read.parquet(out))
    val (n2, h2) = Verify.contentHash(d)
    assert((n1, h1) == ((n2, h2)), "parquet round-trip must not change the hash")
  }
}
