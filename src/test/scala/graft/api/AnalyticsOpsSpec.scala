package graft.api

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-model pins for the r9 analytics additions: Adamic–Adar (both
  * forms), Wilson ranking, Lorenz curve, SAX, Brown smoothing. The
  * oracled q_* instantiations cover the fixture paths; these pin the
  * library semantics on graphs/series small enough to verify by hand —
  * including shapes the fixture can't produce (the doc near-dup graph
  * is a perfect matching, so the unipartite wedge path only runs
  * here). */
class AnalyticsOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val invLn2 = math.floor(1.0 / math.log(2.0) * 10000) / 10000

  test("adamicAdar: path graph predicts the two skip links, triangle predicts nothing") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Graph.adamicAdar(path, "a", "b")
      .as[(Long, Long, Long, Double)].collect().toSet
    // wedges 1–2–3 and 2–3–4; both centers have degree 2
    assert(got == Set((1L, 3L, 1L, invLn2), (2L, 4L, 1L, invLn2)))
    val triangle = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    assert(Graph.adamicAdar(triangle, "a", "b").count() == 0)
  }

  test("adamicAdarBipartite: rare centers outweigh hubs; the cap drops hub wedges") {
    // c1 -> {A, B}; c2 -> {A, B, C}
    val e = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (2L, 30L))
      .toDF("c", "r")
    val all = Graph.adamicAdarBipartite(e, "c", "r", maxCenterDeg = 0L)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    val ab = math.floor((1.0 / math.log(2.0) + 1.0 / math.log(3.0)) * 10000) / 10000
    val viaC2 = math.floor(1.0 / math.log(3.0) * 10000) / 10000
    assert(all == Map((10L, 20L) -> ((2L, ab)),
      (10L, 30L) -> ((1L, viaC2)), (20L, 30L) -> ((1L, viaC2))))
    // cap 2 excludes c2 (deg 3): only the c1 wedge survives
    val capped = Graph.adamicAdarBipartite(e, "c", "r", maxCenterDeg = 2L)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(capped == Set((10L, 20L, 1L, invLn2)))
  }

  test("wilsonRank: 95/100 outranks 1/1, successes clamp to trials") {
    // user 1: 1 view 1 purchase; user 2: 100 views 95 purchases;
    // user 3: 2 views 5 purchases (independent counters -> clamp)
    val rows =
      Seq.fill(1)((1L, "view")) ++ Seq.fill(1)((1L, "purchase")) ++
      Seq.fill(100)((2L, "view")) ++ Seq.fill(95)((2L, "purchase")) ++
      Seq.fill(2)((3L, "view")) ++ Seq.fill(5)((3L, "purchase"))
    val got = Experiment.wilsonRank(rows.toDF("user_id", "event_type"), "user_id",
        when(col("event_type") === "view", 1L).otherwise(0L),
        when(col("event_type") === "purchase", 1L).otherwise(0L))
      .as[(Long, Long, Long, Double)].collect()
    val byKey = got.map(t => t._1 -> t).toMap
    assert(byKey(3L)._3 == 2L, "successes must clamp to trials")
    assert(byKey(2L)._4 > byKey(1L)._4,
      "the Wilson bound must rank 95/100 above 1/1")
    // and the output arrives ranked descending
    assert(got.map(_._4).toSeq == got.map(_._4).sortBy(-_).toSeq)
  }

  test("lorenz: bins partition the rows, shares accumulate to exactly 1") {
    val df = (1 to 40).map(i => ("g", i.toLong, i.toLong)).toDF("g", "v", "id")
    val got = Profiler.lorenz(df, "g", "v", "id", bins = 10)
      .orderBy("bin")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(got.map(_._2).toSeq == (1L to 10L))
    assert(got.map(_._3).sum == 40L)
    // ascending rank -> bin totals non-decreasing; cumulative hits 1.0
    assert(got.map(_._4).toSeq == got.map(_._4).sortBy(identity).toSeq)
    assert(got.last._6 == 1.0)
    assert(got.map(_._6).toSeq == got.map(_._6).sortBy(identity).toSeq)
  }

  test("sax: a low/high step series reads aaaa dddd; constant series reads all c") {
    val step = (0 until 16).map(i =>
      (1L, i.toLong * 1000, i.toLong, if (i < 8) 0.0 else 10.0))
    val const = (0 until 16).map(i => (2L, i.toLong * 1000, i.toLong, 7.0))
    val df = (step ++ const).toDF("k", "ts_ms", "id", "v")
    val got = TimeSeries.sax(df, "k", "ts_ms", "id", "v")
      .as[(Long, Long, String)].collect().map(t => t._1 -> t._3).toMap
    assert(got == Map(1L -> "aaaadddd", 2L -> "cccccccc"))
    // under-minRows keys drop
    val short = (0 until 10).map(i => (9L, i.toLong, i.toLong, 1.0 * i))
      .toDF("k", "ts_ms", "id", "v")
    assert(TimeSeries.sax(short, "k", "ts_ms", "id", "v").count() == 0)
  }

  test("holtBrown: constant series has ~zero trend and forecast == level + trend") {
    val df = (0 until 25).map(i => (1L, i.toLong * 1000, i.toLong, 4.0))
      .toDF("k", "ts_ms", "id", "v")
    val got = TimeSeries.holtBrown(df, "k", "ts_ms", "id", "v", windowRows = 20)
      .select("level", "trend", "forecast")
      .as[(Double, Double, Double)].collect()
    // each weighted term quantizes DECIMAL(30,10) before the sum, so a
    // constant series recovers its value to the quantization bound
    // (windowRows · 5e-11 / weight-total), not bit-exactly
    got.foreach { case (l, t, f) =>
      assert(math.abs(l - 4.0) < 1e-8 && math.abs(t) < 1e-8 && f == l + t,
        s"($l, $t, $f)")
    }
  }
}
