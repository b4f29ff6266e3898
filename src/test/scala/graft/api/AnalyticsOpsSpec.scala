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

  test("seasonalDecompose: a square wave on a linear trend recovers phase signs; a gap disqualifies windows") {
    // period 4: phases 0,1 high (+5), phases 2,3 low (-5), plus trend i/10
    // (the trend is what raw phase means would misread; the centered MA
    // removes it)
    val rows = (0 until 64).map { i =>
      val seasonal = if (i % 4 < 2) 5.0 else -5.0
      ("k", i.toLong * 1000, seasonal + i / 10.0)
    }
    val df = rows.toDF("g", "ts_ms", "v")
    val got = TimeSeries.seasonalDecompose(df, "g", "ts_ms", "v",
        widthMs = 1000L, period = 4)
      .orderBy("phase")
      .as[(String, Long, Long, Double)].collect()
    assert(got.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(got(0)._4 > 3 && got(1)._4 > 3 && got(2)._4 < -3 && got(3)._4 < -3,
      got.mkString(", "))
    // drop one middle bucket: every window RANGE-spanning it must
    // disqualify (count < 5), shrinking n_obs vs the dense series
    val dense = got.map(_._3).sum
    val gapped = TimeSeries.seasonalDecompose(
        df.filter(col("ts_ms") =!= 32000L), "g", "ts_ms", "v",
        widthMs = 1000L, period = 4)
      .agg(sum("n_obs")).as[Long].head()
    assert(gapped == dense - 5, s"dense $dense gapped $gapped")
  }

  test("asofJoinNearest: picks the closer side, breaks ties backward, nulls outside tolerance") {
    val left = Seq((1L, 1L, 100L), (2L, 1L, 200L), (3L, 1L, 300L), (4L, 2L, 100L))
      .toDF("id", "k", "ts")
    // key 1 rights: 90 and 104 (id 1: |Δ|=10 vs 4 → forward 104);
    // 195 and 205 (id 2: tie → backward 195); id 3 at 300: nothing
    // within 50; key 2 has no rights at all
    val right = Seq((1L, 90L), (1L, 104L), (1L, 195L), (1L, 205L))
      .toDF("k", "ts")
    val got = TimeSeries.asofJoinNearest(left, "id", "ts", "k",
        right, "ts", "k", toleranceMs = Some(50L))
      .as[(Long, Option[Long], Option[String], Option[Long])].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got(1L) == ((Some(104L), Some("f"), Some(4L))))
    assert(got(2L) == ((Some(195L), Some("b"), Some(-5L))))
    assert(got(3L) == ((None, None, None)))
    assert(got(4L) == ((None, None, None)))
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
