package graft.api

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-model pins for the r11 corpus-prep additions: C4 boilerplate
  * strip (remove-everywhere vs spanDedup's keep-first), URL
  * canonicalization (the crawl dedup key), readability scoring, and
  * HTML visible-text extraction. The oracled q_* instantiations cover
  * the fixture paths; these pin the library semantics on inputs small
  * enough to verify by hand — including shapes the fixture can't
  * produce (within-doc span repeats, chrome-only pages, every URL
  * normalization rule in isolation). */
class CorpusPrepOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("boilerplateStrip: cross-doc spans removed EVERYWHERE, within-doc repeats don't count") {
    val docs = Seq(
      (1L, "a b c x y z"),       // spans: "a b c", "x y z"
      (2L, "a b c p q r"),       // spans: "a b c", "p q r"
      (3L, "p q r only"),        // spans: "p q r", "only" (partial span kept)
      (4L, "m n o m n o")        // "m n o" twice in ONE doc: not boilerplate
    ).toDF("doc_id", "text")
    val got = TextDedup.boilerplateStrip(docs, "doc_id", "text",
      spanTokens = 3, minDocs = 2)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // "a b c" in docs {1,2}, "p q r" in docs {2,3} -> both boilerplate,
    // removed from every occurrence INCLUDING the first (the spanDedup
    // difference); doc 4's repeat spans 1 distinct doc -> kept intact
    assert(got(1L) == ((2L, 1L, "x y z")))
    assert(got(2L) == ((2L, 2L, "")))
    assert(got(3L) == ((2L, 1L, "only")))
    assert(got(4L) == ((2L, 0L, "m n o m n o")))
  }

  test("canonicalUrl: every normalization rule — case, www, default port, slash, utm, sort, fragment") {
    val cases = Seq(
      // all rules at once: case, www, default port, trailing slash,
      // utm strip, param sort, fragment drop
      "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag" ->
        "http://example.com/a/b?a=1&b=2",
      // https default port + root path collapses to /
      "https://Site.org:443/" -> "https://site.org/",
      // NON-default port survives; all params were tracking -> no query
      "http://site.org:8080/p?utm_a=1" -> "http://site.org:8080/p",
      // no path at all -> /
      "http://site.org" -> "http://site.org/",
      // param order alone never splits a group
      "https://www.x.io/p/?z=1&y=2" -> "https://x.io/p?y=2&z=1")
    val got = cases.map(_._1).toDF("url")
      .select(TextDedup.canonicalUrl(col("url")).as("c"))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("urlHost: host of the canonical form, explicit port stripped") {
    val got = Seq("http://site.org:8080/p?a=1", "https://x.io/", "http://a.b.c/d/e")
      .toDF("u")
      .select(TextDedup.urlHost(col("u")).as("h")).as[String].collect().toSeq
    assert(got == Seq("site.org", "x.io", "a.b.c"))
  }

  test("readability: hand-computed Flesch ease and FK grade, floor-half-up 4dp") {
    // "the cat sat": 3 words, vowel groups e/a/a = 3 syllables, 1 sentence
    val docs = Seq((7L, "the cat sat")).toDF("doc_id", "text")
    val row = TextAnalysis.readability(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double, Double)].collect().head
    val ease = math.floor((206.835 - 1.015 * 3.0 - 84.6 * 1.0) * 1e4 + 0.5) / 1e4
    val grade = math.floor((0.39 * 3.0 + 11.8 * 1.0 - 15.59) * 1e4 + 0.5) / 1e4
    assert(row == ((7L, 3L, 3L, 1L, ease, grade)))
    // zero-vowel tokens contribute no syllables
    val dry = Seq((8L, "tsk pfft brr")).toDF("doc_id", "text")
    assert(TextAnalysis.readability(dry, "doc_id", "text")
      .select("n_syll").as[Long].collect().head == 0L)
  }

  test("htmlExtract: chrome blocks cut, tags stripped, title and links counted") {
    val html = "<html><head><title>T1</title></head><body>" +
      "<nav><a href=\"/\">h</a></nav><p>hello <b>world</b></p>" +
      "<script>var x=1</script><footer>f</footer></body></html>"
    val row = TextAnalysis.htmlExtract(Seq((1L, html)).toDF("doc_id", "html"),
      "doc_id", "html")
      .as[(Long, String, Long, Long, Double)].collect().head
    // visible = "hello world" (head/nav/script/footer cut, tags stripped)
    val expectedRatio = BigDecimal(11.0 / html.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row == ((1L, "T1", 1L, 2L, expectedRatio)))
    // a chrome-only page: empty visible text, zero words, ratio 0
    val chrome = "<html><head><title>x</title></head><body><nav>n</nav></body></html>"
    val empty = TextAnalysis.htmlExtract(Seq((2L, chrome)).toDF("doc_id", "html"),
      "doc_id", "html")
      .as[(Long, String, Long, Long, Double)].collect().head
    assert(empty == ((2L, "x", 0L, 0L, 0.0)))
  }
}
