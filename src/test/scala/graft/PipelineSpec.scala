package graft

import graft.extract.{Dictionary, LinkExtract}
import graft.gen.{SyntheticGraph, SyntheticPages}
import graft.algo.LabelPropagation
import graft.model._
import org.apache.spark.sql.functions._

/** Full front-end pipeline: pages → href extraction → dictionary encode →
  * integer edge table → LP. Verifies the extracted+encoded graph is
  * bit-identical to the directly-generated reference topology, and that
  * text extraction and ids are byte/value-stable across parallelism
  * (the determinism half of the scaling-efficiency evidence).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("href extraction: absolute/relative/protocol-relative/noise") {
    val html = """<html><body>
      |<a href="https://a.example/x">1</a>
      |<a class=z href='http://b.example/y'>2</a>
      |<a href="/local">3</a>
      |<a href="rel/path">4</a>
      |<a href="//c.example/z">5</a>
      |<a href="javascript:void(0)">6</a>
      |<a href="#frag">7</a>
      |<a href="mailto:x@y">8</a>
      |<a href="https://a.example/x">dup</a>
      |</body></html>""".stripMargin
    val pages = Seq(("https://site.example/p1", html.getBytes("UTF-8")))
      .toDF("url", "html")
    val got = LinkExtract.urlEdges(pages).collect().map(_.dst_url).toSeq
    got shouldBe Seq(
      "https://a.example/x",
      "http://b.example/y",
      "https://site.example/local",
      "https://site.example/rel/path",
      "https://c.example/z",
      "https://a.example/x")
  }

  test("text extraction golden bytes, stable across runs and parallelism") {
    val html = ("<html><head><title>T</title><style>p{color:red}</style>" +
      "<script>var x = '<p>sneaky</p>';</script></head>" +
      "<body><p>Hello &amp; welcome</p>\n<div>a &lt; b</div><!-- no --></body></html>")
      .getBytes("UTF-8")
    val pages = Seq(("u1", html)).toDF("url", "html")
    val golden = "T Hello & welcome a < b"
    LinkExtract.extractText(pages).head().getString(1) shouldBe golden
    val again = LinkExtract.extractText(pages.repartition(7)).head().getString(1)
    again shouldBe golden
  }

  test("dictionary: dense sorted-rank ids, bijective, parallelism-stable") {
    val urls = (0 until 500).map(i => s"https://x.example/${(i * 7919) % 500}")
      .toDF("url")
    val d1 = Dictionary.build(urls).collect().sortBy(_.id)
    d1.map(_.id).toSeq shouldBe (0L until 500L)
    d1.map(_.url).toSeq shouldBe d1.map(_.url).sorted.toSeq
    val d2 = Dictionary.build(urls.repartition(17)).collect().sortBy(_.id)
    d2.toSeq shouldBe d1.toSeq
  }

  test("pages → extract → encode reproduces the generated topology exactly") {
    val n = 120L
    val density = 5
    val pages = SyntheticPages.pages(spark, n, density)
    val urlEdges = LinkExtract.urlEdges(pages)
    val dict = Dictionary.buildFromEdges(urlEdges)
    val edges = Dictionary.encodeEdges(urlEdges, dict)
    // urls zero-padded → dictionary rank == node id (over linked nodes);
    // node ids are dense iff every node appears as an endpoint
    val got = edges.collect().map(e => (e.src, e.dst)).sorted.toSeq
    val expected = SyntheticGraph.randomEdgesLocal(n, density).sorted
    // map expected through the same dictionary semantics: rank over the
    // distinct endpoint set in url (== numeric) order
    val present = expected.flatMap { case (s, d) => Seq(s, d) }.distinct.sorted
    val rank = present.zipWithIndex.map { case (v, i) => v -> i.toLong }.toMap
    got shouldBe expected.map { case (s, d) => (rank(s), rank(d)) }.sorted
  }

  test("end-to-end §7.4 slice: 3-page triangle through the full stack") {
    // synthesize 3 pages linking in the reference triangle; seed node 0→100
    val urls = (0 to 2).map(i => SyntheticPages.urlOf(i.toLong))
    val tri = Map(0 -> Seq(1, 2), 1 -> Seq(0, 2), 2 -> Seq(0, 1))
    val pagesRows = (0 to 2).map { i =>
      val links = tri(i).map(j => s"""<a href="${urls(j)}">x</a>""").mkString
      (urls(i), s"<html><body>$links</body></html>".getBytes("UTF-8"))
    }
    val pages = pagesRows.toDF("url", "html")
    val urlEdges = LinkExtract.urlEdges(pages)
    val dict = Dictionary.buildFromEdges(urlEdges)
    val edges = Dictionary.encodeEdges(urlEdges, dict)
    val seeds = dict.filter($"url" === urls(0))
      .select($"id".as("node"), lit(100L).as("label")).as[Seed]
    val res = LabelPropagation.run(edges, seeds)
    res.converged shouldBe true
    res.iterations shouldBe 2
    val byUrl = Dictionary.decode(res.labels.toDF(), "id", dict)
      .collect().map(r => r.getAs[String]("url") -> r.getAs[Long]("label")).toMap
    byUrl shouldBe urls.map(_ -> 100L).toMap
  }
}
