package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._

/** Deterministic synthesis of the Common-Crawl-style pages table
  * (`pages(url, warc_ts, html, text, lang)` — BASELINE.json input_hint),
  * whose html embeds EXACTLY the reference random-graph topology
  * (FIXTURES.md §3 / `setup_large_lp_data.py:29-46`): page i carries
  * `density` anchor tags targeting the urls of the splitmix64-chosen
  * neighbour nodes. Extracting links and dictionary-encoding the urls
  * recovers the integer edge table bit-for-bit (proved in PipelineSpec).
  *
  * All columns are pure per-row functions of (i, seed) — reproducible at
  * any parallelism, no external data.
  */
object SyntheticPages {

  /** Url of node i: constant host + zero-padded path so lexicographic url
    * order == numeric node order, making dictionary ranks coincide with
    * node ids (PipelineSpec relies on this to cross-check the extracted
    * graph against the direct generator bit-for-bit).
    */
  def urlOf(i: Long): String = f"https://crawl.example/p$i%012d"

  private def urlCol(i: org.apache.spark.sql.Column) =
    format_string("https://crawl.example/p%012d", i)

  /** Deterministic page body text (before html wrapping). */
  def bodyOf(i: Long, lang: String): String =
    s"Page $i in $lang. The quick crawl indexed node $i."

  /** pages DataFrame for the n-node, density-d reference random graph. */
  def pages(spark: SparkSession, n: Long, density: Int = 10,
            seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val i = $"id"
    val anchors = (0 until density).map { j =>
      val h = SyntheticGraph.splitmix64Col(
        lit(seed * 0x100000000L) + i * density + j)
      val raw = pmod(h, lit(n - 1))
      val dst = when(raw >= i, raw + 1).otherwise(raw)
      concat(lit("<a href=\""), urlCol(dst), lit("\">l" + j + "</a>"))
    }
    val lang = when(i % 2 === 0, "en").otherwise("es")
    val body = format_string("Page %d in %s. The quick crawl indexed node %d.",
      i, lang, i)
    val html = concat(
      lit("<html><head><title>p"), i.cast("string"), lit("</title>"),
      lit("<script>var x=1;</script></head><body><p>"),
      body,
      lit("</p>"),
      concat(anchors: _*),
      lit("</body></html>"))
    spark.range(n).select(
      urlCol(i).as("url"),
      (lit(1767225600L) + i).cast("timestamp").as("warc_ts"), // 2026-01-01 + i s
      html.cast("binary").as("html"),
      body.as("text"),
      lang.as("lang"))
  }
}
