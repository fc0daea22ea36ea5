package graft

import graft.functions.HtmlKernel
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Pins HtmlKernel (the fused extraction kernel) byte-identical to the
 * htmlToText regex chain. Two layers:
 *
 *  1. off-Spark, high-volume: the chain replayed with the SAME
 *     java.util.regex passes Spark's regexp_replace runs, against the
 *     kernel, over adversarial fixtures and thousands of ScalaCheck
 *     tag-soup samples (cheap — no Spark job per case);
 *  2. on-Spark: the actual Column chain vs the fused codegen'd
 *     expression on one DataFrame of the same fixtures — this leg pins
 *     that the off-Spark replay IS what Spark computes (regexp_replace /
 *     StringReplace semantics, UTF8String round-trip, generated code).
 */
class HtmlFusedSpec extends GraftSpec {
  import spark.implicits._

  /** The htmlToText chain, pass for pass, on the JVM regex engine. */
  private def chainRef(s0: String): String = {
    var s = s0
    s = s.replaceAll("(?is)<script[^>]*>.*?</script>", " ")
    s = s.replaceAll("(?is)<style[^>]*>.*?</style>", " ")
    s = s.replaceAll("(?s)<!--.*?-->", " ")
    s = s.replaceAll(
      "(?i)</?(?:br|p|div|li|ul|ol|table|tr|blockquote|pre|hr|h[1-6])\\b[^>]*>",
      "\n")
    s = s.replaceAll("<[^>]*>", " ")
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foreach { case (f, t) => s = s.replace(f, t) }
    s = s.replaceAll("[^\\S\\n]+", " ")
    s = s.replaceAll(" ?\\n ?", "\n")
    s = s.replaceAll("\\n+", "\n")
    s.replaceAll("^\\s+|\\s+$", "")
  }

  /** Every divergence mode called out in HtmlKernel's scaladoc. */
  private val fixtures: Seq[String] = Seq(
    "",
    "plain text, no markup at all",
    "<html><head><title>t</title></head><body><p>hi</p></body></html>",
    // script/style: unclosed, attribute '>', case variants, overlap order
    "<script>unclosed never ends",
    "<script src=\"x\">a</script>tail",
    "<SCRIPT a>b</ScRiPt>c<style>d</STYLE>e",
    "<script foo=\"a>b\">x</script>kept",
    "<style>a<script>b</style>c</script>",          // script pass wins first
    "<scr<!---->ipt>seen</script>",                  // comment pass is later
    "<bloc\u212Aquote>KELVIN is not k</blockquote>", // ASCII-only fold
    "<scripts>not the [^>]* you expect</scripts>x</script>",
    // comments: empty, dashes, unterminated
    "a<!---->b", "a<!--->b", "a<!-- <p>x</p> -->b", "a<!--unterminated",
    // block tags: boundary, prefixes, attrs, slash forms, case
    "<p>a</p><P CLASS=x>b</P><pre>c</pre><pressure>d</pressure>",
    "<h1>x</h1><h6>y</h6><h7>z</h7><hr/><br >q",
    "<table><tr><li>i</li></tr></table><blockquote cite='s'>q</blockquote>",
    "<ul><ol><div>v</div></ol></ul></p junk>tail",
    "<a<p>b>",                                       // block pass before strip
    "<p<br>",                                        // nested tag-open soup
    "<div", "</div", "</>", "<>", "< >", "a < b > c",
    // entities incl. the &amp;-last convention and non-rescan
    "&lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b",
    "&amp;lt; stays &lt;", "&amp;amp; stays &amp;", "&&lt;&",
    "&LT; is not an entity", "&#039; is not &#39;x",
    // whitespace: every \s char, runs, edges, unicode non-\s
    " \t\r\n\f mixed \r\n\r run \t",
    "\n\nleading and trailing\n\n",
    "a b c",                               // NOT Java \s: kept
    "one  two\tthree\rfour\nfive \n six",
    // full pages
    "<html><head><style>p{c:1}</style><script>if(a<b){x()}</script></head>" +
      "<body><!-- c --><h1>T</h1>\n<p>Tom &amp; Jerry &lt;3</p>\n" +
      "<p>body&nbsp;&quot;end&quot;</p></body></html>")

  private val soupGen: Gen[String] = {
    val frags = Gen.oneOf(
      "<", ">", "/", "!", "-", "--", "<!--", "-->", "script", "SCRIPT",
      "sCrIpT", "style", "<script", "</script>", "<script>", "<style>",
      "</style>", "<p", "p>", "<p>", "</p>", "<br/>", "<BR>", "<pre>",
      "<pressure>", "<hr>", "<h1>", "<h7>", "<table", "tr", "li>", "&",
      ";", "&amp;", "&lt;", "&amp;lt;", "&nbsp;", "&#39;", "&quo", "t;",
      " ", "  ", "\t", "\n", "\r\n", "\u000B", "\f", "a", "b", "Zz", "0_",
      "é", "K", "x<y", "a>b")
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, frags)).map(_.mkString)
  }

  private def samples(n: Int): Seq[String] =
    (0 until n).flatMap(i =>
      soupGen.apply(Gen.Parameters.default, Seed(424200L + i)))

  test("kernel equals the regex chain on fixtures and 4000 soup samples") {
    (fixtures ++ samples(4000)).foreach { s =>
      val got = HtmlKernel.extract(s)
      val want = chainRef(s)
      assert(got == want,
        s"fused kernel diverges on ${s.take(120).replace("\n", "\\n")}: " +
          s"got [${got.take(120)}] want [${want.take(120)}]")
    }
  }

  test("fused Column equals the htmlToText Column chain through Spark") {
    val rows = (fixtures ++ samples(60)).zipWithIndex.map(_.swap)
    val df = rows.toDF("id", "html")
    val out = df.select(col("id"),
        TextAnalysis.htmlToText(col("html")).as("chain"),
        TextAnalysis.htmlToTextFused(col("html")).as("fused"))
      .collect()
    out.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"row ${r.getInt(0)}: chain [${r.getString(1)}] " +
          s"fused [${r.getString(2)}]")
    }
  }

  test("fused extraction is null-preserving") {
    val df = Seq((1L, null: String), (2L, "<p>x</p>")).toDF("id", "html")
    val got = df.select(col("id"),
        TextAnalysis.htmlToTextFused(col("html")).as("t"))
      .orderBy("id").collect()
    assert(got(0).isNullAt(1))
    assert(got(1).getString(1) == "x")
  }
}
