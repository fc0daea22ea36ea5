package graft

import graft.functions.{PslDomain, PslKernel}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class PslSpec extends GraftSpec {
  import spark.implicits._

  private def reg(h: String): String = PslKernel.registrableJvm(h)

  test("rule classes: default, exact, prefecture, wildcard, exception") {
    // implicit default rule `*`: TLD is the suffix
    assert(reg("www.example.com") == "example.com")
    assert(reg("a.b.c.example.org") == "example.org")
    // 2-label exact rule -> 3-label registrable
    assert(reg("www.shop.example.co.uk") == "example.co.uk")
    // JP prefecture rule: every label left of pref.aichi.jp falls away
    assert(reg("www.example7.pref.aichi.jp") == "pref.aichi.jp")
    assert(reg("www.city.shizuoka.jp") == "city.shizuoka.jp")
    // organizational JP rules still apply
    assert(reg("a.b.example.co.jp") == "example.co.jp")
    // *.ck wildcard: registrations live at the third level
    assert(reg("www.shop.biy.ck") == "shop.biy.ck")
    // !www.ck exception beats the wildcard: www.ck itself registrable
    assert(reg("www.ck") == "www.ck")
    assert(reg("a.www.ck") == "www.ck")
    // designated-city wildcards with !city exceptions
    assert(reg("x.chuo.nagoya.jp") == "x.chuo.nagoya.jp")
    assert(reg("www.city.nagoya.jp") == "city.nagoya.jp")
    // *.sch.uk: 4-label registrable
    assert(reg("www.akiss.sch.uk") == "www.akiss.sch.uk")
    // US k12 third-level family
    assert(reg("www.district.k12.ca.us") == "district.k12.ca.us")
  }

  test("degenerate hosts degrade instead of failing") {
    assert(reg("co.uk") == "co.uk")       // host IS a suffix
    assert(reg("aichi.jp") == "aichi.jp")
    assert(reg("ck") == "ck")
    assert(reg("localhost") == "localhost") // single label
    assert(reg("") == "")
  }

  test("legacy curated two-label subset is preserved under the full algorithm") {
    // every entry of the superseded heuristic set must key identically —
    // except sch.uk, which the heuristic had WRONG (PSL says *.sch.uk,
    // so schools register at the fourth level)
    TextAnalysis.publicSuffixSnapshot.filterNot(_ == "sch.uk").foreach { s =>
      assert(reg(s"www.site.$s") == s"site.$s", s"suffix $s")
    }
  }

  test("IDN hosts unify to punycode: normalize, domain, and fast path") {
    import graft.functions.IdnKernel
    import org.apache.spark.unsafe.types.UTF8String
    def idn(s: String): String = IdnKernel.toAscii(UTF8String.fromString(s)).toString
    // the RFC 3492 canonical example + multi-label + identity on ACE
    assert(idn("bücher.de") == "xn--bcher-kva.de")
    assert(idn("www.bücher.de") == "www.xn--bcher-kva.de")
    assert(idn("xn--bcher-kva.de") == "xn--bcher-kva.de") // already ACE
    assert(idn("plain.example.com") == "plain.example.com") // ASCII fast path
    // both spellings of the same host produce ONE normalized URL + domain
    val got = Seq("http://BÜCHER.de:80/A", "http://xn--bcher-kva.de/A")
      .toDF("url")
      .select(TextAnalysis.urlNormalize(col("url")).as("u"),
        TextAnalysis.urlDomain(col("url")).as("d"))
      .as[(String, String)].collect().toSeq
    assert(got.distinct == Seq(("http://xn--bcher-kva.de/A", "xn--bcher-kva.de")))
    // non-default ports survive IDN splitting
    val p = Seq("http://bücher.de:8080/A").toDF("url")
      .select(TextAnalysis.urlNormalize(col("url"))).as[String].head()
    assert(p == "http://xn--bcher-kva.de:8080/A")
  }

  test("PslDomain column expression and urlDomain end-to-end") {
    val got = Seq(
      "HTTP://WWW.Example3.CO.UK:80/Path",
      "https://sub.town.pref.aichi.jp/x?q=1",
      "http://WWW.CK/a",
      "http://deep.shop.biy.ck/",
      "http://plain.example.com#frag")
      .toDF("url")
      .select(TextAnalysis.urlDomain(col("url")).as("d"))
      .as[String].collect().toSeq
    assert(got == Seq("example3.co.uk", "pref.aichi.jp", "www.ck",
      "shop.biy.ck", "example.com"))
    // null-preserving native expression
    val n = Seq((1L, null: String)).toDF("id", "host")
      .select(PslDomain(col("host"))).collect()
    assert(n.head.isNullAt(0))
  }
}
