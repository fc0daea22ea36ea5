package graft

import graft.functions.{NfcKernel, NfcNormalize}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** NfcNormalize pins: composed/decomposed unification, idempotence,
  * ASCII fast-path reference identity, null preservation, and the
  * dedup-key use through Spark. (The registered query's oracle is
  * DuckDB's independent nfc_normalize — the cross-engine check.) */
class NfcSpec extends GraftSpec {
  import spark.implicits._

  private def nfc(s: String): String = NfcKernel.nfc(UTF8String.fromString(s)).toString

  test("composed and decomposed forms unify; idempotent; ASCII identity") {
    val decomposed = "caf" + "e\u0301"
    val composed = "caf\u00E9"
    assert(nfc(decomposed) == composed)
    assert(nfc(composed) == composed)
    assert(nfc(nfc(decomposed)) == nfc(decomposed))
    val ascii = UTF8String.fromString("plain ascii text 123")
    assert(NfcKernel.nfc(ascii) eq ascii) // fast path: same reference
    assert(nfc("plain ascii text 123") == "plain ascii text 123")
    // Hangul LV composition and a combining ring
    assert(nfc("\u1100\u1161") == "\uAC00")
    assert(nfc("a\u030A") == "\u00E5")
  }

  test("dedup keys unify through Spark") {
    val df = Seq((1L, "e\u0301"), (2L, "\u00E9")).toDF("id", "t")
      .select(col("id"), md5(NfcNormalize(col("t"))).as("key"),
        NfcNormalize(lit(null.asInstanceOf[String])).as("n"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getString(1) == rows(1).getString(1),
      "composed and decomposed must md5 identically after NFC")
    assert(rows(0).isNullAt(2))
  }
}
