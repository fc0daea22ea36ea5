package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding TRAINING (Sennrich et al. 2016, §3.2's algorithm):
 * learn the top-N merges from the corpus's own word frequencies. The
 * complement of [[graft.functions.BpeTokenizer]]'s fixed-merges APPLY
 * side — together they close the tokenizer loop: train on a corpus,
 * budget/pack any corpus in the learned subword units.
 *
 * The algorithm trains on the word-frequency DICTIONARY, not the
 * corpus (Sennrich's own implementation does exactly this): the corpus
 * is touched ONCE for a vocab-keyed word count — a partial-agg shuffle
 * whose exchange carries vocabulary, never data — then a bounded
 * top-`vocabCap` slice (TakeOrderedAndProject, ties broken by word) is
 * collected and the merge loop runs on the driver in
 * O(nMerges × vocab × wordLen). At 100 TB that is the same scan cost
 * as q_vocab; Zipf guarantees the capped dictionary carries ~all of
 * the corpus's token mass, and the driver state is O(vocabCap) by
 * construction — the capped-collect house rule, not a corpus collect.
 *
 * Exactness contract (the DuckDB oracle replays training merge by
 * merge, unrolled like the q_fcm_fit oracle):
 *  - words: lowercase whitespace split, empties dropped;
 *  - a word's form is the sentinel-space-delimited codepoint string
 *    (" a b c "), the SAME shape as the apply walk;
 *  - pair counts: every ADJACENT index pair of the current form,
 *    overlaps included ("a a a" counts (a,a) twice), weighted by word
 *    frequency (long sums — order-free);
 *  - best pair: (count desc, left asc, right asc) — byte order equals
 *    Java order on this corpus's ASCII vocabulary;
 *  - apply: literal leftmost non-overlapping `String.replace` of
 *    " a b " with " ab ", repeated to fixpoint — the identical
 *    fixpoint the apply walk and SQL replace() share.
 *
 * Output: one row per learned merge — (rank 1-based, lhs, rhs,
 * pair_count at merge time).
 */
object BpeTrain {

  private def toForm(word: String): String = {
    val sb = new java.lang.StringBuilder(word.length * 2 + 2)
    sb.append(' ')
    word.codePoints().forEach { cp => sb.appendCodePoint(cp); sb.append(' '); () }
    sb.toString
  }

  /** One fixpoint merge application (see the exactness contract). */
  private def applyMerge(form: String, pat: String, rep: String): String = {
    var s = form
    var next = s.replace(pat, rep)
    while (next != s) { s = next; next = s.replace(pat, rep) }
    s
  }

  /** The driver-side merge loop over a (form, freq) dictionary. Returns
    * exactly nMerges rows; throws if the dictionary merges to single
    * tokens first (raise the corpus or lower nMerges — fail fast, the
    * oracle cannot represent a short table). */
  private[graft] def trainOnDict(dict: Array[(String, Long)],
                                     nMerges: Int): Array[(Int, String, String, Long)] = {
    var forms = dict.map { case (w, f) => (toForm(w), f) }
    val out = Array.newBuilder[(Int, String, String, Long)]
    var k = 1
    while (k <= nMerges) {
      val counts = new java.util.HashMap[(String, String), Long]()
      forms.foreach { case (form, freq) =>
        val toks = form.trim.split(" ")
        var i = 0
        while (i < toks.length - 1) {
          val key = (toks(i), toks(i + 1))
          counts.merge(key, freq, (a, b) => a + b)
          i += 1
        }
      }
      require(!counts.isEmpty,
        s"BPE training exhausted adjacent pairs after ${k - 1} merges; asked for $nMerges")
      var best: ((String, String), Long) = null
      counts.forEach { (p, c) =>
        if (best == null || c > best._2 ||
          (c == best._2 && (p._1 < best._1._1 ||
            (p._1 == best._1._1 && p._2 < best._1._2)))) best = (p, c)
      }
      val ((a, b), cnt) = best
      out += ((k, a, b, cnt))
      val (pat, rep) = (s" $a $b ", s" $a$b ")
      forms = forms.map { case (form, freq) => (applyMerge(form, pat, rep), freq) }
      k += 1
    }
    out.result()
  }

  /** Corpus entry: one scan → vocab counts → bounded top-`vocabCap`
    * dictionary → driver merge loop. Eager (the collect runs at build,
    * like the other model-fitting queries). */
  def bpeTrain(df: DataFrame, textCol: String,
               vocabCap: Int, nMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dict = df.filter(col(textCol).isNotNull)
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w").asc)
      .limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainOnDict(dict, nMerges)
      .toSeq.toDF("rank", "lhs", "rhs", "pair_count")
  }
}
