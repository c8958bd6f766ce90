package graft.ops

import graft.data.Fixtures
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over the
  * `documents` table (doc_id, text, lang, source, n_chars). All are pure
  * Column HOF expressions (split / transform / filter / aggregate) — no
  * UDFs, fully codegen-eligible, shuffle-free per-row transforms that
  * scale linearly with input splits.
  */
object TextOps {

  /** Whitespace tokens. `split` with a literal single-space pattern matches
    * DuckDB `string_split(text, ' ')` exactly on the clean corpus. */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count (op: token counting). */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))

  /** BPE-ish pre-tokenizer pattern: letter runs, digit runs, single
    * non-alphanumeric marks (the GPT-2 pre-tokenizer shape reduced to
    * character classes both Java regex and RE2 interpret identically, so
    * the DuckDB twin is bit-exact). */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** Subword-style token count: number of BPE-ish pre-token matches —
    * the LLM-pipeline "token budget" estimate next to the whitespace
    * count. Pure regexp_count Column, codegen'd, shuffle-free. */
  def tokenCountBpe(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      regexp_count(col("text"), lit(BpeTokenPattern)).cast("long").as("n_bpe_tokens"))

  /** (token count, stopword count, char length) per doc as a typed
    * kernel. The Column form (`size(filter(toks, _.isin(stopwords)))`)
    * runs the lambda INTERPRETED per token — the measured ~3 µs/call HOF
    * tax over 100 TB of text is exactly the case for a per-partition
    * loop. Split semantics mirror Spark/DuckDB `split(text, ' ')`
    * (trailing empties kept: limit -1). */
  private def tokenStats(docs: DataFrame): org.apache.spark.sql.Dataset[(Long, Long, Long, Long)] = {
    import docs.sparkSession.implicits._
    val stop = Fixtures.stopwords.toSet
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val toks = text.split(" ", -1)
        var nStop = 0L
        var i = 0
        while (i < toks.length) { if (stop.contains(toks(i))) nStop += 1; i += 1 }
        (id, toks.length.toLong, nStop, text.length.toLong)
      })
  }

  /** Quality scoring: token count, stopword count/ratio, mean token length.
    * Integer counts + one final division — bit-identical to the SQL twin. */
  def quality(docs: DataFrame): DataFrame =
    tokenStats(docs).toDF("doc_id", "n_tokens", "n_stop", "len")
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_stop"),
        (col("n_stop") / col("n_tokens")).as("stop_ratio"),
        ((col("len") - col("n_tokens") + lit(1)) / col("n_tokens")).as("avg_token_len"))

  /** Heuristic language ID: stopword-ratio thresholds (the n-gram heuristic
    * degenerates to this on the synthetic corpus; the rule is the contract,
    * shared with the SQL twin). */
  def langId(docs: DataFrame): DataFrame = {
    val ratio = col("n_stop") / col("n_tokens")
    tokenStats(docs).toDF("doc_id", "n_tokens", "n_stop", "len")
      .select(col("doc_id"),
        when(ratio >= 0.08, "en").when(ratio >= 0.03, "en-ish").otherwise("unk")
          .as("lang_pred"))
  }

  /** Document fingerprint: min over 5-gram shingle hash values — a
    * 64-bit content-defined fingerprint (single-hash MinHash). Typed
    * kernel over [[graft.ops.Dedup.hash64]] (the per-shingle hash lambda
    * would run interpreted as a Column HOF). Not SQL-expressible →
    * rows-only driver check; pinned by the determinism +
    * parallelism-invariance spec. */
  def fingerprint(docs: DataFrame, k: Int = 5): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val toks = text.split(" ", -1) // limit -1: same tokens as tokenStats / Spark split
        if (toks.length < k) Iterator.empty
        else {
          var m = Long.MaxValue
          toks.sliding(k).foreach { w =>
            val h = Dedup.hash64(w.mkString(" "))
            if (h < m) m = h
          }
          Iterator.single((id, m))
        }
      })
      .toDF("doc_id", "fingerprint")
  }
}
