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

  /** Word k-gram shingles, distinct, 1-based positions — twin of the DuckDB
    * `list_distinct(list_transform(range(1, len(t)-k+2), ...))` form.
    * Caller must pre-filter size >= k (Spark `sequence` would descend on a
    * negative span where DuckDB `range` returns empty). */
  def shingles(toks: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), size(toks) - (k - 1)),
      i => concat_ws(" ", (0 until k).map(o => element_at(toks, i + o)): _*)))

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

  /** Quality scoring: token count, stopword count/ratio, mean token length.
    * Integer counts + one final division — bit-identical to the SQL twin. */
  def quality(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val nStop = size(filter(toks, t => t.isin(Fixtures.stopwords: _*))).cast("long")
    docs.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      nStop.as("n_stop"),
      (nStop / nTok).as("stop_ratio"),
      ((length(col("text")) - nTok + lit(1)) / nTok).as("avg_token_len"))
  }

  /** Heuristic language ID: stopword-ratio thresholds (the n-gram heuristic
    * degenerates to this on the synthetic corpus; the rule is the contract,
    * shared with the SQL twin). */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val ratio = size(filter(toks, t => t.isin(Fixtures.stopwords: _*))).cast("long") /
      size(toks).cast("long")
    docs.select(col("doc_id"),
      when(ratio >= 0.08, "en").when(ratio >= 0.03, "en-ish").otherwise("unk")
        .as("lang_pred"))
  }

  /** Document fingerprint: min over 5-gram shingle xxhash64 values — a
    * 64-bit content-defined fingerprint (single-hash MinHash). Not
    * SQL-expressible (xxhash64) → rows-only driver check; pinned instead by
    * the determinism + parallelism-invariance spec. */
  def fingerprint(docs: DataFrame, k: Int = 5): DataFrame =
    docs.filter(size(tokens(col("text"))) >= k)
      .select(col("doc_id"),
        array_min(transform(shingles(tokens(col("text")), k), s => xxhash64(s)))
          .as("fingerprint"))
}
