package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the `documents`
  * table `(doc_id, text, lang, source, n_chars)`: token counting, quality
  * scoring, language-ID heuristic, document fingerprinting.
  *
  * All pure `functions._` expressions (whole-stage codegen, no UDFs): a
  * 100 TB corpus pass stays scan-dominated with zero extra shuffles for the
  * per-document metrics (shuffles only where grouping is semantic, e.g.
  * fingerprint dedup groups).
  */
object TextOps {

  /** Whitespace word list, empty-token free (portable semantics: split on
    * single space + drop empties — identical in DuckDB via list_filter).
    */
  def words(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Token counting: whitespace words + a BPE-ish subword estimate
    * (ceil(chars-without-spaces / 4) — the common ~4-chars/token rule).
    */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val chars = length(col("text"))
    val spaces = chars - length(regexp_replace(col("text"), " ", ""))
    docs.select(
      col("doc_id"),
      size(words(col("text"))).as("n_words"),
      chars.as("n_chars"),
      ceil((chars - spaces).cast("double") / 4.0).cast("bigint")
        .as("n_subword_est"))
  }

  /** Quality scoring: lexical diversity + length band, deterministic
    * arithmetic only (single divisions of exact ints → engine-portable).
    */
  def qualityScores(docs: DataFrame): DataFrame = {
    val ws = words(col("text"))
    val nWords = size(ws).cast("double")
    val nDistinct = size(array_distinct(ws)).cast("double")
    val ttr = when(nWords > 0, nDistinct / nWords).otherwise(0.0)
    val lenScore = least(lit(1.0), nWords / 100.0)
    docs.select(
      col("doc_id"),
      size(ws).as("n_words"),
      size(array_distinct(ws)).as("n_distinct_words"),
      ttr.as("ttr"),
      lenScore.as("len_score"),
      (lenScore * ttr).as("quality"))
  }

  /** Language-ID heuristic: stopword-marker votes. Deliberately simple and
    * deterministic (an n-gram heuristic, not a model) so the oracle can
    * recompute it; emits the predicted language per document.
    */
  def langId(docs: DataFrame): DataFrame = {
    val t = concat(lit(" "), col("text"), lit(" "))
    val en = t.contains(" the ").cast("int") + t.contains(" a ").cast("int") +
      t.contains(" is ").cast("int")
    val de = t.contains(" der ").cast("int") + t.contains(" und ").cast("int") +
      t.contains(" ist ").cast("int")
    val fr = t.contains(" le ").cast("int") + t.contains(" et ").cast("int") +
      t.contains(" est ").cast("int")
    docs.select(col("doc_id"), col("lang"),
      when(en >= de && en >= fr && en > 0, "en")
        .when(de >= fr && de > 0, "de")
        .when(fr > 0, "fr")
        .otherwise("unknown").as("predicted"))
  }

  /** BPE-ish regex tokenization: letter runs | digit runs | punctuation
    * runs — the shape of a GPT-2-style pre-tokenizer pattern, restricted to
    * constructs Java regex and RE2 (DuckDB) match identically.
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeishPattern), lit(0))

  /** Token counts under the BPE-ish pre-tokenizer (compare n_words from
    * [[tokenCounts]]: whitespace splitting undercounts punctuation-heavy
    * text).
    *
    * The extraction is STAGED through its own projection so the regex runs
    * once per row — inlining `bpeishTokens` twice (raw + under
    * array_distinct) evaluates the pattern twice per row (measured ~2×
    * the scan cost; CollapseProject keeps the stage because the non-cheap
    * alias is referenced more than once).
    */
  def bpeishTokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), bpeishTokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n_bpeish"),
        size(array_distinct(col("toks"))).as("n_bpeish_distinct"))

  /** Document fingerprint: md5 of the sorted distinct word set — the
    * canonical-form fingerprint used for exact near-order-insensitive dedup.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(words(text)))))

  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    * MOSS scheme; cf. PAPERS.md): the given gram sequence is hashed, then
    * the minimum hash of every w-gram window selected — any shared gram
    * run of length ≥ w+|gram|-1 guarantees a shared fingerprint. Returns
    * the sorted distinct selected hashes as `array<bigint>`.
    *
    * Grams are a caller-supplied array column (word shingles via
    * [[graft.operators.DedupOps.shingles]] in the engine queries —
    * character k-grams are expressible too but cost ~6× the hash calls for
    * prose, and the per-gram hash is an interpreted lambda: measured 860 s
    * vs <10 s at sf0.1). `gramHash` is pluggable like SimHash's word hash:
    * xxhash64 for production, [[graft.operators.DedupOps.md5WordHash60]]
    * for oracle-replication.
    */
  def winnowFingerprints(grams: Column, w: Int,
      gramHash: Column => Column): Column =
    winnowSelect(transform(grams, g => gramHash(g)), w)

  /** Window-min selection over a PRE-HASHED gram array.
    *
    * CRITICAL at scale: `hs` must be a materialized COLUMN (stage the hash
    * transform through its own projection), not an inline expression —
    * interpreted HOF lambdas get no common-subexpression elimination, so
    * an inline `hs` is re-evaluated once PER WINDOW, turning O(n·w) into
    * O(n²·hash) (measured 104 s vs 3 s at sf0.1). [[winnowFingerprints]]
    * is the convenience single-expression form for small inputs;
    * [[graft.operators.DedupOps.winnowDuplicates]] stages it.
    */
  def winnowSelect(hs: Column, w: Int): Column = {
    val windows = when(size(hs) >= w,
      transform(sequence(lit(0), size(hs) - w),
        i => array_min(slice(hs, i + 1, lit(w)))))
      .otherwise(array(array_min(hs)))
    array_sort(array_distinct(windows))
  }
}
