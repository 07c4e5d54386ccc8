package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for a training-data pipeline:
  *
  *  - [[exactDuplicates]] — hash-groupBy on a canonical fingerprint.
  *  - [[minHashCandidates]]/[[minHashDuplicates]] — MinHash + LSH banding:
  *    shingle → k minhashes → band keys → shuffle on band key → candidate
  *    pairs → exact Jaccard verify. The scale path: candidate generation is
  *    one shuffle on the band key; no all-pairs join ever materializes.
  *  - [[simHash]]/[[simHashDuplicates]] — 64-bit SimHash with banded
  *    Hamming-distance candidate buckets.
  *  - [[ngramJaccardPairs]] — exact n-gram Jaccard for a candidate pair set.
  *  - [[embeddingNearDuplicates]] — cosine near-dup via hyperplane-LSH
  *    buckets + exact verify (see also [[SimilarityOps]]).
  *
  * Everything is DataFrame expressions; hashes are xxhash64 (Spark-native,
  * codegen'd, deterministic).
  */
object DedupOps {

  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger(getClass)

  // ---- hot-bucket guard ---------------------------------------------------

  /** Drop LSH buckets larger than `cap` before the candidate self-join.
    *
    * The self-join on a bucket key is quadratic WITHIN a bucket: one
    * degenerate key (boilerplate docs, an all-identical band) produces
    * O(n²) candidate rows that no AQE skew-split can cap — skew handling
    * splits the partition, not the row count. Capping is the standard
    * production guard: a bucket over `cap` is by definition not a useful
    * near-dup signal (its members are caught by the exact-dup pass), so it
    * is dropped whole. `oversizedBuckets` reports what was dropped so the
    * pipeline can surface it (cf. the reference's explicit known-issue
    * allowlist, /root/reference/extraction/test/test_profiles.py:166-180).
    *
    * Cost: ~zero. The guard is a count-over-window filter partitioned by
    * the bucket key — the window's hash partitioning is exactly what the
    * candidate self-join needs next, so no extra pass over the (expensive)
    * signature computation and no extra shuffle; a count+anti-join guard
    * would re-evaluate the bands subplan a third time.
    */
  private def capBuckets(
      b: DataFrame, keyCols: Seq[String], cap: Int): DataFrame = {
    log.info(s"LSH bucket cap = $cap on keys ${keyCols.mkString(",")}")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    b.withColumn("_bucket_n", count(lit(1)).over(w))
      .where(col("_bucket_n") <= cap)
      .drop("_bucket_n")
  }

  /** The buckets the guard would drop: (keyCols…, bucket_n). Empty on
    * healthy data; monitor/log it in production.
    */
  def oversizedBuckets(
      b: DataFrame, keyCols: Seq[String], cap: Int): DataFrame =
    b.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") > cap)

  // ---- exact -----------------------------------------------------------

  /** Exact duplicate groups by fingerprint; keeper = min(doc_id).
    *
    * Shape: window aggregates over `fp` rather than groupBy + self-join —
    * the fingerprint (md5 over the sorted distinct word set) is the
    * expensive part, and the join formulation evaluates it TWICE (probe +
    * build side); the window computes it once and shuffles only the slim
    * (doc_id, fp) projection. One shuffle either way.
    */
  def exactDuplicates(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    TextOps.fingerprints(docs)
      .select(col("doc_id"), col("fp"),
        count(lit(1)).over(w).as("group_size"),
        min(col("doc_id")).over(w).as("keeper"))
      .where(col("group_size") > 1)
      .select(col("doc_id"), col("fp"), col("group_size"), col("keeper"),
        (col("doc_id") === col("keeper")).as("keep"))
  }

  /** Cross-source duplicate OVERLAP matrix: for every source pair, how many
    * distinct fingerprints both contain — the domain-contamination view of
    * exact dedup ("how much of domain A is republished in domain B"), the
    * aggregate a mixing strategy reads before weighting sources.
    *
    * Shape: distinct (fp, source) — one aggregate over the slim fingerprint
    * projection — then a self-join keyed on `fp`. The join's per-key frames
    * are the SOURCES sharing a fingerprint (bounded by |sources|, never by
    * corpus size), so the worst row explosion is |sources|² per duplicated
    * fingerprint; the output matrix is |sources|² rows total.
    */
  def sourceOverlapMatrix(docs: DataFrame): DataFrame = {
    val fpSrc = docs
      .select(col("source"), TextOps.fingerprint(col("text")).as("fp"))
      .distinct()
    fpSrc.select(col("fp"), col("source").as("source_a"))
      .join(fpSrc.select(col("fp"), col("source").as("source_b")), Seq("fp"))
      .where(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("shared_fingerprints"))
  }

  // ---- MinHash + LSH ----------------------------------------------------

  /** Word w-shingles of a text column as an array of strings.
    *
    * WARNING — O(n²) per document when used directly: `words(text)` lands
    * INSIDE the per-window lambda, and interpreted HOF lambdas get no
    * common-subexpression elimination, so the text is re-split once per
    * shingle (the charTrigrams/winnowSelect trap). Kept only as the
    * single-expression convenience form; every corpus-scale path must
    * stage the words array through its own projection and call
    * [[shinglesOfWords]] (see [[distinctShingles]]).
    */
  def shingles(text: Column, w: Int): Column =
    shinglesOfWords(TextOps.words(text), w)

  /** Word w-shingles from a PRE-MATERIALIZED words array column. `ws`
    * must be a materialized attribute (stage `TextOps.words` through its
    * own projection) so the slice inside the lambda reads a bound array —
    * O(w) per shingle instead of re-splitting the text per shingle.
    * Identical values to [[shingles]] by construction.
    */
  def shinglesOfWords(ws: Column, w: Int): Column =
    when(size(ws) >= w,
      transform(sequence(lit(0), size(ws) - w),
        i => concat_ws(" ", slice(ws, i + 1, lit(w)))))
      .otherwise(array(concat_ws(" ", ws)))

  /** (doc_id, sh): per-document DISTINCT w-shingle arrays with the words
    * array staged through its own projection (the multi-reference alias
    * survives CollapseProject, so split+filter runs once per row — measured
    * ~5× on the shingle family at sf0.1 vs the inline form).
    */
  def distinctShingles(docs: DataFrame, w: Int): DataFrame =
    docs.select(col("doc_id"), TextOps.words(col("text")).as("_ws"))
      .select(col("doc_id"),
        // non-pushable: a downstream explode's inferred filter must CHECK
        // the materialized attribute, not re-inline the chain into a
        // scan-stage Filter (TextOps.nonPushableArray)
        TextOps.nonPushableArray(
          array_distinct(shinglesOfWords(col("_ws"), w)), "string").as("sh"))

  /** k minhash values per doc as k columns `m0..m{k-1}`.
    *
    * Shape matters: explode shingles to rows, hash with k codegen'd
    * xxhash64 columns, take per-doc `min`s in one hash aggregate. This stays
    * inside whole-stage codegen end to end and the partial aggregation
    * collapses each doc's shingles map-side before the exchange — unlike the
    * "array of lambdas" formulation (transform/array_min are
    * CodegenFallback; measured 16× slower interpreted).
    */
  def minHashSignatures(docs: DataFrame, w: Int, k: Int): DataFrame = {
    val exploded = distinctShingles(docs, w)
      .select(col("doc_id"), explode(col("sh")).as("sh"))
    val mins = (0 until k).map(i =>
      min(xxhash64(col("sh"), lit(i))).as(s"m$i"))
    exploded.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** LSH banding: docs → (band_id, band_key, doc_id); docs sharing a band
    * key are candidates. bands × rowsPerBand = k.
    */
  def minHashBands(
      docs: DataFrame, w: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val sig = minHashSignatures(docs, w, bands * rowsPerBand)
    val bandStructs = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}"))
      struct(lit(b).as("band_id"), xxhash64(cols: _*).as("band_key"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_key"))
  }

  /** In-bucket candidate pairs from a collected id (or struct) array:
    * all (a, b) with b's order key strictly greater than a's. `key`
    * extracts the comparison key from an element (identity for plain id
    * arrays). Bucket-local interpreted lambdas over a cap-bounded array —
    * O(k²) pair structs per bucket BY DESIGN (the self-join formulation
    * materializes the same pairs as rows but evaluates the whole bucket
    * SUBTREE — signatures, window — twice; see [[minHashCandidates]]).
    */
  private def bucketPairs(ids: Column, key: Column => Column): Column =
    flatten(transform(ids, a =>
      transform(filter(ids, b => key(b) > key(a)), b =>
        struct(a.as("a"), b.as("b")))))

  /** Candidate pairs (doc_id < doc_id_2) from shared LSH buckets.
    *
    * Shape (round 7, guide §2.4): ONE pass — group rows by bucket key,
    * collect the member ids, drop over-cap buckets (same guard semantics
    * as [[capBuckets]]), and emit in-bucket pairs from the collected
    * array. The previous self-join formulation referenced the capped-bands
    * frame twice, so Spark evaluated the ENTIRE signature subtree (shingle
    * explode + k-minhash aggregate + cap window) once per join side — a
    * full duplicated corpus pass at scale (measured 3.4 s → ~1.9 s at
    * sf0.1). The collected array is bounded by `bucketCap`, so the pair
    * array per bucket is ≤ cap² structs — the same row count the join
    * produced, without the duplicated upstream.
    */
  def minHashCandidates(
      docs: DataFrame, w: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      bucketCap: Int = 1000): DataFrame = {
    log.info(s"LSH bucket cap = $bucketCap on keys band_id,band_key")
    minHashBands(docs, w, bands, rowsPerBand)
      .groupBy("band_id", "band_key")
      .agg(collect_list(col("doc_id")).as("ids"))
      .where(size(col("ids")).between(2, bucketCap))
      .select(explode(bucketPairs(col("ids"), identity)).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
  }

  /** Exact w-shingle Jaccard for given pairs (verify step after LSH). */
  def ngramJaccardPairs(
      docs: DataFrame, pairs: DataFrame, w: Int): DataFrame = {
    val sh = distinctShingles(docs, w)
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
          .as("jaccard"))
  }

  /** EXACT pairwise w-shingle Jaccard over every document pair sharing at
    * least one shingle — the ground-truth side of recall anchors.
    *
    * Shape (round 7, guide §3.3): ONE corpus pass. The previous
    * formulation was an all-pairs nested-loop join evaluating
    * `array_intersect`/`array_union` per pair — O(n²·|shingles|) array
    * ops (8.7 s at 500 docs). Here the inverted index does it: distinct
    * shingles explode WITH the per-doc shingle count carried alongside,
    * each shingle's members collect into one bucket, in-bucket pairs are
    * counted per (doc_a, doc_b) — giving |A∩B| — and
    * jaccard = inter / (na + nb − inter): the identical integers (hence
    * identical doubles) as the intersect/union sizes over the distinct
    * arrays. Pairs sharing NO shingle have jaccard 0 and are not emitted
    * (every caller thresholds at a positive value). No bucket cap: this
    * is the exact side by contract — bound the input slice instead.
    */
  def exactJaccardPairs(docs: DataFrame, w: Int): DataFrame = {
    val sh = distinctShingles(docs, w)
    val ex = sh.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("s"))
    ex.groupBy("s")
      .agg(collect_list(struct(col("doc_id"), col("n"))).as("ids"))
      .where(size(col("ids")) >= 2)
      .select(explode(bucketPairs(col("ids"), _.getField("doc_id"))).as("p"))
      .groupBy(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
        col("p.a.n").as("na"), col("p.b.n").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"))
          .as("jaccard"))
  }

  /** MinHash near-duplicates: LSH candidates verified by exact Jaccard ≥
    * threshold.
    */
  def minHashDuplicates(
      docs: DataFrame, w: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      threshold: Double = 0.7): DataFrame =
    ngramJaccardPairs(docs, minHashCandidates(docs, w, bands, rowsPerBand), w)
      .where(col("jaccard") >= threshold)

  // ---- SimHash -----------------------------------------------------------

  /** Default word hash: xxhash64 (codegen'd, fastest — the production
    * path).
    */
  val xxWordHash: Column => Column = w => xxhash64(w)

  /** md5-derived 60-bit word hash: `conv(substr(md5(w),1,15), 16, 10)`.
    * Slower than xxhash64 but replicable by engines without xxhash64
    * (DuckDB: `CAST('0x'||substr(md5(w),1,15) AS BIGINT)`) — the hash the
    * oracle-checked SimHash query uses. Use with `bits = 60`.
    */
  val md5WordHash60: Column => Column =
    w => conv(substring(md5(w), 1, 15), 16, 10).cast("bigint")

  /** SimHash over word hashes: bit b is 1 iff the sum of (+1/-1)
    * contributions of word-hash bit b is positive. Expressed as one explode
    * + `bits` conditional sums (single aggregation pass, codegen'd).
    * `wordHash` is pluggable (default xxhash64; [[md5WordHash60]] for
    * cross-engine replication).
    */
  def simHash(docs: DataFrame,
      wordHash: Column => Column = xxWordHash, bits: Int = 64): DataFrame = {
    require(bits >= 4 && bits <= 64)
    // distinct words staged non-pushable: the explode's inferred filter
    // otherwise re-evaluates split+filter+array_distinct per row at the
    // scan (twice: isnotnull + size>0)
    val exploded = docs
      .select(col("doc_id"),
        TextOps.nonPushableArray(
          array_distinct(TextOps.words(col("text"))), "string").as("_dws"))
      .select(col("doc_id"), explode(col("_dws")).as("word"))
      .select(col("doc_id"), wordHash(col("word")).as("h"))
    val bitSums = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b$b")
    }
    val agg = exploded.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until bits).map { b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup candidates: bucket by each of four (bits/4)-bit
    * chunks — any pair within Hamming distance 3 shares at least one exact
    * chunk by PIGEONHOLE, so for maxHamming ≤ 3 the candidate set (and
    * therefore the output) is EXACT, not approximate — then verify
    * Hamming ≤ maxHamming via bit_count.
    */
  def simHashDuplicates(
      docs: DataFrame, maxHamming: Int = 3, bucketCap: Int = 1000,
      wordHash: Column => Column = xxWordHash, bits: Int = 64): DataFrame = {
    require(bits % 4 == 0 && maxHamming < 4,
      "pigeonhole: 4 chunks cover Hamming <= 3")
    val chunkBits = bits / 4
    val chunkMask = (1L << chunkBits) - 1
    val s = simHash(docs, wordHash, bits)
    val chunks0 = s.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk_id"),
          shiftright(col("simhash"), c * chunkBits).bitwiseAND(chunkMask)
            .as("chunk_key"))): _*)).as("ch"))
      .select(col("doc_id"), col("simhash"),
        col("ch.chunk_id"), col("ch.chunk_key"))
    // one pass (guide §2.4): collect each chunk bucket's (doc_id, simhash)
    // members and emit in-bucket pairs — the self-join formulation
    // evaluated the whole SimHash aggregate once per join side
    log.info(s"LSH bucket cap = $bucketCap on keys chunk_id,chunk_key")
    chunks0
      .groupBy("chunk_id", "chunk_key")
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("ids"))
      .where(size(col("ids")).between(2, bucketCap))
      .select(explode(bucketPairs(col("ids"), _.getField("doc_id"))).as("p"))
      .select(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
        bit_count(col("p.a.simhash").bitwiseXOR(col("p.b.simhash")))
          .as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Train/eval CONTAMINATION check — the decontamination pass a training
    * pipeline runs before a corpus ships: flag corpus documents sharing at
    * least `minShared` distinct word `w`-shingles with ANY document of the
    * (small) evaluation set. Returns (doc_id, n_eval_hits, max_shared).
    *
    * Shape: the eval set is tiny by definition → its exploded shingle index
    * BROADCASTS; the corpus side is one scan + explode, and the per-(corpus
    * doc, eval doc) overlap count partial-aggregates map-side. No shuffle
    * of corpus text, no all-pairs join. `bucketCap` drops eval shingles
    * shared by more than `cap` EVAL docs (ubiquitous phrases — the same
    * guard class as the LSH caps; with a small eval set it rarely binds).
    */
  def contaminationCheck(corpus: DataFrame, evalDocs: DataFrame,
      w: Int = 3, minShared: Int = 3, bucketCap: Int = 1000): DataFrame = {
    val evalSh = capBuckets(
      distinctShingles(evalDocs, w)
        .select(col("doc_id").as("eval_id"), explode(col("sh")).as("sh")),
      Seq("sh"), bucketCap)
    val corpusSh = distinctShingles(corpus, w)
      .select(col("doc_id"), explode(col("sh")).as("sh"))
    corpusSh.join(broadcast(evalSh), Seq("sh"))
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_eval_hits"), max(col("shared")).as("max_shared"))
  }

  // ---- winnowing ----------------------------------------------------------

  /** Near-duplicates via winnowing fingerprints over word `kWords`-shingles
    * ([[TextOps.winnowFingerprints]]): inverted index on the selected
    * hashes (explode → self-join keyed by fingerprint → per-pair shared
    * count) — one shuffle keyed by fingerprint, never all-pairs; the
    * hot-bucket guard drops ubiquitous phrases. A pair is emitted when
    * it shares ≥ `minShared` fingerprints.
    */
  def winnowDuplicates(docs: DataFrame, kWords: Int = 3, w: Int = 4,
      minShared: Int = 5, bucketCap: Int = 1000,
      gramHash: Column => Column = xxWordHash): DataFrame = {
    // staged projections: words → shingle array → hashed gram array, so
    // (a) the text is split once per row, not once per shingle (the
    // interpreted-HOF CSE trap — words staged through its own projection),
    // and (b) the hashed array materializes once before the window-min
    // transform references it (see TextOps.winnowSelect)
    val hashed = docs
      .select(col("doc_id"), TextOps.words(col("text")).as("_ws"))
      .select(col("doc_id"),
        transform(shinglesOfWords(col("_ws"), kWords), g => gramHash(g))
          .as("hs"))
    // the selected-fingerprint array is staged non-pushable before the
    // explode, so the inferred size/notnull filter checks the attribute
    // instead of re-running the winnow chain below the projection
    val fps = hashed
      .select(col("doc_id"),
        TextOps.nonPushableArray(
          TextOps.winnowSelect(col("hs"), w), "bigint").as("_sel"))
      .select(col("doc_id"), explode(col("_sel")).as("fp"))
    // one pass (guide §2.4): collect each fingerprint bucket's members and
    // count in-bucket pairs — the inverted-index self-join evaluated the
    // whole winnow chain (hash transform + window mins) once per side
    log.info(s"LSH bucket cap = $bucketCap on keys fp")
    fps.groupBy("fp")
      .agg(collect_list(col("doc_id")).as("ids"))
      .where(size(col("ids")).between(2, bucketCap))
      .select(explode(bucketPairs(col("ids"), identity)).as("p"))
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  // ---- embedding near-dup -------------------------------------------------

  /** Banded hyperplane-LSH bucketing of an embedding table:
    * (vec_id, band_id, band_key) where band b's key is bits
    * [b·r, (b+1)·r) of the `bands·rowsPerBand`-plane signature — the
    * multi-table LSH layout (each band is one hash table; a pair at angle θ
    * collides in ≥1 band with probability 1-(1-(1-θ/π)^r)^b).
    */
  def embeddingBands(
      embeddings: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    require(bands * rowsPerBand <= 64, "signature packs into one long")
    val sig = embeddings.select(col("vec_id"),
      SimilarityOps.hyperplaneSignature(col("embedding"), bands * rowsPerBand)
        .as("sig"))
    sig.select(col("vec_id"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band_id"),
            shiftright(col("sig"), b * rowsPerBand)
              .bitwiseAND(lit((1L << rowsPerBand) - 1)).as("band_key"))): _*))
          .as("b"))
      .select(col("vec_id"), col("b.band_id"), col("b.band_key"))
  }

  /** Cosine near-duplicates via banded hyperplane LSH + exact cosine verify.
    *
    * Candidate generation is one shuffle keyed by (band_id, band_key) —
    * never an all-pairs join; the bands carry only vec_ids, embeddings are
    * looked up once per DISTINCT candidate pair for the exact verify.
    * Default 8 bands × 8 rows targets the near-duplicate regime
    * (cos ≥ 0.99 ⇒ collision probability ≥ 1 - 6·10⁻⁶); single-table LSH
    * with one full-signature key (the previous shape) has <10% recall for
    * anything below cos ≈ 0.98.
    */
  def embeddingNearDuplicates(
      embeddings: DataFrame, bands: Int = 8, rowsPerBand: Int = 8,
      threshold: Double = 0.99, bucketCap: Int = 1000): DataFrame = {
    // one pass (guide §2.4): collect each band bucket's vec_ids and emit
    // in-bucket pairs — the self-join formulation evaluated the banded
    // subtree (hyperplane signatures over the full table) once per side
    log.info(s"LSH bucket cap = $bucketCap on keys band_id,band_key")
    val pairs = embeddingBands(embeddings, bands, rowsPerBand)
      .groupBy("band_id", "band_key")
      .agg(collect_list(col("vec_id")).as("ids"))
      .where(size(col("ids")).between(2, bucketCap))
      .select(explode(bucketPairs(col("ids"), identity)).as("p"))
      .select(col("p.a").as("vec_a"), col("p.b").as("vec_b"))
      .distinct()
    pairs
      .join(embeddings.select(col("vec_id").as("vec_a"),
        col("embedding").as("emb_a")), Seq("vec_a"))
      .join(embeddings.select(col("vec_id").as("vec_b"),
        col("embedding").as("emb_b")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        SimilarityOps.cosine(col("emb_a"), col("emb_b")).as("cos"))
      .where(col("cos") >= threshold)
  }

  // ---- duplicate-cluster resolution --------------------------------------

  /** Connected components over an undirected near-duplicate PAIR table —
    * the resolution step every dedup pipeline needs after candidate
    * generation: near-duplicate similarity is NOT transitive, so pairs must
    * be closed into clusters before "keep one document per cluster" is
    * well-defined (exact dedup gets this for free — equal fingerprints ARE
    * an equivalence class — near-dup pairs do not).
    *
    * Algorithm: iterative min-label propagation (the hash-to-min shape of
    * Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14 — cf. PAPERS.md): every node starts labeled with itself; each
    * round joins labels across edges and keeps the per-node min; fixpoint
    * when no label changes. Rounds = O(cluster diameter) — near-dup
    * clusters are shallow (most are cliques from a shared bucket), so this
    * converges in 2-3 rounds where the worst case is a path graph. Each
    * round is one shuffle of the (node, label) frame keyed by node — the
    * pair table is orders of magnitude smaller than the corpus, so the loop
    * costs nothing against the candidate-generation scan. The driver-side
    * convergence check is one count per round (explicit control flow, same
    * class as k-means).
    *
    * Output: (doc_id, cluster_id) for every doc appearing in a pair, with
    * cluster_id = min doc_id of its component (deterministic canonical
    * representative).
    *
    * Convergence contract (VERDICT r4): exiting at `maxIters` without a
    * fixpoint means some labels are WRONG (a component longer than
    * `maxIters` hops is still split) — [[connectedComponents]] THROWS
    * rather than returning silently-wrong cluster ids;
    * [[connectedComponentsWithStats]] returns the labels together with
    * (converged, rounds) for callers that want to inspect or resume.
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b",
      maxIters: Int = 20): DataFrame = {
    val r = connectedComponentsWithStats(pairs, aCol, bCol, maxIters)
    if (!r.converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds " +
          s"(${r.lastChanged} labels still changing): a component's " +
          "diameter exceeds maxIters — raise it (rounds needed = longest " +
          "chain of near-duplicate hops)")
    r.labels
  }

  /** Label-propagation outcome: `labels` is (doc_id, cluster_id);
    * `converged` is the fixpoint flag; `rounds` is the number of
    * propagation rounds executed; `lastChanged` is the number of labels
    * that changed in the final round (0 iff converged).
    */
  final case class CCResult(
      labels: DataFrame, converged: Boolean, rounds: Int, lastChanged: Long)

  /** [[connectedComponents]] without the unconverged-exit throw. */
  def connectedComponentsWithStats(
      pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b",
      maxIters: Int = 20): CCResult = {
    val fwd = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    // localCheckpoint (eager), not persist: an iterative frame must CUT its
    // lineage each round or the logical plan embeds the whole union/join
    // history — O(rounds) plan growth, quadratic re-analysis cost, and a
    // lost-partition recompute that replays every round from the scan.
    // Truncation trades that for executor-local storage of a (node, label)
    // frame, which is pair-table-sized.
    val edges = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    var lastChanged = 0L
    while (!converged && i < maxIters) {
      val viaEdges = edges
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src").as("node"), col("label"))
      val next = labels.unionByName(viaEdges)
        .groupBy("node").agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      val changed = next.join(
          labels.withColumnRenamed("label", "_old"), Seq("node"))
        .where(col("label") =!= col("_old")).count()
      labels = next
      lastChanged = changed
      converged = changed == 0
      i += 1
    }
    CCResult(
      labels.select(col("node").as("doc_id"), col("label").as("cluster_id")),
      converged, i, lastChanged)
  }

  /** INCREMENTAL ingest dedup: a new batch checked against the STORED
    * fingerprint index of everything already admitted — the steady-state
    * form of exact dedup (a growing corpus never re-deduplicates itself;
    * it gates each arriving batch). Per new document: duplicate-of-history
    * (fingerprint already indexed), duplicate-within-batch (not the
    * batch's keeper for its fingerprint), and the admit verdict; admitted
    * fingerprints are what the caller appends back to the index.
    *
    * Scale shape: the history index is corpus-sized but slim (fp only,
    * stored bucketed by fp); the arriving batch is small by definition —
    * the join broadcasts the BATCH side against the bucketed index scan
    * (or prunes it to the batch's fp buckets), never shuffling history.
    * Within-batch keeper choice windows over batch-sized fp frames.
    */
  def incrementalDedup(newDocs: DataFrame, knownFps: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    val hist = knownFps.select(col("fp")).distinct()
      .withColumn("_hist", lit(true))
    TextOps.fingerprints(newDocs)
      .join(hist, Seq("fp"), "left")
      .select(col("doc_id"), col("fp"),
        coalesce(col("_hist"), lit(false)).as("dup_of_history"),
        (col("doc_id") =!= min(col("doc_id")).over(w)).as("dup_in_batch"))
      .withColumn("admit", !col("dup_of_history") && !col("dup_in_batch"))
  }

  // ---- composed corpus funnel ---------------------------------------------

  /** The composed document-pipeline FUNNEL: how many documents survive each
    * curation stage, in the order a training pipeline applies them —
    * input → exact dedup (fingerprint keeper) → near-dup drop (SimHash
    * pairs) → decontamination (eval-shingle overlap) → quality filter.
    * One row per stage, monotonically non-increasing counts — the
    * shipping-decision summary ("we started with X docs, trained on Y").
    *
    * Stage semantics: every flag is computed PER DOCUMENT against the full
    * corpus and the funnel intersects them in order. For the near-dup
    * stage this equals computing pairs among exact-dedup survivors:
    * an exact duplicate has its keeper's identical word set, hence the
    * identical SimHash, so any pair through a dropped copy is also a pair
    * through its keeper. That independence is what makes the funnel ONE
    * aggregate over a flags frame instead of four dependent recounts.
    *
    * Scale shape: three corpus passes that must exist regardless
    * (fingerprint, SimHash, shingle explode) produce doc-id-keyed slim
    * flag frames; the joins shuffle ids + booleans, never text; the
    * funnel itself is a single-row aggregate unpivoted to 5 rows.
    */
  def corpusFunnel(corpus: DataFrame, evalDocs: DataFrame,
      maxHamming: Int = 2,
      wordHash: Column => Column = xxWordHash, bits: Int = 64): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    val exactKeep = TextOps.fingerprints(corpus)
      .select(col("doc_id"),
        (col("doc_id") === min(col("doc_id")).over(w)).as("exact_keep"))
    val nearDrop = simHashDuplicates(corpus, maxHamming,
        wordHash = wordHash, bits = bits)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("near_drop", lit(true))
    val contaminated = contaminationCheck(corpus, evalDocs)
      .select(col("doc_id")).withColumn("contaminated", lit(true))
    val quality = TextOps.qualityFilter(corpus)
      .select(col("doc_id"), col("keep").as("quality_keep"))
    val flags = corpus.select("doc_id")
      .join(exactKeep, Seq("doc_id"))
      .join(nearDrop, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .join(quality, Seq("doc_id"))
      .select(col("exact_keep"),
        coalesce(col("near_drop"), lit(false)).as("near_drop"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"),
        col("quality_keep"))
    val s2 = col("exact_keep")
    val s3 = s2 && !col("near_drop")
    val s4 = s3 && !col("contaminated")
    val s5 = s4 && col("quality_keep")
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    flags.agg(
        count(lit(1)).as("n1"), cnt(s2).as("n2"), cnt(s3).as("n3"),
        cnt(s4).as("n4"), cnt(s5).as("n5"))
      .select(explode(array(
        struct(lit("1_input").as("stage"), col("n1").as("n_docs")),
        struct(lit("2_exact_dedup").as("stage"), col("n2").as("n_docs")),
        struct(lit("3_near_dedup").as("stage"), col("n3").as("n_docs")),
        struct(lit("4_decontaminated").as("stage"), col("n4").as("n_docs")),
        struct(lit("5_quality").as("stage"), col("n5").as("n_docs"))))
        .as("s"))
      .select(col("s.stage").as("stage"), col("s.n_docs").as("n_docs"))
  }
}
