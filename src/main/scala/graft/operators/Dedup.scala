package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{LayoutCache, Tables}
import graft.Exprs.{r4, r4Sql}

/** Deduplication family over `documents`/`embeddings`
  * (SURVEY.md §2 #26-31) — the LLM-training-data north star.
  *
  * Scale design (100 TB):
  *  - exact/normalized dedup: hash-groupBy — one shuffle on the digest,
  *    map-side partial agg.
  *  - MinHash+LSH: shingling and signatures are map-side narrow;
  *    banding shuffles ONCE on (band, signature-slice); candidate pairs
  *    exist only inside band buckets, never as an O(n²) cross product;
  *    the verify join re-keys on doc_id only for the surviving
  *    candidates.
  *  - SimHash: same banding idea on 16-bit signature slices; the
  *    verification is a cheap XOR-popcount on the 64-bit signatures.
  *  - n-gram Jaccard: MinHash-LSH blocking over the bigram hash sets
  *    (same banding machinery as #28) — candidate density tracks true
  *    duplicate density, not corpus size.
  *  - embedding near-dup: hyperplane-LSH banded buckets (equi-join)
  *    with an exact cosine residual; band width is the
  *    occupancy-vs-recall dial.
  */
object Dedup {

  // ---------------------------------------------------------------- #26
  /** #26 exact dedup by md5(text): one group per distinct content,
    * min doc_id is the kept representative. (This corpus plants no
    * exact dups, so every group has n=1 — the full group list IS the
    * dedup result: the kept set.)
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("content_hash")

  val dedupExactSql: String =
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
      |  COUNT(*) AS n_dups
      |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin

  // ---------------------------------------------------------------- #27
  /** #27 normalized dedup: lowercase, strip non-alnum, collapse
    * whitespace — catches formatting-only duplicates.
    */
  def dedupNorm(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .withColumn("norm", trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")))
      .groupBy(md5(col("norm")).as("norm_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("norm_hash")

  val dedupNormSql: String =
    """SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_hash,
      |  MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
      |FROM documents GROUP BY 1 ORDER BY norm_hash""".stripMargin

  /** #60 order-insensitive exact dedup: group by the sorted-distinct-
    * token fingerprint — catches word-shuffled duplicates that byte
    * hashing (#26) misses, still one hash-groupBy shuffle. Only
    * multi-member groups are emitted (the actual duplicates).
    */
  def dedupFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .groupBy(md5(concat_ws(" ",
        array_sort(array_distinct(split(col("text"), " ")))))
        .as("fingerprint"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
      .where(col("n_dups") > 1)
      .orderBy("fingerprint")

  val dedupFingerprintSql: String =
    """SELECT md5(array_to_string(list_sort(list_distinct(
      |    string_split(text, ' '))), ' ')) AS fingerprint,
      |  MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
      |FROM documents GROUP BY 1 HAVING COUNT(*) > 1
      |ORDER BY fingerprint""".stripMargin

  // ------------------------------------------------------- shared text
  /** Distinct hashed word-trigram shingles per doc (the dup-detection
    * unit for minhash; word-shuffled texts share tokens but not
    * trigrams). One native pass: tokens hashed once, grams folded —
    * gram strings never materialize.
    */
  private def shingled(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Hashes.register(spark)
    Tables.spread(spark, dir, "documents")
      .withColumn("hsh", expr("ngram_hashes(split(text, ' '), 3)"))
      .select("doc_id", "hsh")
  }

  /** MinHash-LSH candidate pairs shared by #28 and #30: signature the
    * gram-hash sets, band the signature, equi-join on (band, bucket),
    * distinct the surviving (id_a < id_b) pairs. Band geometry is the
    * recall/occupancy dial: p(candidate | j) = 1-(1-j^bandRows)^bands.
    */
  private[graft] def lshCandidates(grams: DataFrame, gramCol: String,
      numHashes: Int, bandRows: Int): DataFrame = {
    require(numHashes % bandRows == 0,
      s"bandRows must divide numHashes ($bandRows / $numHashes)")
    val banded = grams
      .withColumn("sig",
        expr(s"minhash_sig_from_hashes($gramCol, $numHashes)"))
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, ${numHashes / bandRows - 1}),
           |  b -> named_struct(
           |    'band', b,
           |    'bsig', md5(concat_ws(',', slice(sig, b * $bandRows + 1,
           |      $bandRows)))))""".stripMargin)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bsig").as("bsig"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  // ---------------------------------------------------------------- #28
  /** #28 MinHash + LSH banding near-dup pairs.
    *
    * 16 minhashes (one xxhash64 per shingle, universal-hash mixes)
    * banded 4×4: docs sharing any band bucket become candidates
    * (p(catch | j=0.9) ≈ .986, j=0.5 ≈ .22 — the S-curve the banding
    * scheme is chosen for), then candidates are verified with exact
    * trigram Jaccard ≥ 0.8. The only shuffles are the band-bucket
    * equi-join and the verify re-join; no global cross product at any
    * point. Band geometry is a parameter — more/narrower bands raise
    * recall at the threshold, fewer/wider bands cut candidate volume.
    */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashPairsDefaultCached(spark, dir).orderBy("id_a", "id_b")

  /** The default-geometry (16×, 4-row bands) VERIFIED pair table,
    * materialized ONCE per (dir) per JVM via LayoutCache — the r11
    * verdict's task #1, the `graph_edges_s2` precedent extended to the
    * dedup family's shared candidate subplan. Before r12, the full
    * shingle → signature → banding → verify pipeline re-ran for every
    * consumer (#28 itself, the #41 cluster and its #49/#157/#361
    * dependents, pipeline_clean_corpus) and for every Bench pass; worse,
    * the #41 label-propagation loop and the #188/#361 multi-branch
    * consumers silently re-paid it whenever the in-memory persistSlot
    * came under storage pressure (the 4× driver-sweep outliers,
    * VERDICT r11). The verified pair table is duplicate-density-sized
    * (never corpus-sized), deterministic, and every consumer reads the
    * identical bytes back — results unchanged. Schema-pinned read so an
    * empty corpus (zero part files under AQE) still yields a typed
    * empty frame.
    */
  private[graft] def minhashPairsDefaultCached(spark: SparkSession,
      dir: String): DataFrame = {
    val pairs = dedupMinhashLsh(spark, dir, numHashes = 16, bandRows = 4)
    val path = LayoutCache.getOrWrite("minhash_pairs_16_4", dir) { tmp =>
      pairs.write.mode("overwrite").parquet(tmp)
    }
    spark.read.schema(pairs.schema).parquet(path)
  }

  def dedupMinhashLsh(spark: SparkSession, dir: String, numHashes: Int,
      bandRows: Int): DataFrame = {
    graft.functions.Hashes.register(spark)
    // hashed shingle sets: one pass per doc, reused by both the
    // signature and the exact-Jaccard verify
    minhashPairsOn(shingled(spark, dir), numHashes, bandRows)
  }

  /** [[dedupMinhashLsh]] over an arbitrary shingled frame
    * (doc_id, hsh) — split out so the streamed LSH-index family's
    * spec can run the identical batch contract on a planted
    * re-ingest frame (StreamingSpec family #24).
    */
  private[graft] def minhashPairsOn(sh: DataFrame, numHashes: Int,
      bandRows: Int): DataFrame = {
    val pairs = lshCandidates(sh, "hsh", numHashes, bandRows)
    pairs
      .join(sh.select(col("doc_id").as("id_a"), col("hsh").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("hsh").as("sh_b")), "id_b")
      .withColumn("inter",
        expr("cast(intersect_count(sh_a, sh_b) as double)"))
      .withColumn("jaccard",
        r4(col("inter") /
          (expr("size(sh_a) + size(sh_b)") - col("inter"))))
      .where(col("jaccard") >= 0.8)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  // ---------------------------------------------------------------- #29
  /** #29 SimHash near-dup pairs: 64-bit simhash over word bigrams,
    * banded into equal slices (by pigeonhole, a pair within hamming
    * distance bands-1 must agree exactly on at least one slice),
    * verified with XOR-popcount hamming ≤ maxHamming.
    *
    * `bands` is the scale dial: it must exceed `maxHamming` for a
    * guaranteed cover, and more/narrower bands mean fewer bits per
    * bucket → 2^(64/bands) buckets per band. 4×16-bit bands give 65,536
    * buckets/band, which saturates around 10⁸ docs (occupancy ~1.5k);
    * past that, verify work per bucket grows quadratically, so at 10⁹+
    * keep bands=4 for the cover but pre-split buckets by a secondary
    * key, or accept probabilistic recall with more bands over a wider
    * (128-bit) signature. The occupancy math: candidates ≈
    * bands · n²/2^(64/bands), so bands=4 at n=10⁸ is ~6·10¹¹ cheap
    * XOR-popcount verifies spread across the cluster — at the edge;
    * bands=8 (256 buckets) is driver-math-obviously too coarse for
    * n ≫ 10⁵ but exact for small corpora.
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    dedupSimhash(spark, dir, bands = 4, maxHamming = 3)

  def dedupSimhash(spark: SparkSession, dir: String, bands: Int,
      maxHamming: Int): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    require(bands > maxHamming,
      s"pigeonhole cover needs bands > maxHamming ($bands <= $maxHamming)")
    graft.functions.Hashes.register(spark)
    val bits = 64 / bands
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val base = Tables.spread(spark, dir, "documents")
      .withColumn("sig", expr("simhash_md5(split(text, ' '), 2)"))
      .select("doc_id", "sig")
    val banded = base.select(col("doc_id"), col("sig"),
      explode(expr(
        s"""transform(sequence(0, ${bands - 1}), b -> named_struct(
           |  'band', b,
           |  'bval', shiftright(sig, b * $bits) & $mask))""".stripMargin))
        .as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band").as("band"),
        col("bb.bval").as("bval"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        expr("cast(bit_count(a.sig ^ b.sig) as long)").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .orderBy("id_a", "id_b")
  }

  // ---------------------------------------------------------------- #30
  /** #30 word-bigram Jaccard near-dup pairs, MinHash-LSH-blocked.
    *
    * Candidate generation reuses the #28 machinery over the SAME bigram
    * hash sets the verify consumes: a 16-entry minhash signature of the
    * gram hashes, banded 8×2 — p(candidate | j) = 1-(1-j²)^8, i.e.
    * ≥ 0.9997 at j = 0.8 and ~1 for the planted near-dups — then the
    * exact bigram Jaccard ≥ 0.8 verifies. Unlike length-band blocking
    * (bucket occupancy grows linearly with the corpus → candidate pairs
    * quadratically), LSH bucket occupancy tracks the true duplicate
    * density, so candidates stay ~linear at any scale.
    */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    dedupNgramJaccard(spark, dir, numHashes = 16, bandRows = 2)

  def dedupNgramJaccard(spark: SparkSession, dir: String, numHashes: Int,
      bandRows: Int): DataFrame = {
    graft.functions.Hashes.register(spark)
    // persisted + MATERIALIZED (count) so (a) the gram compute runs
    // once across candidates + both attaches and (b) the attach gates
    // below read the ACTUAL cached bytes — Catalyst's default-width
    // stats under-count gram arrays ~100×, which at the 100× replica
    // turned the static gate into a driver-OOM broadcast
    // (PLANS.md round-11 "measured attach gate")
    val g = Tables.persistSlot("dedup_ngram_jaccard.grams",
      Tables.spread(spark, dir, "documents")
        .withColumn("grams", expr("ngram_hashes(split(text, ' '), 2)"))
        .select("doc_id", "grams"))
    g.count()
    val pairs = lshCandidates(g, "grams", numHashes, bandRows)
    // The gram table grows with the corpus, so the attach-side hint is
    // size-gated (Tables.maybeBroadcast): broadcast-hash at bench scale,
    // shuffle joins on doc_id past the gate (grams stay narrow either
    // way — candidate pairs never drag arrays through the pair join
    // above).
    pairs
      .join(Tables.maybeBroadcast(g.select(col("doc_id").as("id_a"),
        col("grams").as("g_a"))), "id_a")
      .join(Tables.maybeBroadcast(g.select(col("doc_id").as("id_b"),
        col("grams").as("g_b"))), "id_b")
      // size prefilter: jaccard >= t implies min(|A|,|B|)/max(|A|,|B|)
      // >= t, so this prunes intersect work without changing the output
      .where(expr("least(size(g_a), size(g_b)) >= " +
        "0.8 * greatest(size(g_a), size(g_b))"))
      .withColumn("inter", expr("cast(intersect_count(g_a, g_b) as double)"))
      .withColumn("jaccard",
        r4(col("inter") / (expr("size(g_a) + size(g_b)") - col("inter"))))
      .where(col("jaccard") >= 0.8)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** Oracle: the exact global brute force over bigram sets (size
    * prefilter only prunes work — implied by jaccard >= 0.8). Like #28,
    * the LSH candidate set provably covers every >= 0.8 pair on the
    * eval corpora (8×2 banding, miss-rate ≤ 3e-4 at the threshold
    * itself; the planted dups sit near j = 1), so the verified output
    * equals the brute-force set and the compare is exact.
    */
  val dedupNgramJaccardSql: String =
    """WITH g AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(string_split(text, ' '))),
      |      i -> string_split(text, ' ')[i] || ' '
      |        || string_split(text, ' ')[i + 1])) AS grams
      |  FROM documents),
      |cand AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    a.grams AS g_a, b.grams AS g_b
      |  FROM g a JOIN g b ON a.doc_id < b.doc_id
      |  WHERE least(len(a.grams), len(b.grams)) >=
      |    0.8 * greatest(len(a.grams), len(b.grams))),
      |scored AS (
      |  SELECT id_a, id_b,
      |    FLOOR((len(list_intersect(g_a, g_b)) /
      |      CAST(len(g_a) + len(g_b) - len(list_intersect(g_a, g_b))
      |        AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS jaccard
      |  FROM cand)
      |SELECT id_a, id_b, jaccard FROM scored
      |WHERE jaccard >= 0.8 ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- #31
  /** #31 embedding-cosine near-dup pairs, hyperplane-LSH-blocked.
    *
    * Candidate generation: 24 md5-parity hyperplane sign bits per
    * vector (`md5_rhp_bucket` — deterministic, oracle-reproducible),
    * banded 4×6; a pair agreeing on any 6-bit band becomes a candidate,
    * then the exact float32 cosine ≥ 0.3 verifies. Replaces the old
    * label-bucket all-pairs blocking (label count is FIXED, so
    * within-bucket pairs were O((n/L)²) — 100× corpus meant 10,000×
    * pairs).
    *
    * Scale dial: per-band bucket count is 2^bits, so per-bucket
    * occupancy is n/2^bits and candidates are
    * O(bands · n²/2^bits). Hold occupancy constant by growing `bits`
    * with log₂(n) — e.g. 16-bit bands at 10⁸ vectors keeps ~1.5k
    * occupants/bucket; the plan shape (explode → one equi-shuffle on
    * (band, bval) → verify re-join by vec_id) is unchanged at any
    * setting. The angular miss-rate falls as cosine→1, so true
    * near-dups (the actual 100 TB use case) are caught with
    * p ≥ 1-(1-(1-θ/π)^bits)^bands.
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    dedupEmbedding(spark, dir, bands = 4, bits = 6)

  def dedupEmbedding(spark: SparkSession, dir: String, bands: Int,
      bits: Int): DataFrame = {
    graft.functions.Hashes.register(spark)
    val v = Tables.spread(spark, dir, "embeddings")
      .withColumn("sig", expr(s"md5_rhp_bucket(embedding, ${bands * bits})"))
      .select("vec_id", "embedding", "sig")
    val banded = v.select(col("vec_id"), explode(expr(
        s"""transform(sequence(0, ${bands - 1}), b -> named_struct(
           |  'band', b,
           |  'bval', shiftright(sig, b * $bits) & ${(1 << bits) - 1}))"""
          .stripMargin)).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"),
        col("bb.bval").as("bval"))
    val pairs = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    pairs
      .join(v.select(col("vec_id").as("id_a"), col("embedding").as("e_a")),
        "id_a")
      .join(v.select(col("vec_id").as("id_b"), col("embedding").as("e_b")),
        "id_b")
      .withColumn("cosine", r4(expr("cosine_f32(e_a, e_b)")))
      .where(col("cosine") >= 0.3)
      .select("id_a", "id_b", "cosine")
      .orderBy("id_a", "id_b")
  }

  /** The scale dial above, turned automatically: size `bits` so each
    * band's expected bucket occupancy stays ≤ `targetOccupancy`
    * (bits = max(6, ceil(log2(n / targetOccupancy)))), holding the
    * RANDOM-collision candidate count ~linear in n instead of the
    * fixed-bits quadratic (measured: the fixed 4×6 eval query ran the
    * 10× ScaleProbe decade at 17× wall — exactly the n²/2^bits
    * envelope; this variant restores ~linear). Costs one count() job
    * up front — the standard price of a data-dependent plan parameter.
    * The registered eval query keeps fixed 4×6 so the DuckDB oracle
    * reproduces it without a scalar-subquery sizing stage; production
    * would also grow `bands` (or multi-probe) to hold the S-curve
    * recall point while bits grow.
    */
  def dedupEmbeddingAuto(spark: SparkSession, dir: String,
      targetOccupancy: Int = 32): DataFrame = {
    val n = Tables(spark, dir, "embeddings").count()
    val bits = math.max(6, math.ceil(
      math.log(n.toDouble / targetOccupancy) / math.log(2)).toInt)
    dedupEmbedding(spark, dir, bands = 4, bits = bits)
  }

  /** Oracle mirror: the same 24 md5-parity plane signs, the same 4×6
    * banding, the same exact-cosine verify — the candidate sets are
    * bit-identical across engines, so the compare is exact.
    */
  val dedupEmbeddingSql: String =
    """WITH v AS (
      |  SELECT vec_id, embedding,
      |    list_sum(list_transform(range(0, 24), j ->
      |      CASE WHEN list_sum(list_transform(range(1, 65), d ->
      |        (CASE WHEN ('0x' || substr(md5(j || ':' || (d - 1)), 1, 1))::INT
      |            & 1 = 1 THEN 1.0 ELSE -1.0 END)
      |          * embedding[CAST(d AS INT)]::DOUBLE)) > 0
      |      THEN 1 << CAST(j AS INT) ELSE 0 END))::BIGINT AS sig,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> x::DOUBLE * x::DOUBLE))) AS norm
      |  FROM embeddings),
      |banded AS (
      |  SELECT vec_id, sig, b,
      |    (sig >> CAST(b * 6 AS INT)) & 63 AS bval
      |  FROM v, range(0, 4) t(b)),
      |pairs AS (
      |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM banded a JOIN banded b
      |    ON a.b = b.b AND a.bval = b.bval AND a.vec_id < b.vec_id),
      |scored AS (
      |  SELECT p.id_a, p.id_b,
      |    FLOOR((list_sum(list_transform(range(1, 65),
      |        i -> x.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE))
      |      / (x.norm * y.norm)) * 10000.0 + 0.5) / 10000.0 AS cosine
      |  FROM pairs p JOIN v x ON x.vec_id = p.id_a
      |  JOIN v y ON y.vec_id = p.id_b)
      |SELECT id_a, id_b, cosine FROM scored
      |WHERE cosine >= 0.3 ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- #87
  /** #87 containment dedup: asymmetric near-dup detection — a small
    * document CONTAINED in a larger one (article + boilerplate, quoted
    * reply, mirrored excerpt) has high |A∩B|/min(|A|,|B|) but LOW
    * Jaccard, so the MinHash-LSH path (tuned for Jaccard) structurally
    * misses it. Candidates instead come from the passage-hash inverted
    * index (the #68 machinery): any two docs sharing an 8-token passage
    * pair up, then exact bigram containment >= 0.9 verifies, and the
    * smaller gram-set is reported as the contained side.
    *
    * Scale: the passage explode is one corpus pass; per-hash pair
    * fan-out is bounded by the STOP-PASSAGE cap (hashes carried by
    * > maxDf docs are dropped before pairing — ultra-common boilerplate
    * passages would otherwise go quadratic, and a passage in hundreds
    * of docs identifies a template, not a containment pair). The gram
    * attach joins broadcast at bench scale and fall back to shuffle
    * joins on doc_id at cluster scale, same as #30.
    */
  def dedupContainment(spark: SparkSession, dir: String): DataFrame =
    dedupContainment(spark, dir, passageTokens = 8, maxDf = 100,
      threshold = 0.9)

  def dedupContainment(spark: SparkSession, dir: String, passageTokens: Int,
      maxDf: Int, threshold: Double): DataFrame = {
    graft.functions.Hashes.register(spark)
    val docs = Tables.spread(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("grams", expr("ngram_hashes(toks, 2)"))
    val p = docs.select(col("doc_id"), explode(expr(
        s"""CASE WHEN size(toks) >= $passageTokens THEN
           |  array_distinct(transform(
           |    sequence(1, size(toks) div $passageTokens),
           |    i -> md5(concat_ws(' ',
           |      slice(toks, (i - 1) * $passageTokens + 1, $passageTokens)))))
           |ELSE array() END""".stripMargin)).as("ph"))
    val capped = p.withColumn("df",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("ph")))
      .where(col("df") <= maxDf)
    val cand = capped.as("a")
      .join(capped.as("b"),
        col("a.ph") === col("b.ph") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // persisted + materialized so the size gates below read ACTUAL
    // cached bytes (default-width stats under-count gram arrays ~100×
    // — the measured-attach-gate fix, PLANS.md round-11)
    val g = Tables.persistSlot("dedup_containment.grams",
      docs.select(col("doc_id"), col("grams")))
    g.count()
    // size-gated like #30: the gram table is corpus-sized
    cand
      .join(Tables.maybeBroadcast(g.select(col("doc_id").as("id_a"),
        col("grams").as("g_a"))), "id_a")
      .join(Tables.maybeBroadcast(g.select(col("doc_id").as("id_b"),
        col("grams").as("g_b"))), "id_b")
      .withColumn("inter", expr("cast(intersect_count(g_a, g_b) as double)"))
      .withColumn("containment",
        r4(col("inter") / least(size(col("g_a")), size(col("g_b")))))
      .where(col("containment") >= threshold)
      .withColumn("contained_id",
        when(size(col("g_a")) <= size(col("g_b")), col("id_a"))
          .otherwise(col("id_b")))
      .select("id_a", "id_b", "containment", "contained_id")
      .orderBy("id_a", "id_b")
  }

  /** Oracle: same candidate rule (shared <=maxDf passage hash) and the
    * exact bigram containment, brute-forced over the candidate pairs.
    */
  val dedupContainmentSql: String =
    """WITH p0 AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, len(string_split(text, ' ')) // 8 + 1),
      |    i -> md5(array_to_string(
      |      string_split(text, ' ')[(i - 1) * 8 + 1 : (i - 1) * 8 + 8],
      |      ' '))))) AS ph
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, ph FROM (
      |    SELECT doc_id, ph, COUNT(*) OVER (PARTITION BY ph) AS df
      |    FROM p0) WHERE df <= 100),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM p a JOIN p b ON a.ph = b.ph AND a.doc_id < b.doc_id),
      |g AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(sp)), i -> sp[i] || ' ' || sp[i + 1])) AS grams
      |  FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM documents)),
      |scored AS (
      |  SELECT id_a, id_b,
      |    FLOOR((len(list_intersect(ga.grams, gb.grams)) /
      |      CAST(least(len(ga.grams), len(gb.grams)) AS DOUBLE))
      |      * 10000.0 + 0.5) / 10000.0 AS containment,
      |    CASE WHEN len(ga.grams) <= len(gb.grams) THEN id_a ELSE id_b END
      |      AS contained_id
      |  FROM cand JOIN g ga ON cand.id_a = ga.doc_id
      |    JOIN g gb ON cand.id_b = gb.doc_id)
      |SELECT id_a, id_b, containment, contained_id FROM scored
      |WHERE containment >= 0.9 ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- #98
  /** #98 edit-distance fuzzy dedup: pairs whose normalized Levenshtein
    * similarity 1 - lev/max(|a|,|b|) clears the threshold — catches
    * char-level mutations (typos, OCR noise) that token-set measures
    * blur. Candidates reuse the #28/#30 MinHash-LSH banding over bigram
    * hash sets (high edit similarity ⇒ high bigram overlap at these
    * lengths), so the O(|a|·|b|) DP verify runs only on bucket
    * co-residents, never all pairs. The length prefilter is implied by
    * the threshold (sim ≥ t ⇒ min/max ≥ t, since lev ≥ |len diff|) and
    * prunes DP work without changing the output.
    */
  def dedupLevenshtein(spark: SparkSession, dir: String): DataFrame =
    dedupLevenshtein(spark, dir, numHashes = 16, bandRows = 2,
      threshold = 0.8)

  def dedupLevenshtein(spark: SparkSession, dir: String, numHashes: Int,
      bandRows: Int, threshold: Double): DataFrame = {
    graft.functions.Hashes.register(spark)
    // persisted + materialized: the gram compute is shared between
    // candidates and attaches, and the text-attach gates below read
    // ACTUAL cached bytes — default-width stats count a full document
    // as 20 bytes, so the static gate would broadcast the whole corpus
    // text at any scale (the measured-attach-gate fix, PLANS.md
    // round-11)
    val d = Tables.persistSlot("dedup_levenshtein.docs",
      Tables.spread(spark, dir, "documents")
        .withColumn("grams", expr("ngram_hashes(split(text, ' '), 2)"))
        .select("doc_id", "text", "grams"))
    d.count()
    val pairs = lshCandidates(d.select("doc_id", "grams"), "grams",
      numHashes, bandRows)
    val t = d.select(col("doc_id"), col("text"))
    // length-band pruning BEFORE the text attach (r12 verdict task #6,
    // guide §2.3 — shuffle/attach a lightweight proxy, not the
    // payload): sim ≥ τ forces min_len ≥ τ·max_len (lev ≥ |len diff|),
    // and the lengths are a per-doc LONG — so candidates that can
    // never verify are dropped while the pair still carries only ids,
    // and the full-text attach (the heaviest side in the family) runs
    // on survivors only. The filter is the same inequality previously
    // applied after the text joins; values are identical because
    // len_a/len_b ARE length(t_a)/length(t_b).
    val lens = t.select(col("doc_id"), length(col("text")).as("len"))
    pairs
      // candidate pairs fall out of the LSH join partitioned by band
      // bucket, which correlates with CONTENT — and DP cost is
      // length²-ish, so bucket-aligned partitions straggle. A
      // round-robin rebalance of the (skinny) pair list spreads the
      // DP evenly; the attaches happen after, on the rebalanced
      // partitions.
      .repartition(spark.sparkContext.defaultParallelism)
      .join(Tables.maybeBroadcast(lens.select(col("doc_id").as("id_a"),
        col("len").as("len_a"))), "id_a")
      .join(Tables.maybeBroadcast(lens.select(col("doc_id").as("id_b"),
        col("len").as("len_b"))), "id_b")
      .where(least(col("len_a"), col("len_b")).cast("double") >=
        lit(threshold) * greatest(col("len_a"), col("len_b"))
          .cast("double"))
      .withColumn("maxlen", greatest(col("len_a"), col("len_b")))
      // full doc TEXT — attached only to length-band survivors; the
      // size gate matters most here
      .join(Tables.maybeBroadcast(t.select(col("doc_id").as("id_a"),
        col("text").as("t_a"))), "id_a")
      .join(Tables.maybeBroadcast(t.select(col("doc_id").as("id_b"),
        col("text").as("t_b"))), "id_b")
      // banded DP: r4(sim) >= t  ⟺  dist <= (1-t+5e-5)·maxlen, so the
      // 3-arg levenshtein (early-exit at the bound, O(D·n) not O(n·m),
      // returns -1 past it) yields the IDENTICAL pair set — the bound
      // absorbs r4's half-up boundary so no borderline pair flips
      .withColumn("dmax", floor(lit(1.0 - threshold + 0.00005) *
        col("maxlen")).cast("int"))
      .withColumn("dist", expr("levenshtein(t_a, t_b, dmax)"))
      .where(col("dist") >= 0)
      .withColumn("edit_sim", r4(lit(1.0) -
        col("dist").cast("double") / col("maxlen").cast("double")))
      .where(col("edit_sim") >= threshold)
      .select("id_a", "id_b", "edit_sim")
      .orderBy("id_a", "id_b")
  }

  /** Oracle: global brute force (the implied length prefilter bounds the
    * DP work). Like #28/#30, the LSH candidate set covers every pair at
    * the threshold on the eval corpora, so the outputs are equal sets.
    */
  val dedupLevenshteinSql: String =
    """SELECT id_a, id_b, edit_sim FROM (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    FLOOR((1.0 - levenshtein(a.text, b.text) /
      |      CAST(greatest(length(a.text), length(b.text)) AS DOUBLE))
      |      * 10000.0 + 0.5) / 10000.0 AS edit_sim
      |  FROM documents a JOIN documents b ON a.doc_id < b.doc_id
      |  WHERE least(length(a.text), length(b.text)) >=
      |    0.8 * greatest(length(a.text), length(b.text)))
      |WHERE edit_sim >= 0.8 ORDER BY id_a, id_b""".stripMargin

  // --------------------------------------------------------------- #346
  /** #346 EXACT all-pairs similarity join with prefix filtering — the
    * AllPairs/PPJoin candidate discipline (Bayardo et al. WWW'07;
    * Xiao et al. WWW'08): every other near-dup path here (#28-#31)
    * generates candidates by LSH, which is complete only
    * probabilistically; this operator returns the EXACT set of pairs
    * with 3-gram-shingle Jaccard ≥ τ = 3/5, with no cross product and
    * no miss-rate argument — the audit-grade join a dedup pipeline
    * runs when it must certify "no ≥τ pair escaped".
    *
    * Prefix principle: order each doc's shingle set by GLOBAL rarity
    * (document frequency asc, shingle asc). If J(a,b) ≥ τ then
    * |a∩b| ≥ ⌈τ·|a|⌉, and two sorted sets with intersection ≥ t must
    * collide within their first (|·| − t + 1) elements — so the
    * equi-join over just the first |a| − ⌈τ|a|⌉ + 1 RAREST shingles
    * of each doc is a COMPLETE candidate generator (the proof is the
    * pigeonhole on the sorted tails). Candidates then pass the length
    * filter (τ·|a| ≤ |b| ≤ |a|/τ, integer form) and exact
    * verification by re-joining the full shingle sets; the Jaccard
    * gate is the integer inequality 8·i ≥ 3·(n_a + n_b) (τ = 3/5 ⟺
    * 5i ≥ 3u, u = n_a + n_b − i). Every number emitted is an exact
    * integer except the final r4 ratio.
    *
    * Scale: the join key is a PREFIX shingle — by construction among
    * the rarest in its doc, so bucket occupancy is bounded by the
    * corpus' rare-tail df, not by stop-shingle frequency (the reason
    * prefix filtering beats joining on all shingles by orders of
    * magnitude). One df shuffle, one per-doc rank window, one
    * prefix equi-join, one verify join — all keyed, no driver-side
    * work. At 100 TB the candidate volume is the published AllPairs
    * bound; the τ dial trades it explicitly.
    */
  def dedupAllpairsExact(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Hashes.register(spark)
    // shingle sets: lower + non-alnum split (the #27 normalization),
    // distinct word 3-grams, carried ONLY as ngram_hashes — a
    // collision-free (w.h.p.) injection of the gram set, so set
    // sizes / intersections equal the string-set ones the oracle
    // computes (the #30 device), gram strings never materialize, and
    // verification is the allocation-free sorted-merge intersect.
    // Docs under 3 words have no shingle set and drop out.
    val docs = Tables.persistSlot("dedup_allpairs.docs",
      Tables.spread(spark, dir, "documents")
        .withColumn("ws",
          expr("filter(split(lower(text), '[^a-z0-9]+'), w -> w != '')"))
        .where(size(col("ws")) >= 3)
        .withColumn("hs", expr("ngram_hashes(ws, 3)"))
        .select(col("doc_id"), col("hs"),
          size(col("hs")).cast("long").as("n")))
    docs.count()
    val e = docs.select(col("doc_id"), col("n"), explode(col("hs")).as("g"))
    val df = e.groupBy("g").agg(count(lit(1)).as("dfc"))
    // the prefix principle needs A global total order shared by all
    // docs — (df asc, hash asc) over gram HASHES is one, and rarity-
    // first is what keeps prefix join buckets small.
    // shuffle_hash on the df attach + an EXPLICIT repartition feeding
    // the window: the gram-row shuffles here are the corpus × ~50
    // volume, and AQE's advisory coalesce folded them to ~11
    // partitions at the 100× probe — each coalesced SMJ/window SORT
    // then exceeded its task memory share and spilled (~2.3 GB); a
    // hash join never sorts, and an explicit repartition pins the
    // window's parallelism against the coalesce
    val wd = Window.partitionBy("doc_id").orderBy(col("dfc"), col("g"))
    val prefix = e.join(df.hint("shuffle_hash"), "g")
      .repartition(e.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
      .withColumn("pos", row_number().over(wd))
      // p = n − ⌈3n/5⌉ + 1, all-integer ceil (div, not fp division)
      .where(col("pos") <= col("n") - expr("(n * 3 + 4) div 5") + 1)
      .select(col("g"), col("doc_id"), col("n"), col("pos"))
    val cand = prefix.as("a").join(prefix.as("b").hint("shuffle_hash"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id") &&
          // length filter: τ·n_a ≤ n_b ≤ n_a/τ in integer space
          col("b.n") * 5 >= col("a.n") * 3 &&
          col("b.n") * 3 <= col("a.n") * 5 &&
          // PPJoin POSITIONAL filter: a match at ranks (i, j) bounds
          // the intersection by ub = 1 + min(n_a−i, n_b−j) (everything
          // shared sits after the match in the common order), and a
          // true ≥τ pair's FIRST common gram — which the prefix
          // theorem places inside both prefixes — always satisfies
          // 8·ub ≥ 3(n_a+n_b), so pruning rows that fail it loses no
          // pair while cutting the candidate (and verify-attach)
          // volume several-fold: the 100× probe measured the unpruned
          // verify sort-spilling 3.5 GB on array-carrying pair rows
          expr("(1 + least(a.n - a.pos, b.n - b.pos)) * 8" +
            " >= 3 * (a.n + b.n)"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
    // NO candidate-level distinct: post-positional-filter multiplicity
    // is ~1.06 (measured — most pairs match on exactly one prefix
    // gram), so deduping here would spend a 19M-row partial hash
    // aggregate (the 100× probe's 1.6 GB spill) to save ~6% of verify
    // work; duplicates ride through the pipelined verify joins and
    // collapse in the output-sized dropDuplicates below
    // exact verify: sorted-merge intersection over the full hash sets.
    // The attach side carries the hash ARRAYS, so the broadcast gate
    // is the TIGHT per-call form: at bench scale (couple of MB) it
    // broadcasts, at corpus scale it must not — the 100× probe
    // measured two ~225 MB array broadcasts (under the default
    // 256 MB gate) squeezing execution memory until every concurrent
    // shuffle spilled; past the gate the shuffle_hash hint keeps the
    // join pipelined (per-partition docs-sized build) and the pair
    // side never sorts its arrays.
    val attachCap = 64L * 1024 * 1024
    val inter = cand
      .join(Tables.maybeBroadcast(docs.select(col("doc_id").as("da"),
        col("hs").as("h_a"), col("n").as("na")).hint("shuffle_hash"),
        attachCap), "da")
      .join(Tables.maybeBroadcast(docs.select(col("doc_id").as("db"),
        col("hs").as("h_b"), col("n").as("nb")).hint("shuffle_hash"),
        attachCap), "db")
      .withColumn("i", expr("intersect_count(h_a, h_b)"))
    inter.where(col("i") * 8 >= (col("na") + col("nb")) * 3)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("i").as("inter"),
        (col("na") + col("nb") - col("i")).as("uni"),
        r4(col("i").cast("double") /
          (col("na") + col("nb") - col("i")).cast("double")).as("jaccard"))
      .dropDuplicates("doc_a", "doc_b")
      .orderBy("doc_a", "doc_b")
  }

  /** Oracle: the exact global brute force over shared-shingle pairs —
    * independent of the prefix discipline, so a green hash PROVES the
    * candidate generator complete (not just plausible): any ≥τ pair
    * the prefix join missed would appear here and break the compare.
    */
  val dedupAllpairsExactSql: String =
    """WITH w AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |      x -> x <> '') AS ws
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    unnest(list_distinct(list_transform(range(1, len(ws) - 1),
      |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS g
      |  FROM w WHERE len(ws) >= 3),
      |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM sh GROUP BY 1),
      |iv AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db,
      |    CAST(COUNT(*) AS BIGINT) AS i
      |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT da AS doc_a, db AS doc_b, i AS inter,
      |  sa.n + sb.n - i AS uni,
      |  FLOOR((CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE))
      |    * 10000.0 + 0.5) / 10000.0 AS jaccard
      |FROM iv JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
      |WHERE 8 * i >= 3 * (sa.n + sb.n)
      |ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_allpairs_exact" -> (dedupAllpairsExact _),
    "dedup_levenshtein" ->
      ((s: SparkSession, d: String) => dedupLevenshtein(s, d)),
    "dedup_containment" ->
      ((s: SparkSession, d: String) => dedupContainment(s, d)),
    "dedup_exact" -> (dedupExact _),
    "dedup_norm" -> (dedupNorm _),
    "dedup_fingerprint" -> (dedupFingerprint _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_embedding" -> (dedupEmbedding _))

  /** Oracle for the MinHash-LSH result: the exact global brute force.
    * LSH banding is an approximation with p(miss | j=0.9) ≈ 1.4% per
    * pair IN GENERAL, but on the eval corpora its candidate set
    * provably covers every >= 0.8 pair (asserted by DedupSpec recall
    * and by this hash compare itself) — so the verified-pair output
    * equals the brute-force set and the oracle is exact. The size
    * prefilter (min/max >= 0.8) is mathematically implied by
    * jaccard >= 0.8, so it only prunes work.
    */
  val dedupMinhashLshSql: String =
    """WITH t AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(sp) - 1),
      |    i -> sp[i] || ' ' || sp[i + 1] || ' ' || sp[i + 2])) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM documents)),
      |p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    len(list_intersect(a.sh, b.sh)) AS inter,
      |    len(a.sh) AS na, len(b.sh) AS nb
      |  FROM t a JOIN t b ON a.doc_id < b.doc_id
      |  WHERE least(len(a.sh), len(b.sh)) >=
      |    0.8 * greatest(len(a.sh), len(b.sh))),
      |j AS (
      |  SELECT id_a, id_b,
      |    FLOOR((inter / CAST(na + nb - inter AS DOUBLE)) * 10000.0 + 0.5)
      |      / 10000.0 AS jaccard
      |  FROM p)
      |SELECT id_a, id_b, jaccard FROM j
      |WHERE jaccard >= 0.8 ORDER BY id_a, id_b""".stripMargin

  /** Full SQL mirror of the simhash pipeline: gram hashes are md5-based
    * (cross-engine identical bits), the signature is carried as a
    * 64-entry bit list to stay in signed-integer space, bands are
    * 16-bit slices, hamming is the bitwise abs-diff sum.
    */
  val dedupSimhashSql: String =
    """WITH g AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(sp)), i -> sp[i] || ' ' || sp[i + 1])) AS grams
      |  FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM documents)),
      |h AS (
      |  SELECT doc_id, list_transform(grams,
      |    gr -> ('0x' || substr(md5(gr), 1, 16))::UBIGINT) AS hs
      |  FROM g),
      |s AS (
      |  SELECT doc_id, list_transform(range(0, 64), i ->
      |    CASE WHEN list_sum(list_transform(hs,
      |      hv -> CASE WHEN (hv >> CAST(i AS INT)) & 1 = 1
      |        THEN 1 ELSE -1 END)) > 0
      |    THEN 1 ELSE 0 END) AS bits
      |  FROM h),
      |banded AS (
      |  SELECT doc_id, bits, b,
      |    list_sum(list_transform(range(0, 16),
      |      k -> bits[b * 16 + k + 1] << k)) AS bval
      |  FROM s, range(0, 4) t(b)),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(list_sum(list_transform(range(1, 65),
      |      i -> abs(a.bits[i] - b.bits[i]))) AS BIGINT) AS hamming
      |  FROM banded a JOIN banded b
      |    ON a.b = b.b AND a.bval = b.bval AND a.doc_id < b.doc_id)
      |SELECT id_a, id_b, hamming FROM pairs
      |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_allpairs_exact" -> dedupAllpairsExactSql,
    "dedup_levenshtein" -> dedupLevenshteinSql,
    "dedup_containment" -> dedupContainmentSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_norm" -> dedupNormSql,
    "dedup_fingerprint" -> dedupFingerprintSql,
    "dedup_minhash_lsh" -> dedupMinhashLshSql,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_embedding" -> dedupEmbeddingSql)
}
