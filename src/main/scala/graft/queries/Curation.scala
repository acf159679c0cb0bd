package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-curation queries over the `documents` table (builder brief):
  * repetition filters, deterministic sampling, token-budget packing and
  * benchmark decontamination — the stages between raw crawl and training
  * batches that the dedup/quality operators in `Corpus` don't cover.
  */
object Curation {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Prototype (centroid) outlier detection (Curation.centroidOutliers):
    // members whose round-6 cosine to their label's EXACT quantized-sum
    // centroid direction falls below -0.15 — 2 / 89 flagged at
    // sf0.01 / sf0.1 (DuckDB-probed before the gate was declared). The
    // centroid is the 2^24-quantized integer sum vector (order-free),
    // cosine the codegen sequential chain DuckDB's list functions replay.
    "emb_centroid_outliers" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Curation
        .centroidOutliers(Tables(s, dir, "embeddings"), "vec_id",
          "embedding", "label", minCos = -0.15)
        .orderBy($"label", $"vec_id")
    }),

    // Per-source quantile calibration (Curation.calibrateScores): the
    // length prior (n_chars) mapped to source-relative deciles, read
    // off the global distribution at the same relative position —
    // source-fair thresholds before mixture weighting. Exact percentile
    // arrays on both sides (the doc_quality_bins bit-for-bit precedent).
    "doc_quality_calibrate" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Curation
        .calibrateScores(Tables(s, dir, "documents"), "doc_id", "source",
          "n_chars", nBins = 10)
        .orderBy($"doc_id")
    }),

    // Gopher/MassiveText repetition filters: top n-gram character coverage
    // + duplicate 5-gram occurrence fraction, per document.
    "doc_repetition" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Curation
        .repetitionStats(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // Deterministic hash-based stratified sampling: downsample the dominant
    // language (en at 25%) against a 50% default — the corpus-rebalancing
    // step, reproducible bit-for-bit across engines and runs.
    "doc_sample_stratified" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Curation
        .stratifiedSample(Tables(s, dir, "documents"), "doc_id", "lang",
          rates = Map("en" -> 0.25), defaultRate = 0.5)
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    }),

    // Weighted sampling without replacement (Curation.weightedSample,
    // Efraimidis–Spirakis keys over md5-derived uniforms): the 5
    // highest-key docs per source, inclusion biased by n_chars — the
    // "top-k per source with exploration" curation draw, deterministic
    // across engines and runs. Selection runs through the bounded-heap
    // TopKStructsAgg (no window, ≤k structs/source/task through the
    // shuffle); the oracle states the same draw as a window rank.
    "doc_sample_weighted" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Curation
        .weightedSample(Tables(s, dir, "documents"), "source", "doc_id",
          "n_chars", k = 5, salt = "g9")
        .orderBy($"source", $"rnk")
    }),

    // Token-budget sequence packing via the DISTRIBUTED prefix sum
    // (operators.Pack): bin = floor(running token offset / 1000). The
    // oracle states the same semantics as one global window — the Spark
    // plan must never contain that single-task stage (asserted in
    // PackSpec), only per-bucket windows plus a bucket-count-sized prefix.
    "doc_pack" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
        .select($"doc_id", size(split($"text", " ")).cast("bigint").as("n_tok"))
      graft.operators.Pack
        .packBins(docs, "doc_id", "n_tok", budget = 1000L, bucketSpan = 64L)
        .groupBy($"bin")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("bin_tokens"),
          min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
        .orderBy($"bin")
    }),

    // Benchmark decontamination: every (train, benchmark) pair sharing a
    // distinct word 8-gram (benchmark set = doc_id % 50 == 0 — stands in
    // for the eval suites a real pipeline scrubs against). Broadcast bench
    // grams, one equality join — never a doc×doc product.
    "doc_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      graft.operators.Curation
        .decontaminate(
          train = docs.filter($"doc_id" % 50 =!= 0),
          bench = docs.filter($"doc_id" % 50 === 0),
          idCol = "doc_id", textCol = "text", n = 8, minShared = 1L)
        .select($"train_id", $"bench_id", $"n_shared")
        .orderBy($"train_id", $"bench_id")
    }),

    // PII detection + redaction surface: deterministic synthetic PII
    // (email + phone derived from doc_id) appended to each document, then
    // counted and scrubbed with portable regexes — digest of the scrubbed
    // text gates the exact replacement behavior across engines.
    "doc_pii_scrub" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Curation.{countMatches, scrubPii}
      val email = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
      val phone = "\\+1-555-[0-9]+"
      Tables(s, dir, "documents")
        .select($"doc_id",
          concat($"text", lit(" contact user"), $"doc_id".cast("string"),
            lit("@example.com or call +1-555-"), $"doc_id".cast("string"))
            .as("txt"))
        .select($"doc_id",
          countMatches($"txt", email).as("n_emails"),
          countMatches($"txt", phone).as("n_phones"),
          md5(scrubPii($"txt",
            Seq(email -> "[EMAIL]", phone -> "[PHONE]"))).as("digest"))
        .orderBy($"doc_id")
    }),

    // Substring-granular overlap detection: pairs sharing >= 10 RARE
    // winnowing fingerprints (df <= 16, sized to duplicate-cluster size —
    // see the operator scaladoc). Each fingerprint witnesses a shared run
    // of >= k+w-1 = 11 chars; at winnowing density ~2/(w+1) per char the
    // minShared=10 floor means pairs sharing roughly >= 30-50 verbatim
    // chars surface here even when whole-doc Jaccard stays low
    // (operators.TextDedup.substringOverlap).
    // dfCap pinned at 16 = this fixture family's duplicate-cluster scale
    // (and what the oracle's HAVING clause states); the OPERATOR default
    // is corpus-scaled (TextDedup.autoDfCap) for callers without a known
    // cluster bound.
    "doc_substring_overlap" -> ((s, dir) => {
      import s.implicits._
      graft.operators.TextDedup
        .substringOverlap(Tables(s, dir, "documents"), "doc_id", "text",
          dfCap = 16)
        .select($"id_a", $"id_b", $"n_shared")
        .orderBy($"id_a", $"id_b")
    }),

    // Cluster-granular substring dedup (operators.TextDedup
    // .substringClusters): connected components over STAR edges (each
    // rare SUPER-fingerprint — 12 consecutive recorded winnowing minima,
    // one key ≈ a ~38-char shared run — links its bucket to the
    // bucket's min doc_id) — the linear-output form that survives the
    // mega-cluster regime where the pair query above is Θ(c²) (measured
    // OOM at the 100× sweep's c≈2,600 clusters). Oracle = recursive-CTE
    // closure over the same star edges; same dfCap=16 fixture pin as the
    // pair form.
    "doc_substring_clusters" -> ((s, dir) => {
      import s.implicits._
      graft.operators.TextDedup
        .substringClusters(Tables(s, dir, "documents"), "doc_id", "text",
          dfCap = 16)
        .orderBy($"cluster_id", $"doc_id")
    }),

    // Sliding-window chunking (operators.Curation.chunkDocs): 200-char
    // windows every 120 chars — the embedding-pipeline preprocessing
    // step; digests gate the exact chunk text.
    "doc_chunks" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Curation
        .chunkDocs(Tables(s, dir, "documents"), "doc_id", "text",
          chunkChars = 200, strideChars = 120)
        .select($"doc_id", $"chunk_idx", $"off",
          length($"chunk").cast("bigint").as("chunk_len"),
          md5($"chunk").as("digest"))
        .orderBy($"doc_id", $"chunk_idx")
    }),

    // Source-weighted token-budget mixing (operators.Curation
    // .tokenBudgetMix): each source capped at 1000 tokens via
    // deterministic md5 downsampling — the domain-weight mixing step.
    // Per-source totals, quantized keep rates, and kept doc/token counts.
    "doc_mix_budget" -> ((s, dir) => {
      import s.implicits._
      val d = Tables(s, dir, "documents")
        .select($"doc_id", $"source",
          size(split($"text", " ", -1)).cast("bigint").as("n_tok"))
      graft.operators.Curation
        .tokenBudgetMix(d, "doc_id", "source", "n_tok", perSourceBudget = 1000L)
        .groupBy($"source")
        .agg(max($"_src_tokens").as("src_tokens"),
          max($"_rate_q").cast("int").as("rate_q"),
          count(lit(1)).as("n_docs_kept"),
          sum($"n_tok").as("tokens_kept"))
        .orderBy($"source")
    }),

    // Deterministic 80/10/10 train/val/test split (operators.Curation
    // .assignSplits): md5-prefix space sliced at cumulative-weight
    // boundaries — per-split doc and token counts. A row's split is a
    // pure function of its id: stable under growth, no shuffle.
    "doc_split_assign" -> ((s, dir) => {
      import s.implicits._
      val d = Tables(s, dir, "documents")
        .select($"doc_id",
          size(split($"text", " ", -1)).cast("bigint").as("n_tok"))
      graft.operators.Curation
        .assignSplits(d, "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "v1")
        .groupBy($"split")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
        .orderBy($"split")
    }),

    // Split-leakage audit — the contamination check every train/val/test
    // partition needs BEFORE training: near-duplicate pairs (exact
    // shingle-set Jaccard ≥ 0.8, the doc_dedup_jaccard machinery) whose
    // endpoints landed in DIFFERENT splits (the doc_split_assign
    // assignment). A leak means the eval set contains a paraphrase of a
    // training doc; the fix is cluster-level split assignment (assign the
    // dedup CLUSTER, not the doc). Composes two independently-gated
    // operators; the oracle replays both and the join.
    "doc_split_leakage" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val pairs = graft.operators.TextDedup.jaccardNearDuplicates(
        docs, "doc_id", "text", threshold = 0.8)
      val splits = graft.operators.Curation.assignSplits(
        docs.select($"doc_id"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "v1")
      pairs
        .join(splits.select($"doc_id".as("id_a"), $"split".as("split_a")),
          "id_a")
        .join(splits.select($"doc_id".as("id_b"), $"split".as("split_b")),
          "id_b")
        .filter($"split_a" =!= $"split_b")
        .select($"id_a", $"id_b", $"split_a", $"split_b",
          round($"jaccard", 6).as("jaccard"))
        .orderBy($"id_a", $"id_b")
    }),

    // Cluster-granular split assignment — doc_split_leakage's DOCUMENTED
    // FIX, implemented: the split key is the near-dup CLUSTER id
    // (connected components over the LSH pairs; singleton docs key on
    // themselves), so every cluster lands wholly in one split and
    // cross-split near-dup leakage is zero BY CONSTRUCTION (CurationSpec
    // asserts it on the same planted pairs that leak under per-doc
    // assignment). The md5 wall rule is assignSplits' own — growth-
    // stable, salt-isolated — just keyed one level up.
    "doc_split_by_cluster" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val pairs = graft.operators.TextDedup
        .nearDuplicates(docs, "doc_id", "text", threshold = 0.8)
      val clusters = graft.operators.Components.connectedComponents(pairs)
      val keyed = docs.select($"doc_id")
        .join(clusters.select($"id".as("doc_id"), $"component"),
          Seq("doc_id"), "left")
        .withColumn("split_key", coalesce($"component", $"doc_id"))
        .select($"doc_id", $"split_key")
      graft.operators.Curation
        .assignSplits(keyed, "split_key",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "v1")
        .select($"doc_id", $"split_key", $"split")
        .orderBy($"doc_id")
    }),

    // Temperature-flattened source mixing (operators.Curation
    // .temperatureMix): shares flattened to tokens^0.5 / Σ tokens^0.5,
    // downsampled toward that mixture under a 20k total-token budget —
    // the LLaMA/Gopher multinomial-mixture step as a deterministic
    // filter. Per-source totals, quantized keep rates, kept counts.
    "doc_mix_temperature" -> ((s, dir) => {
      import s.implicits._
      val d = Tables(s, dir, "documents")
        .select($"doc_id", $"source",
          size(split($"text", " ", -1)).cast("bigint").as("n_tok"))
      graft.operators.Curation
        .temperatureMix(d, "doc_id", "source", "n_tok",
          totalBudget = 20000L, alpha = 0.5)
        .groupBy($"source")
        .agg(max($"_src_tokens").as("src_tokens"),
          max($"_rate_q").as("rate_q"),
          count(lit(1)).as("n_docs_kept"),
          sum($"n_tok").as("tokens_kept"))
        .orderBy($"source")
    }),

    // IVF-PQ (operators.Pq.ivfPqTopK): coarse label-partition probing +
    // ADC scoring inside the probed partitions — the FAISS IVFADC search
    // shape. Oracle replays coarse centroids, probe selection, PQ
    // training, probe-restricted encode and the LUT scoring in SQL.
    "knn_ivfpq_topk" -> ((s, dir) => {
      graft.operators.Pq.ivfPqTopK(Tables(s, dir, "embeddings"),
        "vec_id", "embedding", "label", queryId = 0L, k = 10, nprobe = 3,
        m = 4, kCent = 8, iters = 1, dim = 64)
    }),

    // Product quantization + asymmetric distance computation
    // (operators.Pq): 4 subspaces × 8 centroids trained with one
    // deterministic Lloyd refinement, every vector encoded to 4 codes,
    // query answered from an m×k dot-product LUT. The oracle replays the
    // ENTIRE pipeline — strided init, assignment, means, encode, LUT,
    // score — in SQL, so the codebook build is gated, not just the search.
    "knn_pq_adc" -> ((s, dir) => {
      graft.operators.Pq.adcTopK(Tables(s, dir, "embeddings"),
        "vec_id", "embedding", queryId = 0L, k = 10, m = 4, kCent = 8,
        iters = 1, dim = 64)
    }),

    // Cross-document LINE dedup (operators.Curation.lineDedup — the
    // CCNet/RefinedWeb boilerplate pass): documents re-rendered as
    // newline-joined 12-word paragraphs wrapped in a per-source
    // header/footer line (the synthetic boilerplate — every doc of a
    // source shares it), then any line present in >= 3 distinct docs is
    // removed corpus-wide. Digest gates the exact surviving text + order.
    "doc_line_dedup" -> ((s, dir) => {
      import s.implicits._
      val d = Tables(s, dir, "documents")
        .select($"doc_id", $"source", split($"text", " ", -1).as("w"))
      val paras = transform(
        sequence(lit(0), ((size($"w") + lit(11)) / lit(12)).cast("int") - 1),
        i => array_join(slice($"w", i * 12 + 1, lit(12)), " "))
      val hdr = array(concat(lit("== "), $"source", lit(" ==")))
      val lined = d.select($"doc_id",
        array_join(flatten(array(hdr, paras, hdr)), "\n").as("txt"))
      graft.operators.Curation
        .lineDedup(lined, "doc_id", "txt", delim = "\n", minDf = 3)
        .select($"doc_id", $"n_kept", $"n_removed",
          md5($"text_clean").as("digest"))
        .orderBy($"doc_id")
    }),

    // Bloom-prefiltered decontamination (operators.Curation
    // .decontaminateBloom): same overlap semantics as doc_decontaminate
    // (word 8-grams, minShared=1) on the complementary bench split
    // (doc_id % 50 == 1), but through the big-bench-side plan — a
    // distributed BloomFilterAggregate prunes train grams scan-side and
    // the exact-confirm shuffle join removes the bloom's false positives,
    // so the oracle is the exact relational overlap.
    "doc_decontaminate_bloom" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      graft.operators.Curation
        .decontaminateBloom(
          train = docs.filter($"doc_id" % 50 =!= 1),
          bench = docs.filter($"doc_id" % 50 === 1),
          idCol = "doc_id", textCol = "text", n = 8, minShared = 1L,
          fpp = 0.01)
        .select($"train_id", $"bench_id", $"n_shared")
        .orderBy($"train_id", $"bench_id")
    }),

    // Containment / subset dedup (operators.TextDedup.containmentPairs):
    // excerpt docs (first 30 words of every doc_id % 10 == 0, re-id'd
    // +1,000,000) unioned with the corpus; every ordered pair where >= 80%
    // of the smaller side's distinct word 4-grams appear in the other doc.
    // Catches quotes/excerpts that whole-doc Jaccard misses (a 30-of-50
    // word excerpt has J ~ 0.55 but containment 1.0); near-identical docs
    // surface in both directions.
    "doc_containment" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents").select($"doc_id", $"text")
      val snip = Tables(s, dir, "documents")
        .filter($"doc_id" % 10 === 0)
        .select(($"doc_id" + 1000000L).as("doc_id"),
          array_join(slice(split($"text", " ", -1), 1, 30), " ").as("text"))
      graft.operators.TextDedup
        .containmentPairs(docs.unionByName(snip), "doc_id", "text",
          threshold = 0.8, n = 4)
        .select($"id_sub", $"id_sup", round($"containment", 6).as("containment"))
        .orderBy($"id_sub", $"id_sup")
    }),

    // Categorical drift audit (operators.Drift.categoryDrift): the
    // language mix per source between two corpus snapshots (md5-parity
    // halves as stand-ins — NOT doc-id parity, which in this data is
    // perfectly correlated with source and leaves every group one-sided)
    // — TV over exact integer numerators (gated raw), PSI over
    // half-count-smoothed shares (rounded 6), and the cats_added/
    // cats_removed census: the "a language appeared in / vanished from
    // this source's crawl" alarm a mix-rebalancing step (doc_mix_*)
    // needs before reweighting.
    "doc_drift_lang" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val half = substring(
        md5(concat(lit("drift:"), $"doc_id".cast("string"))), 1, 1) < "8"
      graft.operators.Drift
        .categoryDrift(docs.filter(half), docs.filter(!half),
          Seq("source"), "lang")
        .select($"source", $"n_a", $"n_b", $"buckets", $"tv_num", $"tv",
          round($"psi", 6).as("psi"), $"cats_added", $"cats_removed")
        .orderBy($"source")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // quantile_cont == Spark exact percentile bit-for-bit; the same
    // strict-boundary bin probe and 1-based global-midpoint lookup
    "doc_quality_calibrate" ->
      """WITH d AS (SELECT doc_id, source, n_chars::DOUBLE AS score
        |           FROM documents WHERE n_chars IS NOT NULL),
        |g AS (SELECT quantile_cont(score, [0.05, 0.15, 0.25, 0.35, 0.45,
        |        0.55, 0.65, 0.75, 0.85, 0.95]) AS gmids FROM d),
        |sb AS (SELECT source, quantile_cont(score, [0.1, 0.2, 0.3, 0.4,
        |        0.5, 0.6, 0.7, 0.8, 0.9]) AS sbs FROM d GROUP BY source),
        |b AS (SELECT d.doc_id, d.source, d.score,
        |        len(list_filter(sb.sbs, x -> d.score > x))::BIGINT AS bin
        |      FROM d JOIN sb USING (source))
        |SELECT b.doc_id, b.source, round(b.score, 6) AS score, b.bin,
        |  round(g.gmids[(b.bin + 1)::INT], 6) AS calibrated
        |FROM b, g ORDER BY b.doc_id""".stripMargin,

    // the identical quantized integer centroid, dim-ordered list, and
    // sequential cosine chain; round-6 verdict. Zero-norm members or
    // centroids flag with a NULL cosine on BOTH sides (ADVICE r13: the
    // bare `cos < -0.15` predicate silently dropped the NULL-cos rows
    // the operator emits, and list_cosine_similarity may error/NaN on a
    // zero vector — the CASE guard keeps the engines agreeing on
    // degenerate vectors).
    "emb_centroid_outliers" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v
        |           FROM embeddings
        |           WHERE label IS NOT NULL AND embedding IS NOT NULL),
        |x AS (SELECT label, i, floor(v[i] * 16777216)::BIGINT AS q
        |      FROM e, range(1, 65) t(i)),
        |s AS (SELECT label, i, sum(q) AS s FROM x GROUP BY 1, 2),
        |c AS (SELECT label, list(s::DOUBLE ORDER BY i) AS cen
        |      FROM s GROUP BY 1),
        |sc AS (SELECT e.vec_id, e.label,
        |         CASE WHEN list_dot_product(e.v, e.v) > 0
        |                AND list_dot_product(c.cen, c.cen) > 0
        |           THEN round(list_cosine_similarity(e.v, c.cen), 6)
        |         END AS cos
        |       FROM e JOIN c USING (label))
        |SELECT vec_id, label, cos FROM sc
        |WHERE cos < -0.15 OR cos IS NULL ORDER BY label, vec_id""".stripMargin,

    "doc_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') w,
        |            greatest(length(text), 1)::DOUBLE n_chars FROM documents),
        |g2 AS (SELECT doc_id, n_chars, unnest(list_transform(range(1, len(w)),
        |        i -> w[i] || ' ' || w[i+1])) AS gram FROM t),
        |c2 AS (SELECT doc_id, n_chars, gram, count(*) cnt FROM g2 GROUP BY ALL),
        |t2 AS (SELECT doc_id, round(cnt * length(gram) / n_chars, 6) AS top2_frac,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) rn
        |       FROM c2),
        |g3 AS (SELECT doc_id, n_chars, unnest(list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram FROM t),
        |c3 AS (SELECT doc_id, n_chars, gram, count(*) cnt FROM g3 GROUP BY ALL),
        |t3 AS (SELECT doc_id, round(cnt * length(gram) / n_chars, 6) AS top3_frac,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) rn
        |       FROM c3),
        |g5 AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 3),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS gram
        |       FROM t),
        |c5 AS (SELECT doc_id, gram, count(*) cnt FROM g5 GROUP BY ALL),
        |d5 AS (SELECT doc_id,
        |        round(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::DOUBLE / sum(cnt), 6) AS dup5_frac
        |       FROM c5 GROUP BY doc_id)
        |SELECT t.doc_id,
        |  coalesce(t2.top2_frac, 0.0) AS top2_frac,
        |  coalesce(t3.top3_frac, 0.0) AS top3_frac,
        |  coalesce(d5.dup5_frac, 0.0) AS dup5_frac
        |FROM t
        |LEFT JOIN (SELECT doc_id, top2_frac FROM t2 WHERE rn = 1) t2 USING (doc_id)
        |LEFT JOIN (SELECT doc_id, top3_frac FROM t3 WHERE rn = 1) t3 USING (doc_id)
        |LEFT JOIN d5 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "doc_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substring(md5(lang || ':' || doc_id::VARCHAR), 1, 2) <
        |  CASE WHEN lang = 'en' THEN '40' ELSE '80' END
        |ORDER BY doc_id""".stripMargin,

    // A-ES replay: u = (52-bit md5 prefix + 0.5) / 2^52, key = ln(u)/w,
    // top-5 per source by (key DESC, doc_id) window rank — the selection
    // the bounded-heap aggregate makes without the window.
    "doc_sample_weighted" ->
      """WITH d AS (SELECT source, doc_id, n_chars FROM documents
        |           WHERE n_chars IS NOT NULL AND n_chars > 0),
        |k AS (SELECT source, doc_id,
        |  ln((('0x' || substring(md5('g9' || doc_id::VARCHAR), 1, 13))::BIGINT
        |      + 0.5) / 4503599627370496.0) / n_chars AS key FROM d),
        |r AS (SELECT source, doc_id,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY key DESC, doc_id) AS rnk FROM k)
        |SELECT source, rnk::BIGINT AS rnk, doc_id FROM r WHERE rnk <= 5
        |ORDER BY source, rnk""".stripMargin,

    "doc_pack" ->
      """WITH t AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT n_tok FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |  coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum_before
        |  FROM t)
        |SELECT (cum_before // 1000)::BIGINT AS bin, count(*) AS n_docs,
        |  sum(n_tok)::BIGINT AS bin_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY bin ORDER BY bin""".stripMargin,

    "doc_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        |g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 6),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
        |             w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7])) s
        |      FROM t WHERE len(w) >= 8),
        |e AS (SELECT doc_id, unnest(s) AS gram FROM g)
        |SELECT a.doc_id AS train_id, b.doc_id AS bench_id, count(*) AS n_shared
        |FROM e a JOIN e b USING (gram)
        |WHERE a.doc_id % 50 <> 0 AND b.doc_id % 50 = 0
        |GROUP BY 1, 2
        |ORDER BY train_id, bench_id""".stripMargin,

    // Winnowing replication is shared verbatim with the doc_fingerprint
    // oracle; the df cap keeps only fingerprints in 2..16 docs (df=1 can
    // never pair, so <= 16 is equivalent and simpler).
    "doc_substring_overlap" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    list_transform(range(1, length(text) - 8 + 2), i -> md5(text[i:i+7])) grams
        |  FROM documents
        |), fpt AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(grams) - 4 + 2),
        |      j -> list_min(grams[j:j+3]))) fp
        |  FROM g WHERE len(grams) >= 4
        |), e AS (SELECT doc_id, unnest(fp) AS f FROM fpt),
        |df AS (SELECT f FROM e GROUP BY f HAVING count(*) <= 16),
        |er AS (SELECT e.doc_id, e.f FROM e JOIN df USING (f))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |FROM er a JOIN er b ON a.f = b.f AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 10
        |ORDER BY id_a, id_b""".stripMargin,

    // Star edges (bucket min doc_id -> member) over SUPER-fingerprints
    // (12 consecutive recorded winnowing minima — mw = per-window minima,
    // cm = adjacent repeats collapsed, the original winnowing recording
    // rule) + recursive closure. The oracle groups by the raw '|'-joined
    // minima where Spark groups by their md5-derived 64-bit surrogate —
    // identical partitions modulo md5 collisions. df cap 2..16 mirrors
    // the Spark query's pinned fixture-cluster scale.
    // ORACLE COST: ~4 min at sf0.01 (the per-char list lambdas dominate);
    // budget ~10x that at sf0.1 — same family as the near-dup oracles.
    "doc_substring_clusters" ->
      """WITH RECURSIVE g AS (
        |  SELECT doc_id,
        |    list_transform(range(1, length(text) - 8 + 2), i -> md5(text[i:i+7])) grams
        |  FROM documents
        |), mw AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(grams) - 4 + 2),
        |      j -> list_min(grams[j:j+3])) m
        |  FROM g WHERE len(grams) >= 4
        |), cm AS (
        |  SELECT doc_id, list_transform(
        |    list_filter(range(1, len(m) + 1), j -> j = 1 OR m[j] <> m[j-1]),
        |    j -> m[j]) cmin
        |  FROM mw
        |), sup AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(cmin) - 12 + 2),
        |      j -> array_to_string(cmin[j:j+11], '|'))) sf
        |  FROM cm WHERE len(cmin) >= 12
        |), e AS (SELECT doc_id, unnest(sf) AS f FROM sup),
        |b AS (SELECT f, min(doc_id) AS seed FROM e GROUP BY f
        |      HAVING count(*) BETWEEN 2 AND 16),
        |se AS (SELECT DISTINCT b.seed AS u, e.doc_id AS v
        |       FROM e JOIN b USING (f) WHERE e.doc_id <> b.seed),
        |ed AS (SELECT u, v FROM se UNION SELECT v, u FROM se),
        |r AS (
        |  SELECT u AS id, v AS reach FROM ed
        |  UNION
        |  SELECT r.id, ed.v FROM r JOIN ed ON r.reach = ed.u
        |)
        |SELECT least(id, min(reach)) AS cluster_id, id AS doc_id
        |FROM r GROUP BY id ORDER BY cluster_id, doc_id""".stripMargin,

    "doc_chunks" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, ceil(length(text) / 120.0)::BIGINT)) AS chunk_idx
        |  FROM documents WHERE length(text) > 0),
        |s AS (SELECT doc_id, chunk_idx,
        |    substring(text, (chunk_idx * 120 + 1)::INT, 200) AS chunk
        |  FROM c)
        |SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
        |  (chunk_idx * 120 + 1)::BIGINT AS off,
        |  length(chunk)::BIGINT AS chunk_len, md5(chunk) AS digest
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,

    // Mixing replay: same rate quantization (round half-up on positives
    // in both engines, floor-clamped to 1) and 4-hex md5-prefix keep rule.
    // NULL sources form their own stratum: null-safe join + coalesce in
    // the md5 key, mirroring tokenBudgetMix.
    "doc_mix_budget" ->
      """WITH d AS (SELECT doc_id, source,
        |        len(string_split(text, ' '))::BIGINT AS n_tok FROM documents),
        |tot AS (SELECT source, sum(n_tok)::BIGINT AS src_tokens FROM d GROUP BY source),
        |q AS (SELECT source, src_tokens,
        |        greatest(1, round(least(1.0, 1000.0 / src_tokens) * 65536)::INT) AS rate_q,
        |        CASE WHEN round(least(1.0, 1000.0 / src_tokens) * 65536) >= 65536 THEN 'zzzz'
        |             ELSE lpad(lower(to_hex(greatest(1, round(least(1.0, 1000.0 / src_tokens) * 65536)::INT))), 4, '0')
        |        END AS thr
        |      FROM tot),
        |k AS (SELECT d.source, d.n_tok, q.src_tokens, q.rate_q
        |      FROM d JOIN q ON d.source IS NOT DISTINCT FROM q.source
        |      WHERE substring(md5(coalesce(d.source, chr(1) || 'null') || ':' || d.doc_id::VARCHAR), 1, 4) < q.thr)
        |SELECT source, max(src_tokens) AS src_tokens, max(rate_q)::INT AS rate_q,
        |  count(*)::BIGINT AS n_docs_kept, sum(n_tok)::BIGINT AS tokens_kept
        |FROM k GROUP BY source
        |ORDER BY source NULLS FIRST""".stripMargin,

    // Split replay: identical 4-hex boundaries (round-half-up of the
    // cumulative weights x 65536 agrees across engines on positives).
    "doc_split_assign" ->
      """WITH d AS (SELECT doc_id,
        |        len(string_split(text, ' '))::BIGINT AS n_tok,
        |        substring(md5('v1:' || coalesce(doc_id::VARCHAR, '')), 1, 4) AS pfx
        |      FROM documents),
        |l AS (SELECT n_tok, CASE
        |        WHEN pfx < lpad(lower(to_hex(round(0.8 * 65536)::INT)), 4, '0') THEN 'train'
        |        WHEN pfx < lpad(lower(to_hex(round(0.9 * 65536)::INT)), 4, '0') THEN 'val'
        |        ELSE 'test' END AS split
        |      FROM d)
        |SELECT split, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens
        |FROM l GROUP BY split ORDER BY split""".stripMargin,

    // leakage replay: the doc_dedup_jaccard pair CTE joined to the
    // doc_split_assign md5-prefix labels, cross-split pairs only
    "doc_split_leakage" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) s
        |  FROM t WHERE len(w) >= 3),
        |sp AS (SELECT doc_id, CASE
        |    WHEN pfx < lpad(lower(to_hex(round(0.8 * 65536)::INT)), 4, '0')
        |      THEN 'train'
        |    WHEN pfx < lpad(lower(to_hex(round(0.9 * 65536)::INT)), 4, '0')
        |      THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM (SELECT doc_id,
        |          substring(md5('v1:' || coalesce(doc_id::VARCHAR, '')), 1, 4)
        |            AS pfx FROM documents) q),
        |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |        len(list_intersect(a.s, b.s))::DOUBLE /
        |          (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
        |       FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, sa.split AS split_a, sb.split AS split_b,
        |  round(j, 6) AS jaccard
        |FROM pr JOIN sp sa ON sa.doc_id = id_a JOIN sp sb ON sb.doc_id = id_b
        |WHERE j >= 0.8 AND sa.split <> sb.split
        |ORDER BY id_a, id_b""".stripMargin,

    // cluster-keyed split replay: the doc_dup_clusters recursive closure
    // for the cluster key (singletons key on themselves), then the
    // doc_split_assign md5 wall rule keyed on it. ORACLE COST: repeats
    // the recursive closure (the doc_dedup_keep note).
    "doc_split_by_cluster" ->
      """WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct(list_transform(range(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) s
        |  FROM t WHERE len(w) >= 3),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.s, b.s))::DOUBLE /
        |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
        |e AS (SELECT id_a AS u, id_b AS v FROM p
        |      UNION SELECT id_b, id_a FROM p),
        |r AS (
        |  SELECT u AS id, v AS reach FROM e
        |  UNION
        |  SELECT r.id, e.v FROM r JOIN e ON r.reach = e.u
        |),
        |c AS (SELECT least(id, min(reach)) AS component, id AS doc_id
        |      FROM r GROUP BY id),
        |k AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS split_key
        |      FROM documents d LEFT JOIN c USING (doc_id)),
        |l AS (SELECT doc_id, split_key,
        |        substring(md5('v1:' || coalesce(split_key::VARCHAR, '')), 1, 4)
        |          AS pfx FROM k)
        |SELECT doc_id, split_key, CASE
        |  WHEN pfx < lpad(lower(to_hex(round(0.8 * 65536)::INT)), 4, '0') THEN 'train'
        |  WHEN pfx < lpad(lower(to_hex(round(0.9 * 65536)::INT)), 4, '0') THEN 'val'
        |  ELSE 'test' END AS split
        |FROM l ORDER BY doc_id""".stripMargin,

    // Temperature-mixing replay: p_i = tokens^0.5 / Σ tokens^0.5 (the
    // total-token denominator cancels, one pow per source; cross-engine
    // pow ulp drift is absorbed by the 1/65536 quantization), rate =
    // min(1, B·p_i/tokens_i), then the same quantize + md5-prefix rule
    // as doc_mix_budget. Σw sums in sorted source order on BOTH sides
    // (Spark folds a sorted list) — sum order moves the last ulp.
    "doc_mix_temperature" ->
      """WITH d AS (SELECT doc_id, source,
        |        len(string_split(text, ' '))::BIGINT AS n_tok FROM documents),
        |tot AS (SELECT source, sum(n_tok)::BIGINT AS src_tokens,
        |        pow(CAST(sum(n_tok) AS DOUBLE), 0.5) AS w
        |        FROM d GROUP BY source),
        |sw AS (SELECT sum(w ORDER BY coalesce(source, ''), w) AS sum_w FROM tot),
        |q AS (SELECT source, src_tokens,
        |        greatest(1, round(least(1.0, 20000.0 * (w / sum_w) / src_tokens) * 65536)::INT) AS rate_q
        |      FROM tot, sw),
        |q2 AS (SELECT source, src_tokens, rate_q,
        |        CASE WHEN rate_q >= 65536 THEN 'zzzz'
        |             ELSE lpad(lower(to_hex(rate_q)), 4, '0') END AS thr
        |       FROM q),
        |k AS (SELECT d.source, d.n_tok, q2.src_tokens, q2.rate_q
        |      FROM d JOIN q2 ON d.source IS NOT DISTINCT FROM q2.source
        |      WHERE substring(md5(coalesce(d.source, chr(1) || 'null') || ':' || d.doc_id::VARCHAR), 1, 4) < q2.thr)
        |SELECT source, max(src_tokens) AS src_tokens, max(rate_q)::INT AS rate_q,
        |  count(*)::BIGINT AS n_docs_kept, sum(n_tok)::BIGINT AS tokens_kept
        |FROM k GROUP BY source
        |ORDER BY source NULLS FIRST""".stripMargin,

    // IVF-PQ replay: coarse label centroids + probe selection (as the
    // knn_ivf_topk oracle), then the PQ pipeline (as knn_pq_adc) with the
    // encode step restricted to vectors in probed partitions.
    "knn_ivfpq_topk" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |cc AS (SELECT label, list(mm ORDER BY i) AS centroid
        |  FROM (SELECT label, i, avg(v[i]) AS mm FROM e, range(1, 65) t(i)
        |        GROUP BY label, i) GROUP BY label),
        |q0 AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |probes AS (SELECT cc.label FROM cc CROSS JOIN q0
        |  ORDER BY list_cosine_similarity(cc.centroid, q0.qv) DESC, cc.label LIMIT 3),
        |sub AS (SELECT vec_id, m, v[16*m+1 : 16*m+16] AS sv FROM e, range(0, 4) t(m)),
        |p AS (SELECT greatest((SELECT count(*) FROM e) // 8, 1) AS stride),
        |c0 AS (SELECT m, (vec_id // p.stride)::INT AS label, sv AS centroid
        |       FROM sub, p WHERE vec_id % p.stride = 0 AND vec_id < p.stride * 8),
        |a1 AS (SELECT vec_id, m, sv, label FROM (
        |  SELECT s.vec_id, s.m, s.sv, c.label,
        |    row_number() OVER (PARTITION BY s.vec_id, s.m
        |      ORDER BY list_dot_product(s.sv, s.sv) - 2 * list_dot_product(s.sv, c.centroid)
        |               + list_dot_product(c.centroid, c.centroid) ASC, c.label ASC) rn
        |  FROM sub s JOIN c0 c ON s.m = c.m) WHERE rn = 1),
        |c1 AS (SELECT m, label, list(mu ORDER BY i) AS centroid FROM (
        |  SELECT m, label, i, avg(sv[i]) AS mu FROM a1, range(1, 17) t(i)
        |  GROUP BY m, label, i) GROUP BY m, label),
        |codes AS (SELECT vec_id, m, label AS code FROM (
        |  SELECT s.vec_id, s.m, c.label,
        |    row_number() OVER (PARTITION BY s.vec_id, s.m
        |      ORDER BY list_dot_product(s.sv, s.sv) - 2 * list_dot_product(s.sv, c.centroid)
        |               + list_dot_product(c.centroid, c.centroid) ASC, c.label ASC) rn
        |  FROM sub s JOIN c1 c ON s.m = c.m
        |  JOIN e ON e.vec_id = s.vec_id
        |  JOIN probes ON e.label = probes.label
        |  WHERE s.vec_id <> 0) WHERE rn = 1),
        |q AS (SELECT m, sv AS qsv FROM sub WHERE vec_id = 0),
        |lut AS (SELECT c.m, c.label AS code, list_dot_product(q.qsv, c.centroid) AS score
        |        FROM c1 c JOIN q ON q.m = c.m),
        |adc AS (SELECT codes.vec_id,
        |    sum(CASE WHEN codes.m = 0 THEN lut.score END) AS s0,
        |    sum(CASE WHEN codes.m = 1 THEN lut.score END) AS s1,
        |    sum(CASE WHEN codes.m = 2 THEN lut.score END) AS s2,
        |    sum(CASE WHEN codes.m = 3 THEN lut.score END) AS s3
        |  FROM codes JOIN lut USING (m, code) GROUP BY codes.vec_id)
        |SELECT vec_id, round(s0 + s1 + s2 + s3, 6) AS adc
        |FROM adc ORDER BY adc DESC, vec_id LIMIT 10""".stripMargin,

    "doc_pii_scrub" ->
      """WITH t AS (SELECT doc_id,
        |  text || ' contact user' || doc_id::VARCHAR ||
        |  '@example.com or call +1-555-' || doc_id::VARCHAR AS txt
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(txt, '[a-z0-9]+@[a-z0-9]+\.[a-z]+'))::BIGINT AS n_emails,
        |  len(regexp_extract_all(txt, '\+1-555-[0-9]+'))::BIGINT AS n_phones,
        |  md5(regexp_replace(regexp_replace(txt,
        |    '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '[EMAIL]', 'g'),
        |    '\+1-555-[0-9]+', '[PHONE]', 'g')) AS digest
        |FROM t ORDER BY doc_id""".stripMargin,

    // PQ replay: subvectors from list slices, strided init (c0), one Lloyd
    // refinement (a1 assignment + c1 means), encode vs c1, ADC LUT + fixed
    // per-subspace sums. Squared L2 is written a − 2b + c over dot products
    // in BOTH engines so assignment argmins agree bit-for-bit (same trick
    // the knn_lsh_topk oracle proved for sign decisions).
    "knn_pq_adc" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |sub AS (SELECT vec_id, m, v[16*m+1 : 16*m+16] AS sv FROM e, range(0, 4) t(m)),
        |p AS (SELECT greatest((SELECT count(*) FROM e) // 8, 1) AS stride),
        |c0 AS (SELECT m, (vec_id // p.stride)::INT AS label, sv AS centroid
        |       FROM sub, p WHERE vec_id % p.stride = 0 AND vec_id < p.stride * 8),
        |a1 AS (SELECT vec_id, m, sv, label FROM (
        |  SELECT s.vec_id, s.m, s.sv, c.label,
        |    row_number() OVER (PARTITION BY s.vec_id, s.m
        |      ORDER BY list_dot_product(s.sv, s.sv) - 2 * list_dot_product(s.sv, c.centroid)
        |               + list_dot_product(c.centroid, c.centroid) ASC, c.label ASC) rn
        |  FROM sub s JOIN c0 c ON s.m = c.m) WHERE rn = 1),
        |c1 AS (SELECT m, label, list(mu ORDER BY i) AS centroid FROM (
        |  SELECT m, label, i, avg(sv[i]) AS mu FROM a1, range(1, 17) t(i)
        |  GROUP BY m, label, i) GROUP BY m, label),
        |codes AS (SELECT vec_id, m, label AS code FROM (
        |  SELECT s.vec_id, s.m, c.label,
        |    row_number() OVER (PARTITION BY s.vec_id, s.m
        |      ORDER BY list_dot_product(s.sv, s.sv) - 2 * list_dot_product(s.sv, c.centroid)
        |               + list_dot_product(c.centroid, c.centroid) ASC, c.label ASC) rn
        |  FROM sub s JOIN c1 c ON s.m = c.m WHERE s.vec_id <> 0) WHERE rn = 1),
        |q AS (SELECT m, sv AS qsv FROM sub WHERE vec_id = 0),
        |lut AS (SELECT c.m, c.label AS code, list_dot_product(q.qsv, c.centroid) AS score
        |        FROM c1 c JOIN q ON q.m = c.m),
        |adc AS (SELECT codes.vec_id,
        |    sum(CASE WHEN codes.m = 0 THEN lut.score END) AS s0,
        |    sum(CASE WHEN codes.m = 1 THEN lut.score END) AS s1,
        |    sum(CASE WHEN codes.m = 2 THEN lut.score END) AS s2,
        |    sum(CASE WHEN codes.m = 3 THEN lut.score END) AS s3
        |  FROM codes JOIN lut USING (m, code) GROUP BY codes.vec_id)
        |SELECT vec_id, round(s0 + s1 + s2 + s3, 6) AS adc
        |FROM adc ORDER BY adc DESC, vec_id LIMIT 10""".stripMargin,

    // Line-dedup replay: identical paragraphization (12-word chunks +
    // per-source header/footer), df = distinct docs per EXACT line, lines
    // with df >= 3 removed, survivors rejoined in position order. Spark
    // groups by xxhash64(line) where this joins raw strings — a 64-bit
    // collision would surface as a digest mismatch here.
    "doc_line_dedup" ->
      """WITH d AS (SELECT doc_id, source, string_split(text, ' ') w FROM documents),
        |p AS (SELECT doc_id, '== ' || source || ' ==' AS hdr,
        |        list_transform(range(0, (len(w) + 11) // 12),
        |          i -> array_to_string(w[i*12+1 : i*12+12], ' ')) ps
        |      FROM d),
        |docs2 AS (SELECT doc_id, list_concat(list_concat([hdr], ps), [hdr]) ls FROM p),
        |lines AS (SELECT doc_id, unnest(ls) AS line,
        |            unnest(range(1, len(ls) + 1)) AS pos FROM docs2),
        |freq AS (SELECT line, count(DISTINCT doc_id) AS df FROM lines GROUP BY line)
        |SELECT l.doc_id,
        |  count(*) FILTER (WHERE f.df < 3) AS n_kept,
        |  count(*) FILTER (WHERE f.df >= 3) AS n_removed,
        |  md5(coalesce(string_agg(line, chr(10) ORDER BY pos)
        |    FILTER (WHERE f.df < 3), '')) AS digest
        |FROM lines l JOIN freq f USING (line)
        |GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin,

    // Bloom decontamination is EXACT (the confirm join kills false
    // positives), so the oracle is the plain relational overlap on the
    // complementary bench split — the bloom changes the plan, not the
    // result.
    "doc_decontaminate_bloom" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        |g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 6),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
        |             w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7])) s
        |      FROM t WHERE len(w) >= 8),
        |e AS (SELECT doc_id, unnest(s) AS gram FROM g)
        |SELECT a.doc_id AS train_id, b.doc_id AS bench_id, count(*) AS n_shared
        |FROM e a JOIN e b USING (gram)
        |WHERE a.doc_id % 50 <> 1 AND b.doc_id % 50 = 1
        |GROUP BY 1, 2
        |ORDER BY train_id, bench_id""".stripMargin,

    // Containment replay: same excerpt fixture, distinct word 4-gram sets,
    // shared count via the gram equality join, containment = shared /
    // |sub's set| — filter on the raw double, round only the output (the
    // division is exact-int / exact-int in both engines).
    "doc_containment" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |    array_to_string(string_split(text, ' ')[1:30], ' ') AS text
        |  FROM documents WHERE doc_id % 10 = 0),
        |t AS (SELECT doc_id, string_split(text, ' ') w FROM corpus),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 2),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) s
        |      FROM t WHERE len(w) >= 4),
        |g AS (SELECT doc_id, len(s) AS sz, unnest(s) AS gram FROM sh),
        |p AS (SELECT a.doc_id AS id_sub, b.doc_id AS id_sup,
        |        count(*) AS n_shared, any_value(a.sz) AS sz_sub
        |      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id <> b.doc_id
        |      GROUP BY 1, 2)
        |SELECT id_sub, id_sup, round(n_shared::DOUBLE / sz_sub, 6) AS containment
        |FROM p WHERE n_shared::DOUBLE / sz_sub >= 0.8
        |ORDER BY id_sub, id_sup""".stripMargin,

    // Categorical-drift replay: both snapshots pivoted from one scan
    // (equals Drift's full-outer join + zero-fill), then the identical
    // integer TV numerator and the identical smoothed-PSI expression
    // (ln + order-sensitive sum → round 6; tv gated raw — exact BIGINT
    // operands, one IEEE division chain).
    "doc_drift_lang" ->
      """WITH d0 AS (SELECT source, lang,
        |              CASE WHEN substring(md5('drift:' || doc_id::VARCHAR),
        |                1, 1) < '8' THEN 0 ELSE 1 END AS side
        |            FROM documents WHERE lang IS NOT NULL),
        |h AS (SELECT source, lang,
        |        sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)::BIGINT AS cnt_a,
        |        sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)::BIGINT AS cnt_b
        |      FROM d0 GROUP BY 1, 2),
        |t AS (SELECT source, lang, cnt_a, cnt_b,
        |        sum(cnt_a) OVER (PARTITION BY source) AS n_a,
        |        sum(cnt_b) OVER (PARTITION BY source) AS n_b,
        |        count(*) OVER (PARTITION BY source) AS k FROM h),
        |u AS (SELECT *, cnt_a * n_b - cnt_b * n_a AS d,
        |        (cnt_a::DOUBLE * 2 + 1)
        |          / (n_a::BIGINT::DOUBLE * 2 + k::DOUBLE) AS pa,
        |        (cnt_b::DOUBLE * 2 + 1)
        |          / (n_b::BIGINT::DOUBLE * 2 + k::DOUBLE) AS pb
        |      FROM t),
        |g AS (SELECT source,
        |        max(n_a)::BIGINT AS n_a, max(n_b)::BIGINT AS n_b,
        |        count(*)::BIGINT AS buckets,
        |        sum(abs(d))::BIGINT AS tv_num,
        |        sum((pa - pb) * (ln(pa) - ln(pb))) AS psi_raw,
        |        sum(CASE WHEN cnt_a = 0 THEN 1 ELSE 0 END)::BIGINT AS cats_added,
        |        sum(CASE WHEN cnt_b = 0 THEN 1 ELSE 0 END)::BIGINT AS cats_removed
        |      FROM u GROUP BY 1)
        |SELECT source, n_a, n_b, buckets, tv_num,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    tv_num::DOUBLE / ((n_a::DOUBLE * n_b::DOUBLE) * 2) END AS tv,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN round(psi_raw, 6) END AS psi,
        |  cats_added, cats_removed
        |FROM g ORDER BY source""".stripMargin,
  )
}
