package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Clustering, Curation, Dedup, Multimodal, Search, Similarity, TextAnalysis}

/** LLM-training-data pipeline operators over `documents` / `embeddings`:
  * dedup (exact, n-gram Jaccard, MinHash+LSH, SimHash), similarity search
  * (brute-force + sign-LSH ANN), text analysis (langid, quality, tokens,
  * fingerprints), corpus curation (cluster consolidation, reproducible
  * sampling, token-budget selection, PII scrubbing) and multimodal
  * binary-column plumbing. Each query has a DuckDB oracle implementing the
  * identical algorithm (md5-based hashing is the portability anchor). The
  * multimodal queries decode real containers (BMP/WAV/GFV0) and their
  * oracles recompute sizes/features from the public container layouts.
  */
object PipelineQueries extends QueryRegistry {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "documents")
  private def emb(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "embeddings")

  // DuckDB fragment: lower-cased whitespace tokens, empties dropped.
  private val sqlToks =
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')"
  // DuckDB fragment: distinct 3-word shingles per doc.
  private val sqlShingles =
    s"""toks AS (SELECT doc_id, $sqlToks AS ts FROM documents),
        idx AS (SELECT doc_id, ts, unnest(generate_series(1, greatest(len(ts) - 2, 0))) AS i FROM toks),
        sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle FROM idx)"""

  val all: Seq[QueryDef] = Seq(

    // ── exact dedup ────────────────────────────────────────────────────────
    QueryDef("q30_dedup_exact",
      (s, d) => docs(s, d).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_unique"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dup_docs")),
      Some("""SELECT count(*) AS n_docs,
                     count(DISTINCT md5(text)) AS n_unique,
                     count(*) - count(DISTINCT md5(text)) AS n_dup_docs
              FROM documents"""),
      "Exact dedup via content-hash groupBy"),

    // ── n-gram Jaccard near-dup ────────────────────────────────────────────
    QueryDef("q31_dedup_jaccard",
      (s, d) => Dedup.jaccardPairs(Dedup.shingles(docs(s, d), 3), 0.3),
      Some(s"""WITH $sqlShingles,
                   sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
                   pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                             FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                             GROUP BY 1, 2)
              SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
                     CAST(c AS BIGINT) AS common,
                     round(CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE), 6) AS jaccard
              FROM pairs JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
              WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.3"""),
      "3-shingle Jaccard pairs ≥ 0.3 via shingle self-join"),

    // ── MinHash + LSH near-dup ─────────────────────────────────────────────
    QueryDef("q32_dedup_minhash",
      (s, d) => Dedup.minhashLsh(docs(s, d), n = 3, numHashes = 8, rowsPerBand = 2,
        minJaccard = 0.3),
      Some(s"""WITH $sqlShingles,
                   seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
                   mh AS (SELECT doc_id, seed,
                                 min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
                          FROM sh CROSS JOIN seeds GROUP BY doc_id, seed),
                   bands AS (SELECT doc_id, CAST(seed // 2 AS INT) AS band,
                                    string_agg(mh, '|' ORDER BY seed) AS sig
                             FROM mh GROUP BY 1, 2),
                   cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                            FROM bands a JOIN bands b
                              ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
                   sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
                   common AS (SELECT s1.doc_id AS doc_a, s2.doc_id AS doc_b, count(*) AS c
                              FROM sh s1
                              JOIN sh s2 ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
                              JOIN cand ON cand.doc_a = s1.doc_id AND cand.doc_b = s2.doc_id
                              GROUP BY 1, 2)
              SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
                     round(CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE), 6) AS jaccard
              FROM common JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
              WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.3"""),
      "MinHash(8) + LSH(4 bands × 2) candidates, exact-Jaccard verified"),

    // ── SimHash ────────────────────────────────────────────────────────────
    QueryDef("q33_dedup_simhash",
      (s, d) => Dedup.simhash16(docs(s, d)),
      Some(s"""WITH toks AS (SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
                   tc AS (SELECT doc_id, tok, count(*) AS cnt, substr(md5(tok), 1, 4) AS h
                          FROM toks GROUP BY doc_id, tok),
                   bits AS (SELECT doc_id, cnt, h, unnest(generate_series(0, 15)) AS b FROM tc),
                   bv AS (SELECT doc_id, b,
                                 sum(cnt * (2 * (CAST(floor(
                                   (instr('0123456789abcdef', substr(h, CAST(b // 4 AS INT) + 1, 1)) - 1)
                                   / power(2, 3 - b % 4)) AS BIGINT) % 2) - 1)) AS v
                          FROM bits GROUP BY doc_id, b)
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     CAST(sum(CASE WHEN v > 0 THEN CAST(power(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
              FROM bv GROUP BY doc_id"""),
      "16-bit count-weighted SimHash fingerprints"),

    // ── dedup: embedding-cosine near-dup (banded sign-LSH) ─────────────────
    // 4 bands × 2 md5-derived hyperplanes (the q35 mechanism, banded);
    // candidates = any-band bucket collision; verified exact cosine ≥ 0.4.
    QueryDef("q63_dedup_embedding",
      (s, d) => Dedup.embeddingNearDup(emb(s, d),
        bands = 4, planesPerBand = 2, dim = 64, minCos = 0.4),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
                   dims AS (SELECT unnest(generate_series(1, 64)) AS dd),
                   planes AS (SELECT unnest(generate_series(0, 7)) AS p),
                   vals AS (SELECT vec_id, dd, emb[dd] AS v FROM e CROSS JOIN dims),
                   proj AS (SELECT vec_id, p,
                                   sum((CASE WHEN instr('0123456789abcdef',
                                          substr(md5(CAST(p AS VARCHAR) || '|' || CAST(dd AS VARCHAR)), 1, 1)) - 1 >= 8
                                        THEN 1.0 ELSE -1.0 END) * v) AS pr
                            FROM vals CROSS JOIN planes GROUP BY vec_id, p),
                   buck AS (SELECT vec_id, CAST(p // 2 AS BIGINT) AS band,
                                   CAST(sum(CASE WHEN pr > 0 THEN CAST(power(2, p % 2) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
                            FROM proj GROUP BY 1, 2),
                   cand AS (SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
                            FROM buck a JOIN buck b
                              ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
                   sims AS (SELECT i, j,
                                   list_dot_product(ea.emb, eb.emb)
                                     / (sqrt(list_dot_product(ea.emb, ea.emb)) * sqrt(list_dot_product(eb.emb, eb.emb))) AS sim
                            FROM cand
                            JOIN e ea ON ea.vec_id = cand.i
                            JOIN e eb ON eb.vec_id = cand.j)
              SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, round(sim, 4) AS sim
              FROM sims WHERE sim >= 0.4"""),
      "Embedding-cosine near-dup pairs: banded sign-LSH candidates, exact verify"),

    // ── similarity: brute-force cosine top-k ───────────────────────────────
    QueryDef("q34_sim_topk",
      (s, d) => Similarity.bruteForceTopK(emb(s, d), col("vec_id") < 5, 10),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
                   q AS (SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id < 5),
                   sims AS (SELECT qid, vec_id,
                                   list_dot_product(qe, emb)
                                     / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(emb, emb))) AS sim
                            FROM q CROSS JOIN e WHERE vec_id != qid),
                   rk AS (SELECT qid, vec_id, sim,
                                 row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
                          FROM sims)
              SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
                     round(sim, 4) AS sim, CAST(rn AS BIGINT) AS rank
              FROM rk WHERE rn <= 10"""),
      "Exact cosine top-10 for 5 broadcast queries (ANN baseline)"),

    // ── similarity: sign-LSH bucketed ANN ──────────────────────────────────
    QueryDef("q35_sim_lsh",
      (s, d) => Similarity.lshTopMatch(emb(s, d), col("vec_id") < 5, planes = 8, dim = 64),
      Some("""WITH dims AS (SELECT unnest(generate_series(1, 64)) AS dd),
                   planes AS (SELECT unnest(generate_series(0, 7)) AS p),
                   vals AS (SELECT vec_id, dd, CAST(embedding[dd] AS DOUBLE) AS v
                            FROM embeddings CROSS JOIN dims),
                   proj AS (SELECT vec_id, p,
                                   sum((CASE WHEN instr('0123456789abcdef',
                                          substr(md5(CAST(p AS VARCHAR) || '|' || CAST(dd AS VARCHAR)), 1, 1)) - 1 >= 8
                                        THEN 1.0 ELSE -1.0 END) * v) AS pr
                            FROM vals CROSS JOIN planes GROUP BY vec_id, p),
                   buck AS (SELECT vec_id,
                                   CAST(sum(CASE WHEN pr > 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
                            FROM proj GROUP BY vec_id),
                   e AS (SELECT b.vec_id, b.bucket, CAST(embedding AS DOUBLE[]) AS emb
                         FROM buck b JOIN embeddings USING (vec_id)),
                   q AS (SELECT vec_id AS qid, emb AS qe, bucket FROM e WHERE vec_id < 5),
                   cand AS (SELECT qid, q.bucket AS bucket, c.vec_id,
                                   list_dot_product(qe, c.emb)
                                     / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(c.emb, c.emb))) AS sim
                            FROM q JOIN e c ON c.bucket = q.bucket AND c.vec_id != q.qid),
                   rk AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
                          FROM cand)
              SELECT CAST(qid AS BIGINT) AS qid,
                     CAST(bucket AS BIGINT) AS bucket,
                     count(*) AS n_candidates,
                     CAST(min(CASE WHEN rn = 1 THEN vec_id END) AS BIGINT) AS best_id,
                     min(CASE WHEN rn = 1 THEN round(sim, 4) END) AS best_sim
              FROM rk GROUP BY qid, bucket"""),
      "Sign-hyperplane LSH buckets; per-query candidate count + top-1 match"),

    // ── similarity: IVF coarse-quantizer ANN ───────────────────────────────
    // Deterministic quantizer (centroids = 16 lowest vec_ids), nearest-cell
    // assignment by squared L2 via the dot identity (bit-reproducible in
    // SQL), 2-cell probe, exact cosine rank inside the probed cells.
    QueryDef("q62_sim_ivf",
      (s, d) => Similarity.ivfTopK(emb(s, d), col("vec_id") % 100 === 7,
        kCells = 16, nprobe = 2, k = 10),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
                   sd AS (SELECT vec_id, emb, list_dot_product(emb, emb) AS self_dot FROM e),
                   cent AS (SELECT vec_id AS cid, emb AS ce,
                                   list_dot_product(emb, emb) AS cdot
                            FROM e WHERE vec_id < 16),
                   dist AS (SELECT s.vec_id, c.cid,
                                   s.self_dot - 2.0 * list_dot_product(s.emb, c.ce) + c.cdot AS d2
                            FROM sd s CROSS JOIN cent c),
                   assign AS (SELECT vec_id, cid FROM (
                       SELECT vec_id, cid,
                              row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
                       FROM dist) WHERE rn = 1),
                   q AS (SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id % 100 = 7),
                   qc AS (SELECT qid, cid FROM (
                       SELECT d.vec_id AS qid, d.cid,
                              row_number() OVER (PARTITION BY d.vec_id ORDER BY d.d2, d.cid) AS rn
                       FROM dist d JOIN q ON q.qid = d.vec_id) WHERE rn <= 2),
                   cand AS (SELECT q.qid, q.qe, e2.vec_id, e2.emb
                            FROM q JOIN qc ON qc.qid = q.qid
                                   JOIN assign a ON a.cid = qc.cid
                                   JOIN e e2 ON e2.vec_id = a.vec_id
                            WHERE e2.vec_id != q.qid),
                   sims AS (SELECT qid, vec_id,
                                   list_dot_product(qe, emb)
                                     / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(emb, emb))) AS sim
                            FROM cand),
                   rk AS (SELECT qid, vec_id, sim,
                                 row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
                          FROM sims)
              SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
                     round(sim, 4) AS sim, CAST(rn AS BIGINT) AS rank
              FROM rk WHERE rn <= 10"""),
      "IVF ANN: deterministic 16-cell quantizer, 2-cell probe, exact in-cell rank"),

    // ── semantic dedup (SemDeDup, arXiv:2303.09540) ───────────────────────
    QueryDef("q86_semantic_dedup",
      (s, d) => graft.operators.Curation.semanticDedup(emb(s, d),
        kCells = 16, threshold = 0.4),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
                   sd AS (SELECT vec_id, emb, list_dot_product(emb, emb) AS self_dot FROM e),
                   cent AS (SELECT vec_id AS cid, emb AS ce,
                                   list_dot_product(emb, emb) AS cdot
                            FROM e WHERE vec_id < 16),
                   dist AS (SELECT s.vec_id, c.cid,
                                   s.self_dot - 2.0 * list_dot_product(s.emb, c.ce) + c.cdot AS d2
                            FROM sd s CROSS JOIN cent c),
                   assign AS (SELECT vec_id, cid FROM (
                       SELECT vec_id, cid,
                              row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
                       FROM dist) WHERE rn = 1),
                   dup AS (SELECT a.vec_id, min(b.vec_id) AS dup_of
                           FROM assign a JOIN e ea ON ea.vec_id = a.vec_id
                                JOIN assign b ON b.cid = a.cid AND b.vec_id < a.vec_id
                                JOIN e eb ON eb.vec_id = b.vec_id
                           WHERE list_dot_product(ea.emb, eb.emb)
                                   / (sqrt(list_dot_product(ea.emb, ea.emb))
                                      * sqrt(list_dot_product(eb.emb, eb.emb))) > 0.4
                           GROUP BY a.vec_id)
              SELECT CAST(a.vec_id AS BIGINT) AS vec_id,
                     CAST(a.cid AS BIGINT) AS cell,
                     CAST(p.dup_of AS BIGINT) AS dup_of,
                     p.dup_of IS NULL AS kept
              FROM assign a LEFT JOIN dup p ON p.vec_id = a.vec_id"""),
      "SemDeDup: cluster embeddings (deterministic 16-cell quantizer), drop within-cell cosine near-dups, min-id survivor"),

    // ── text: language id ──────────────────────────────────────────────────
    QueryDef("q36_langid",
      (s, d) => TextAnalysis.langId(docs(s, d)),
      Some(s"""WITH profile(cand_lang, stopword) AS (VALUES
                   ('en','the'),('en','a'),('en','of'),('en','and'),('en','is'),
                   ('de','der'),('de','die'),('de','und'),('de','das'),('de','ist'),
                   ('es','el'),('es','la'),('es','y'),('es','de'),('es','es'),
                   ('fr','le'),('fr','la'),('fr','et'),('fr','de'),('fr','est')),
                   toks AS (SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
                   scores AS (SELECT doc_id, cand_lang, count(*) AS score
                              FROM toks JOIN profile ON tok = stopword
                              GROUP BY 1, 2),
                   best AS (SELECT doc_id, cand_lang, score,
                                   row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, cand_lang) AS rn
                            FROM scores)
              SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
                     coalesce(b.cand_lang, 'und') AS pred_lang,
                     CAST(coalesce(b.score, 0) AS BIGINT) AS score,
                     coalesce(b.cand_lang, 'und') = d.lang AS is_correct
              FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1"""),
      "Stopword-profile language ID with deterministic argmax"),

    // ── text: quality scoring ──────────────────────────────────────────────
    QueryDef("q37_quality",
      (s, d) => TextAnalysis.qualityScore(docs(s, d)),
      Some(s"""WITH f AS (SELECT doc_id,
                     $sqlToks AS ts,
                     CAST(length(text) AS BIGINT) AS n_chars,
                     CAST(length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct
                   FROM documents),
                   g AS (SELECT doc_id, n_chars, n_punct,
                     CAST(len(ts) AS BIGINT) AS n_tokens,
                     CAST(len(list_filter(ts, x -> list_contains(
                       ['the','a','of','and','is','der','die','und','das','ist',
                        'el','la','y','de','es','le','et','est'], x))) AS BIGINT) AS n_stop
                   FROM f)
              SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens, n_chars, n_punct, n_stop,
                     round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS stop_ratio,
                     round(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS punct_ratio,
                     round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
                           + (1.0 - CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.3
                           + least((CAST(n_chars - (n_tokens - 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / 10.0, 1.0) * 0.2,
                         6) AS quality
              FROM g"""),
      "Length/punct/stopword quality features + composite score"),

    // ── text: token counting ───────────────────────────────────────────────
    QueryDef("q38_tokens",
      (s, d) => TextAnalysis.tokenStats(docs(s, d)),
      Some(s"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     CAST(len($sqlToks) AS BIGINT) AS n_ws_tokens,
                     CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_re_tokens,
                     CAST(len(list_distinct($sqlToks)) AS BIGINT) AS n_distinct
              FROM documents"""),
      "Whitespace + BPE-ish regex token counts"),

    // ── text: fingerprinting ───────────────────────────────────────────────
    QueryDef("q39_fingerprint",
      (s, d) => TextAnalysis.fingerprint(docs(s, d)),
      Some("""WITH fp AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     substr(md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))), 1, 16) AS fp
              FROM documents)
              SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS n_same
              FROM fp"""),
      "Normalized content fingerprint + dup-group size"),

    QueryDef("q64_repetition",
      (s, d) => TextAnalysis.repetitionStats(docs(s, d)),
      Some(s"""WITH toks AS (SELECT doc_id, $sqlToks AS ts FROM documents),
                    g AS (
                      SELECT doc_id, 2 AS n, ts[i] || ' ' || ts[i+1] AS g
                      FROM (SELECT doc_id, ts,
                                   unnest(generate_series(1, greatest(len(ts) - 1, 0))) AS i
                            FROM toks)
                      UNION ALL
                      SELECT doc_id, 3 AS n, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
                      FROM (SELECT doc_id, ts,
                                   unnest(generate_series(1, greatest(len(ts) - 2, 0))) AS i
                            FROM toks)),
                    counts AS (SELECT doc_id, n, g, count(*) AS c
                               FROM g GROUP BY doc_id, n, g),
                    per AS (SELECT doc_id, n, sum(c) AS tot, max(c) AS top,
                                   sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
                            FROM counts GROUP BY doc_id, n),
                    folded AS (SELECT doc_id,
                                      max(CASE WHEN n = 2 THEN tot END) AS tot2,
                                      max(CASE WHEN n = 2 THEN top END) AS top2,
                                      max(CASE WHEN n = 3 THEN tot END) AS tot3,
                                      max(CASE WHEN n = 3 THEN dup END) AS dup3
                               FROM per GROUP BY doc_id)
               SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
                      CAST(coalesce(tot2, 0) AS BIGINT) AS n_2grams,
                      CAST(coalesce(top2, 0) AS BIGINT) AS top_2gram_cnt,
                      CAST((coalesce(top2, 0) * 1000000) // nullif(coalesce(tot2, 0), 0) AS BIGINT)
                        AS top_2gram_ppm,
                      CAST(coalesce(tot3, 0) AS BIGINT) AS n_3grams,
                      CAST(coalesce(dup3, 0) AS BIGINT) AS dup_3gram_cnt,
                      CAST((coalesce(dup3, 0) * 1000000) // nullif(coalesce(tot3, 0), 0) AS BIGINT)
                        AS dup_3gram_ppm
               FROM documents d LEFT JOIN folded ON d.doc_id = folded.doc_id"""),
      "Gopher-style repetition signals: top-2-gram + duplicate-3-gram fractions (ppm)"),

    // ── curation: near-dup clusters → canonical survivor ──────────────────
    // Pairs come from the exact-Jaccard path (q31's semantics); clusters are
    // their transitive closure; the survivor is the min doc_id. The oracle
    // re-derives the closure with a recursive CTE (q28's pattern).
    QueryDef("q65_dedup_clusters",
      (s, d) => Curation.dedupClusters(docs(s, d),
        Dedup.jaccardPairs(Dedup.shingles(docs(s, d), 3), 0.3)),
      Some(s"""WITH RECURSIVE $sqlShingles,
                   sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
                   pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                          GROUP BY 1, 2),
                   jp AS (SELECT doc_a, doc_b
                          FROM pr JOIN sizes sa ON sa.doc_id = doc_a
                                  JOIN sizes sb ON sb.doc_id = doc_b
                          WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.3),
                   ud AS (SELECT doc_a AS src, doc_b AS dst FROM jp
                          UNION SELECT doc_b, doc_a FROM jp),
                   reach(a, b) AS (
                     SELECT src, src FROM ud
                     UNION
                     SELECT r.a, ud.dst FROM reach r JOIN ud ON ud.src = r.b),
                   comp AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a),
                   lab AS (SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
                                  CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS canon_id
                           FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
                   sz AS (SELECT canon_id, count(*) AS n FROM lab GROUP BY 1)
              SELECT lab.doc_id, lab.canon_id, CAST(sz.n AS BIGINT) AS cluster_size,
                     lab.doc_id = lab.canon_id AS is_canonical
              FROM lab JOIN sz USING (canon_id)"""),
      "Near-dup pair closure → clusters with min-doc_id canonical survivor"),

    // ── curation: reproducible stratified sampling ─────────────────────────
    QueryDef("q66_stratified_sample",
      (s, d) => Curation.stratifiedSample(docs(s, d), "lang", 20),
      Some("""WITH p AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang AS stratum,
                                substr(md5(CAST(doc_id AS VARCHAR) || '|sample'), 1, 16) AS priority
                         FROM documents),
                   rk AS (SELECT *, row_number() OVER (
                            PARTITION BY stratum ORDER BY priority, doc_id) AS rk FROM p)
              SELECT doc_id, stratum, priority, CAST(rk AS BIGINT) AS rk
              FROM rk WHERE rk <= 20"""),
      "md5-priority quota sample: 20 docs per language, engine-reproducible"),

    // ── curation: greedy token-budget selection per stratum ────────────────
    QueryDef("q67_token_budget",
      (s, d) => Curation.tokenBudgetSelect(docs(s, d), "lang", "n_chars", 20000L),
      Some(s"""WITH f AS (SELECT doc_id,
                     $sqlToks AS ts,
                     CAST(length(text) AS BIGINT) AS n_chars,
                     CAST(length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct
                   FROM documents),
                   g AS (SELECT doc_id, n_chars, n_punct,
                     CAST(len(ts) AS BIGINT) AS n_tokens,
                     CAST(len(list_filter(ts, x -> list_contains(
                       ['the','a','of','and','is','der','die','und','das','ist',
                        'el','la','y','de','es','le','et','est'], x))) AS BIGINT) AS n_stop
                   FROM f),
                   q AS (SELECT doc_id,
                     round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
                           + (1.0 - CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.3
                           + least((CAST(n_chars - (n_tokens - 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / 10.0, 1.0) * 0.2,
                         6) AS quality
                   FROM g),
                   j AS (SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang AS stratum,
                                CAST(d.n_chars AS BIGINT) AS cost, q.quality
                         FROM documents d JOIN q ON q.doc_id = d.doc_id),
                   w AS (SELECT *, sum(cost) OVER (
                           PARTITION BY stratum ORDER BY quality DESC, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cost
                         FROM j)
              SELECT doc_id, stratum, quality, cost,
                     CAST(cum_cost AS BIGINT) AS cum_cost,
                     cum_cost <= 20000 AS selected
              FROM w"""),
      "Per-language greedy selection by quality under a 20k-char budget"),

    // ── curation: weight-proportional sample (Efraimidis–Spirakis) ────────
    // The oracle reconstructs the md5-derived uniform u by summing the first
    // 12 hex nibbles (exact in double: integers < 2^48), then replays the
    // identical u^(1/w) race. Key rounded to 6; rank uses full precision.
    QueryDef("q69_weighted_sample",
      (s, d) => Curation.weightedSample(docs(s, d), "n_chars", 50),
      Some("""WITH nib AS (SELECT doc_id, unnest(generate_series(1, 12)) AS i
                           FROM documents),
                   v AS (SELECT doc_id, i,
                           instr('0123456789abcdef',
                             substr(md5(CAST(doc_id AS VARCHAR) || '|wsample'),
                               CAST(i AS INT), 1)) - 1 AS nv
                         FROM nib),
                   u AS (SELECT doc_id,
                           sum(nv * power(2.0, 4 * (12 - i))) / power(2.0, 48) AS u
                         FROM v GROUP BY doc_id),
                   keyed AS (SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS weight,
                               power(u.u, 1.0 / CAST(d.n_chars AS DOUBLE)) AS key_full
                             FROM documents d JOIN u ON u.doc_id = d.doc_id),
                   rk AS (SELECT *, row_number() OVER (ORDER BY key_full DESC, doc_id) AS rn
                          FROM keyed)
              SELECT CAST(doc_id AS BIGINT) AS doc_id, weight,
                     round(key_full, 6) AS key, CAST(rn AS BIGINT) AS rank
              FROM rk WHERE rn <= 50"""),
      "Length-proportional 50-doc sample via reproducible u^(1/w) keys"),

    // ── curation: concat-and-chunk sequence packing ────────────────────────
    QueryDef("q70_pack_sequences",
      (s, d) => Curation.packSequences(docs(s, d), "n_chars", 512L),
      Some("""WITH c AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                                CAST(n_chars AS BIGINT) AS cost FROM documents),
                   w AS (SELECT doc_id, cost,
                           coalesce(sum(cost) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS so
                         FROM c)
              SELECT doc_id, cost, CAST(so AS BIGINT) AS start_off,
                     CAST(so // 512 AS BIGINT) AS pack_first,
                     CAST(greatest((so + cost - 1) // 512, so // 512) AS BIGINT) AS pack_last,
                     CAST(so % 512 AS BIGINT) AS off_in_pack
              FROM w"""),
      "Fixed-512 training-sequence layout from the doc_id-ordered token stream"),

    // ── curation: benchmark decontamination ───────────────────────────────
    // Probe set = every 97th document (a deterministic stand-in for an eval
    // benchmark); the remaining corpus is checked for shared 3-shingles.
    QueryDef("q71_contamination",
      (s, d) => Curation.contamination(
        docs(s, d).filter(col("doc_id") % 97 =!= 0),
        docs(s, d).filter(col("doc_id") % 97 === 0), n = 3),
      Some(s"""WITH $sqlShingles,
                   probe AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
                   corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 != 0),
                   m AS (SELECT c.doc_id, c.shingle, p.shingle IS NOT NULL AS hit
                         FROM corpus c LEFT JOIN probe p ON p.shingle = c.shingle),
                   agg AS (SELECT doc_id, count(*) AS n_shingles,
                                  sum(CASE WHEN hit THEN 1 ELSE 0 END) AS n_hits,
                                  min(CASE WHEN hit THEN shingle END) AS first_hit
                           FROM m GROUP BY doc_id)
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     CAST(n_shingles AS BIGINT) AS n_shingles,
                     CAST(n_hits AS BIGINT) AS n_hits,
                     CAST((n_hits * 1000000) // n_shingles AS BIGINT) AS hit_ppm,
                     n_hits > 0 AS is_contaminated, first_hit
              FROM agg"""),
      "Shared-3-shingle contamination vs a broadcast probe set (one shuffle)"),

    // ── dedup: duplicated-span (substring) analysis ────────────────────────
    // Sliding 20-token windows; an occurrence is duplicated iff it is not
    // the corpus-first (min (doc_id, pos)) occurrence of its window text —
    // the practical form of suffix-array substring dedup (Lee et al. 2022).
    QueryDef("q77_dup_spans",
      (s, d) => Dedup.duplicatedSpans(docs(s, d), w = 20),
      Some(s"""WITH toks AS (SELECT doc_id, $sqlToks AS ts FROM documents),
                   wins AS (SELECT doc_id, i AS pos,
                                   md5(array_to_string(list_slice(ts, i, i + 19), ' ')) AS h
                            FROM toks, UNNEST(generate_series(1, len(ts) - 19)) AS u(i)
                            WHERE len(ts) >= 20),
                   marked AS (SELECT doc_id, pos,
                                     min({'doc_id': doc_id, 'pos': pos}) OVER (PARTITION BY h) AS f
                              FROM wins),
                   agg AS (SELECT doc_id, count(*) AS n_windows,
                                  sum(CASE WHEN f.doc_id != doc_id OR f.pos != pos
                                           THEN 1 ELSE 0 END) AS n_dup
                           FROM marked GROUP BY doc_id)
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     CAST(n_windows AS BIGINT) AS n_windows,
                     CAST(n_dup AS BIGINT) AS n_dup,
                     CAST((n_dup * 1000000) // n_windows AS BIGINT) AS dup_ppm,
                     n_dup > 0 AS has_dup
              FROM agg"""),
      "Duplicated 20-token spans vs corpus-first occurrence (two shuffles)"),

    // ── curation: PII detect + redact ──────────────────────────────────────
    // The synthetic corpus contains no PII, so the query injects a
    // deterministic doc_id-derived email/URL/IPv4 suffix on BOTH engines;
    // the oracle then replays the identical ordered redaction.
    QueryDef("q68_pii_scrub",
      (s, d) => {
        val injected = docs(s, d).select(col("doc_id"),
          concat(col("text"),
            lit(" contact u"), col("doc_id").cast("string"),
            lit("@mail"), (col("doc_id") % 7).cast("string"), lit(".example.com"),
            lit(" via https://h"), (col("doc_id") % 5).cast("string"),
            lit(".example.org/p/"), col("doc_id").cast("string"),
            lit(" from 10."), (col("doc_id") % 256).cast("string"),
            lit("."), (col("doc_id") % 100).cast("string"), lit(".1")).as("text"))
        Curation.piiScrub(injected)
          .select(col("doc_id").cast("long").as("doc_id"),
            col("n_urls"), col("n_emails"), col("n_ipv4"),
            substring(md5(col("redacted")), 1, 16).as("red_fp"))
      },
      Some("""WITH inj AS (SELECT doc_id,
                     text || ' contact u' || CAST(doc_id AS VARCHAR)
                          || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
                          || ' via https://h' || CAST(doc_id % 5 AS VARCHAR)
                          || '.example.org/p/' || CAST(doc_id AS VARCHAR)
                          || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                          || '.' || CAST(doc_id % 100 AS VARCHAR) || '.1' AS text
                   FROM documents),
                   t AS (SELECT doc_id, text AS t FROM inj),
                   s1 AS (SELECT doc_id, t,
                            regexp_replace(t, '(?i)https?://[a-z0-9._/-]+', '<URL>', 'g') AS r1
                          FROM t),
                   s2 AS (SELECT doc_id, t, r1,
                            regexp_replace(r1, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g') AS r2
                          FROM s1),
                   s3 AS (SELECT doc_id, t, r1, r2,
                            regexp_replace(r2, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS r3
                          FROM s2)
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     CAST(len(regexp_extract_all(t, '(?i)https?://[a-z0-9._/-]+')) AS BIGINT) AS n_urls,
                     CAST(len(regexp_extract_all(r1, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
                     CAST(len(regexp_extract_all(r2, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ipv4,
                     substr(md5(r3), 1, 16) AS red_fp
              FROM s3"""),
      "Case-insensitive ordered URL→email→IPv4 redaction on the ORIGINAL casing"),

    // ── multimodal: binary column metadata (oracle-checkable slice) ────────
    // The oracle recomputes each container's size from its public layout:
    // BMP = 14+40+1024 header/palette + 4-byte-padded rows; WAV = 44-byte
    // canonical header + samples; video = 8-byte GFV0 header + n_frames BMPs.
    QueryDef("q40_multimodal_bytes",
      (s, d) => Multimodal.synthesize(docs(s, d)).toDF()
        .select(col("media_id").cast("long"), col("modality"),
          length(col("payload")).cast("long").as("byte_len"),
          col("width").cast("long").as("width"), col("height").cast("long").as("height")),
      Some("""WITH d AS (SELECT doc_id,
                     CAST(doc_id % 3 AS INT) AS m3,
                     CAST(doc_id % 64 + 16 AS BIGINT) AS w,
                     CAST(doc_id % 48 + 16 AS BIGINT) AS h,
                     CAST(doc_id % 8 + 1 AS BIGINT) AS nf,
                     CAST(octet_length(encode(text)) AS BIGINT) AS tl
                   FROM documents),
                   s AS (SELECT *, 1078 + ((w + 3) // 4) * 4 * h AS bmp FROM d)
              SELECT CAST(doc_id AS BIGINT) AS media_id,
                     CASE m3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
                     CAST(CASE m3 WHEN 0 THEN bmp WHEN 1 THEN 44 + tl
                          ELSE 8 + nf * bmp END AS BIGINT) AS byte_len,
                     w AS width, h AS height
              FROM s"""),
      "Opaque binary payload + typed metadata; container sizes oracle-checked"),

    // ── multimodal: batch decode + features ────────────────────────────────
    // Features are order-independent functions of the DECODED content bytes
    // (image pixels / audio samples / video frame pixels), so the oracle can
    // recompute them from the source text bytes + the documented fit rule
    // (truncate to the raster size, zero-pad) without parsing containers.
    // mean is emitted as floor(sum·10^6 / len) — integer division on both
    // engines, no float-rounding divergence.
    QueryDef("q41_multimodal_features",
      (s, d) => {
        val feats = Multimodal.extractFeatures(Multimodal.synthesize(docs(s, d))).toDF()
        val hists = (0 until 8).map(i =>
          element_at(col("hist8"), i + 1).cast("long").as(s"h$i"))
        feats.select(Seq(col("media_id").cast("long").as("media_id"), col("modality"),
          col("content_len").cast("long").as("content_len"),
          col("sum_bytes").cast("long").as("sum_bytes"),
          expr("(sum_bytes * 1000000L) DIV nullif(content_len, 0)").as("mean_q6")) ++ hists: _*)
      },
      Some("""WITH d AS (SELECT doc_id,
                     CAST(doc_id % 3 AS INT) AS m3,
                     CAST(doc_id % 64 + 16 AS BIGINT) AS w,
                     CAST(doc_id % 48 + 16 AS BIGINT) AS h,
                     CAST(doc_id % 8 + 1 AS BIGINT) AS nf,
                     hex(encode(text)) AS hx,
                     CAST(octet_length(encode(text)) AS BIGINT) AS tl
                   FROM documents),
                   sized AS (SELECT doc_id, m3, hx, tl,
                     CASE m3 WHEN 0 THEN w * h WHEN 1 THEN tl ELSE nf * w * h END AS content_len
                   FROM d),
                   vals AS (SELECT doc_id, m3, content_len,
                     CASE WHEN i <= tl THEN
                       16 * (instr('0123456789ABCDEF', substr(hx, CAST(2*i - 1 AS INT), 1)) - 1)
                         + instr('0123456789ABCDEF', substr(hx, CAST(2*i AS INT), 1)) - 1
                     ELSE 0 END AS v
                   FROM (SELECT *, unnest(generate_series(1, content_len)) AS i FROM sized)),
                   agg AS (SELECT doc_id,
                     sum(v) AS s,
                     sum(CASE WHEN v // 32 = 0 THEN 1 ELSE 0 END) AS a0,
                     sum(CASE WHEN v // 32 = 1 THEN 1 ELSE 0 END) AS a1,
                     sum(CASE WHEN v // 32 = 2 THEN 1 ELSE 0 END) AS a2,
                     sum(CASE WHEN v // 32 = 3 THEN 1 ELSE 0 END) AS a3,
                     sum(CASE WHEN v // 32 = 4 THEN 1 ELSE 0 END) AS a4,
                     sum(CASE WHEN v // 32 = 5 THEN 1 ELSE 0 END) AS a5,
                     sum(CASE WHEN v // 32 = 6 THEN 1 ELSE 0 END) AS a6,
                     sum(CASE WHEN v // 32 = 7 THEN 1 ELSE 0 END) AS a7
                   FROM vals GROUP BY doc_id)
              SELECT CAST(sized.doc_id AS BIGINT) AS media_id,
                     CASE m3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
                     CAST(content_len AS BIGINT) AS content_len,
                     CAST(coalesce(s, 0) AS BIGINT) AS sum_bytes,
                     CAST(CASE WHEN content_len = 0 THEN NULL
                          ELSE (coalesce(s, 0) * 1000000) // content_len END AS BIGINT) AS mean_q6,
                     CAST(coalesce(a0, 0) AS BIGINT) AS h0,
                     CAST(coalesce(a1, 0) AS BIGINT) AS h1,
                     CAST(coalesce(a2, 0) AS BIGINT) AS h2,
                     CAST(coalesce(a3, 0) AS BIGINT) AS h3,
                     CAST(coalesce(a4, 0) AS BIGINT) AS h4,
                     CAST(coalesce(a5, 0) AS BIGINT) AS h5,
                     CAST(coalesce(a6, 0) AS BIGINT) AS h6,
                     CAST(coalesce(a7, 0) AS BIGINT) AS h7
              FROM sized LEFT JOIN agg ON agg.doc_id = sized.doc_id"""),
      "Real container decode (BMP/WAV/GFV0) → oracle-checked content features"),

    // ── ranking: BM25 keyword retrieval ────────────────────────────────────
    QueryDef("q109_bm25_topk",
      (s, d) => Search.bm25TopK(docs(s, d), Seq("data", "merge", "vector"), 20),
      Some(s"""WITH toks AS (SELECT doc_id, $sqlToks AS ts FROM documents),
                   base AS (SELECT doc_id, len(ts) AS dl, ts FROM toks WHERE len(ts) > 0),
                   stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM base),
                   tok AS (SELECT doc_id, dl, unnest(ts) AS term FROM base),
                   tf AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
                          FROM tok WHERE term IN ('data', 'merge', 'vector')
                          GROUP BY doc_id, dl, term),
                   df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
                   sc AS (SELECT doc_id,
                                 round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                                           * tf * 2.2
                                           / (tf + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))), 6) AS score,
                                 CAST(count(*) AS BIGINT) AS n_terms_hit
                          FROM tf JOIN df USING (term) CROSS JOIN stats GROUP BY doc_id)
              SELECT CAST(doc_id AS BIGINT) AS doc_id, score, n_terms_hit
              FROM sc ORDER BY score DESC, doc_id LIMIT 20"""),
      "Okapi BM25 top-20 for a 3-term query; literal terms, TakeOrdered top-k"),

    // ── decontamination at sketch scale: Bloom prefilter + exact verify ───
    QueryDef("q110_contamination_bloom",
      (s, d) => Curation.contaminationBloom(
        docs(s, d).filter(col("doc_id") % 89 =!= 0),
        docs(s, d).filter(col("doc_id") % 89 === 0), n = 3),
      Some(s"""WITH $sqlShingles,
                   probe AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 89 = 0),
                   corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 89 != 0),
                   hit AS (SELECT c.doc_id, c.shingle
                           FROM corpus c JOIN probe p ON p.shingle = c.shingle)
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     CAST(count(*) AS BIGINT) AS n_hits,
                     min(shingle) AS first_hit
              FROM hit GROUP BY doc_id"""),
      "BloomFilterAggregate/MightContain prefilter, exact-verified (FP-free)"),

    // ── segment-level exact dedup (Lee et al. 2022 ExactSubstr idea) ───────
    QueryDef("q111_segment_dedup",
      (s, d) => Dedup.segmentDedup(docs(s, d), 10),
      Some(s"""WITH toks AS (SELECT doc_id, $sqlToks AS ts FROM documents),
                   base AS (SELECT doc_id, ts FROM toks WHERE len(ts) > 0),
                   idx AS (SELECT doc_id, ts,
                                  unnest(generate_series(0, CAST(floor((len(ts) - 1) / 10.0) AS INT))) AS i
                           FROM base),
                   seg AS (SELECT doc_id, i,
                                  array_to_string(list_slice(ts, i * 10 + 1, i * 10 + 10), ' ') AS seg
                           FROM idx),
                   rk AS (SELECT doc_id, i, seg,
                                 row_number() OVER (PARTITION BY seg ORDER BY doc_id, i) AS rn
                          FROM seg),
                   agg AS (SELECT doc_id, count(*) AS n_segs,
                                  sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_kept,
                                  md5(coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY i), '')) AS kept_md5
                           FROM rk GROUP BY doc_id)
              SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_segs AS BIGINT) AS n_segs,
                     CAST(n_kept AS BIGINT) AS n_kept,
                     CAST((n_kept * 1000000) // n_segs AS BIGINT) AS kept_ppm,
                     kept_md5
              FROM agg"""),
      "First-occurrence-wins passage dedup on 10-token segments; 2 shuffles"),

    // ── embedding clustering: deterministic Lloyd k-means ──────────────────
    QueryDef("q112_kmeans",
      (s, d) => Clustering.kmeansAssign(emb(s, d), k = 8, iters = 3),
      Some(kmeansOracle(k = 8, iters = 3, dim = 64)),
      "Pinned-determinism k-means (rounded centroids/distances), 3 Lloyd iters"),

    // ── domain mixing weights (temperature sampling) ───────────────────────
    QueryDef("q113_mixture_weights",
      (s, d) => Curation.mixtureWeights(docs(s, d), "source", 0.7),
      Some(s"""WITH toks AS (SELECT source, $sqlToks AS ts FROM documents),
                   g AS (SELECT source AS grp, CAST(count(*) AS BIGINT) AS n_docs,
                                CAST(sum(len(ts)) AS BIGINT) AS n_tokens
                         FROM toks GROUP BY source),
                   t AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot_tokens,
                                sum(pow(CAST(n_tokens AS DOUBLE), 0.7)) AS tot_pow
                         FROM g)
              SELECT grp, n_docs, n_tokens,
                     round(n_tokens / tot_tokens, 6) AS token_share,
                     round(pow(CAST(n_tokens AS DOUBLE), 0.7) / tot_pow, 6) AS mix_weight,
                     round(pow(CAST(n_tokens AS DOUBLE), 0.7) / tot_pow
                           / (n_tokens / tot_tokens), 6) AS sample_multiplier
              FROM g CROSS JOIN t"""),
      "Per-source τ=0.7 temperature mixing weights; one corpus shuffle")
  )

  /** DuckDB oracle for [[graft.operators.Clustering.kmeansAssign]]: the same
    * pinned-determinism Lloyd loop unrolled into CTEs — per-iteration
    * round-6 centroids, round-9 distances before the argmin, ties to the
    * lowest cid — so both engines walk IDENTICAL centroid trajectories. */
  private def kmeansOracle(k: Int, iters: Int, dim: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         sd AS (SELECT vec_id, emb, list_dot_product(emb, emb) AS self_dot FROM e),
         dims AS (SELECT unnest(generate_series(1, $dim)) AS dd),
         c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, emb AS ce
                FROM e ORDER BY vec_id LIMIT $k),
         c0d AS (SELECT cid, ce, list_dot_product(ce, ce) AS cdot FROM c0)""")
    for (t <- 1 to iters) {
      val p = s"c${t - 1}d"
      sb.append(s""",
         a$t AS (SELECT vec_id, cid FROM (
             SELECT s.vec_id, c.cid,
                    row_number() OVER (PARTITION BY s.vec_id ORDER BY
                      round(s.self_dot - 2.0 * list_dot_product(s.emb, c.ce) + c.cdot, 9), c.cid) AS rn
             FROM sd s CROSS JOIN $p c) WHERE rn = 1),
         m$t AS (SELECT a.cid, d.dd, avg(s.emb[d.dd]) AS mv
                 FROM a$t a JOIN sd s USING (vec_id) CROSS JOIN dims d GROUP BY a.cid, d.dd),
         c${t}v AS (SELECT p.cid, d.dd, round(coalesce(m.mv, p.ce[d.dd]), 6) AS cv
                    FROM $p p CROSS JOIN dims d
                    LEFT JOIN m$t m ON m.cid = p.cid AND m.dd = d.dd),
         c$t AS (SELECT cid, list(cv ORDER BY dd) AS ce FROM c${t}v GROUP BY cid),
         c${t}d AS (SELECT cid, ce, list_dot_product(ce, ce) AS cdot FROM c$t)""")
    }
    sb.append(s"""
        SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cid AS BIGINT) AS cluster,
               round(d2, 6) AS d2
        FROM (SELECT s.vec_id, c.cid,
                     round(s.self_dot - 2.0 * list_dot_product(s.emb, c.ce) + c.cdot, 9) AS d2,
                     row_number() OVER (PARTITION BY s.vec_id ORDER BY
                       round(s.self_dot - 2.0 * list_dot_product(s.emb, c.ce) + c.cdot, 9), c.cid) AS rn
              FROM sd s CROSS JOIN c${iters}d c) WHERE rn = 1""")
    sb.toString
  }
}
