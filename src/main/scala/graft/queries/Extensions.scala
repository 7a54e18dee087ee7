package graft.queries

import graft.Tables
import graft.functions.{DotI64, ImiCells, Portable}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extracted media features for the multimodal plumbing demo (m01). */
case class MediaFeature(doc_id: Long, n_bytes: Long, checksum32: Long,
                        frame_width: Long, n_frames: Long)

/** Large-scale training-data pipeline operators (BASELINE.json north star):
  * deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash,
  * embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
  * text analysis (token stats, quality, language-ID, fingerprint), and
  * multimodal binary-column plumbing — all over `documents`/`embeddings`.
  *
  * Oracle portability: every similarity number is integer (parts-per-million)
  * or computed from exact integers with single IEEE ops (sqrt/div), so the
  * DuckDB twin is bit-identical — see graft.functions.Portable.
  *
  * Scale posture per operator is noted inline; the common theme: candidate
  * generation (LSH bands, hash buckets) turns O(n²) pairwise work into
  * equi-joins that shuffle-partition by bucket key, which is the only shape
  * that survives 100 TB.
  */
object Extensions extends ExtCore with ExtDedup with ExtSimilarity
    with ExtText with ExtBpe with ExtMultimodal with ExtOracles {
  import Portable.{h32, idiv, ppm, P}

  // ------------------------------------------------------------------- specs

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("d01_dedup_exact", dedupExact, Some(
      """SELECT md5(text) AS text_hash, min(doc_id) AS canonical_doc_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin)),

    QuerySpec("d02_dedup_ngram_jaccard", dedupNgramJaccard, Some(docCtes +
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       count(*) AS common_shingles,
        |       (count(*) * 1000000) // (x.n_sh + y.n_sh - count(*)) AS jaccard_ppm
        |FROM sh a
        |JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
        |JOIN shc x ON x.doc_id = a.doc_id
        |JOIN shc y ON y.doc_id = b.doc_id
        |GROUP BY 1, 2, x.n_sh, y.n_sh
        |HAVING (count(*) * 1000000) // (x.n_sh + y.n_sh - count(*)) >= 800000""".stripMargin)),

    // d14 = d02's job-callable twin: SAME oracle SQL (the block is
    // lossless), so the registry carries the exact-anchor (d02, never
    // wired into a job) and the production form side by side.
    QuerySpec("d14_dedup_jaccard_blocked", dedupNgramJaccardBlocked,
      Some(docCtes +
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       count(*) AS common_shingles,
        |       (count(*) * 1000000) // (x.n_sh + y.n_sh - count(*)) AS jaccard_ppm
        |FROM sh a
        |JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
        |JOIN shc x ON x.doc_id = a.doc_id
        |JOIN shc y ON y.doc_id = b.doc_id
        |GROUP BY 1, 2, x.n_sh, y.n_sh
        |HAVING (count(*) * 1000000) // (x.n_sh + y.n_sh - count(*)) >= 800000""".stripMargin)),

    QuerySpec("d03_dedup_minhash_lsh", dedupMinhashLsh, Some(docCtes +
      minhashCtes +
      """SELECT c.doc_a, c.doc_b,
        |       (COALESCE(cm.c, 0) * 1000000) // (x.n_sh + y.n_sh - COALESCE(cm.c, 0)) AS jaccard_ppm
        |FROM cand c
        |LEFT JOIN common cm ON cm.doc_a = c.doc_a AND cm.doc_b = c.doc_b
        |JOIN shc x ON x.doc_id = c.doc_a
        |JOIN shc y ON y.doc_id = c.doc_b""".stripMargin)),

    QuerySpec("d04_dedup_simhash", dedupSimhash, Some(docCtes +
      """, tokc AS (
        |  SELECT doc_id, tok, count(*) AS c,
        |         ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
        |  FROM tokrows GROUP BY doc_id, tok),
        |bitsum AS (
        |  SELECT doc_id, bit, (1::BIGINT << CAST(bit AS INT)) AS p2,
        |         SUM(c * (2 * ((h // (1::BIGINT << CAST(bit AS INT))) % 2) - 1)) AS sgn
        |  FROM tokc, UNNEST(range(0, 32)) u(bit) GROUP BY 1, 2, 3)
        |SELECT doc_id,
        |       CAST(SUM(CASE WHEN sgn > 0 THEN p2 ELSE 0 END) AS BIGINT) AS simhash
        |FROM bitsum GROUP BY 1""".stripMargin)),

    QuerySpec("d05_dedup_embedding", dedupEmbedding, Some(embCtes +
      """, dots AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2)
        |SELECT vec_a, vec_b, cos_ppm FROM (
        |  SELECT d.vec_a, d.vec_b,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM dots d
        |  JOIN sq x ON x.vec_id = d.vec_a
        |  JOIN sq y ON y.vec_id = d.vec_b) t
        |WHERE cos_ppm >= 350000""".stripMargin)),

    QuerySpec("s01_ann_cosine_topk", annCosineTopK, Some(embCtes +
      """, qdots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id < 10 AND b.vec_id <> a.vec_id
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM qdots d
        |  JOIN sq x ON x.vec_id = d.query_id
        |  JOIN sq y ON y.vec_id = d.neighbor_id)
        |SELECT query_id, neighbor_id, cos_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 5""".stripMargin)),

    QuerySpec("s02_ann_lsh_buckets", annLshBuckets, Some(embCtes +
      """, w AS (
        |  SELECT p, i,
        |         ((('0x' || substr(md5(p || '_' || i), 1, 8))::BIGINT % 2001) - 1000) AS wv
        |  FROM UNNEST(range(0, 32)) a(p), UNNEST(range(1, 65)) b(i)),
        |planes AS (
        |  SELECT ev.vec_id, w.p, SUM(ev.v * w.wv) AS sgn
        |  FROM ev JOIN w ON ev.i = w.i GROUP BY 1, 2),
        |buckets AS (
        |  SELECT vec_id, CAST(p // 4 AS INT) AS t,
        |         CAST(SUM(CASE WHEN sgn > 0 THEN (1::BIGINT << CAST(p % 4 AS INT)) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM planes GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
        |  FROM buckets q JOIN buckets n
        |    ON q.t = n.t AND q.bucket = n.bucket AND q.vec_id < 10 AND n.vec_id <> q.vec_id),
        |cdots AS (
        |  SELECT c.query_id, c.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN ev a ON a.vec_id = c.query_id
        |  JOIN ev b ON b.vec_id = c.neighbor_id AND b.i = a.i
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM cdots d
        |  JOIN sq x ON x.vec_id = d.query_id
        |  JOIN sq y ON y.vec_id = d.neighbor_id)
        |SELECT query_id, neighbor_id, cos_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 5""".stripMargin)),

    QuerySpec("t01_token_stats", tokenStats, Some(
      """SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_chars_measured,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_regex_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_tokens
        |FROM documents""".stripMargin)),

    QuerySpec("t02_quality_score", qualityScore, Some(
      """SELECT doc_id,
        |  CAST(len(t) AS INTEGER) AS n_tokens,
        |  (len(list_filter(t, x -> x IN ('a', 'the'))) * 1000000) // len(t) AS stop_ratio_ppm,
        |  (len(list_distinct(t)) * 1000000) // len(t) AS distinct_ratio_ppm,
        |  (length(replace(text, ' ', '')) * 1000) // len(t) AS avg_token_len_ppk,
        |  CASE WHEN len(t) >= 20
        |        AND (len(list_filter(t, x -> x IN ('a', 'the'))) * 1000000) // len(t) < 300000
        |       THEN 1 ELSE 0 END AS quality_ok
        |FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents) d""".stripMargin)),

    QuerySpec("t03_lang_id", langId, Some(docCtes +
      """, prof AS (
        |  SELECT lang AS plang, tok, count(*) AS c FROM tokrows GROUP BY 1, 2),
        |ptot AS (SELECT plang, CAST(SUM(c) AS BIGINT) AS tot FROM prof GROUP BY 1),
        |profw AS (
        |  SELECT p.plang, p.tok, (p.c * 1000000) // t.tot AS w
        |  FROM prof p JOIN ptot t ON p.plang = t.plang),
        |scores AS (
        |  SELECT d.doc_id, d.lang AS true_lang, p.plang,
        |         CAST(SUM(p.w) AS BIGINT) AS score
        |  FROM tokrows d JOIN profw p ON d.tok = p.tok
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id, true_lang, plang AS predicted_lang, score FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |              ORDER BY score DESC, plang ASC) AS rn
        |  FROM scores) t
        |WHERE rn = 1""".stripMargin)),

    QuerySpec("t04_fingerprint", fingerprint, Some(docCtes +
      """SELECT doc_id,
        |  CAST(SUM((pos * ('0x' || substr(md5(tok), 1, 8))::BIGINT) % 2147483647)
        |       % 2147483647 AS BIGINT) AS fingerprint,
        |  count(*) AS n_tokens
        |FROM tokrows GROUP BY 1""".stripMargin)),

    // octet_length(encode(..)) = UTF-8 byte length, matching the Spark
    // side's encode(text,'UTF-8').length — length(text) would count
    // characters and diverge on any non-ASCII document.
    QuerySpec("m01_multimodal_features", multimodalFeatures, Some(
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  ('0x' || substr(md5(text), 1, 8))::BIGINT AS checksum32,
        |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS frame_width,
        |  CAST(octet_length(encode(text)) // 1000 + 1 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin)),

    // True connected components: the oracle's recursive CTE enumerates every
    // (node, reachable-node) pair of the symmetric edge set and takes the
    // minimum — exact for ANY component diameter, matching the Spark side's
    // run-to-fixpoint label propagation. Both sides cluster the LSH-verified
    // candidate graph (ccCtes ≡ connectedComponents(lshPairs)).
    QuerySpec("d06_dedup_clusters", dedupClusters,
      Some(ccCtes + "SELECT doc_id, cluster_id FROM labels")),

    QuerySpec("d07_canonical_corpus", canonicalCorpus,
      Some(ccCtes +
      """SELECT d.doc_id, d.lang,
        |  COALESCE(l.cluster_id, d.doc_id) AS canonical_id,
        |  CASE WHEN COALESCE(l.cluster_id, d.doc_id) = d.doc_id
        |       THEN 1 ELSE 0 END AS is_kept
        |FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id""".stripMargin)),

    QuerySpec("t10_tfidf_topterms", tfIdfTopTerms, Some(docCtes +
      """, tf AS (
        |  SELECT lang, doc_id, tok, count(*) AS tf FROM tokrows GROUP BY 1, 2, 3),
        |dfc AS (SELECT lang, tok, count(*) AS df FROM tf GROUP BY 1, 2),
        |nd AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
        |scored AS (
        |  SELECT t.doc_id, t.tok, t.tf,
        |         (n.n_docs * 1000000) // d.df AS idf_ppm,
        |         t.tf * ((n.n_docs * 1000000) // d.df) AS tfidf
        |  FROM tf t
        |  JOIN dfc d ON d.lang = t.lang AND d.tok = t.tok
        |  JOIN nd n ON n.lang = t.lang)
        |SELECT doc_id, term_rank, tok, tf, idf_ppm, tfidf FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |              ORDER BY tfidf DESC, tok ASC) AS INTEGER) AS term_rank
        |  FROM scored) x
        |WHERE term_rank <= 3""".stripMargin)),

    QuerySpec("d08_edit_distance_pairs", dedupEditDistance, Some(
      """WITH d AS (
        |  SELECT doc_id, lang, substr(text, 1, 20) AS prefix,
        |         length(text) // 50 AS lenb
        |  FROM documents),
        |blocked AS (
        |  SELECT doc_id, lang, prefix, lenb, lenb AS blk FROM d
        |  UNION ALL
        |  SELECT doc_id, lang, prefix, lenb, lenb + 1 AS blk FROM d),
        |cand AS (
        |  SELECT least(a.doc_id, b.doc_id) AS doc_a,
        |         greatest(a.doc_id, b.doc_id) AS doc_b,
        |         a.prefix AS pa, b.prefix AS pb
        |  FROM blocked a
        |  JOIN d b ON a.lang = b.lang AND a.blk = b.lenb
        |          AND (a.lenb < b.lenb OR a.doc_id < b.doc_id))
        |SELECT doc_a, doc_b,
        |  CAST(levenshtein(pa, pb) AS INTEGER) AS edit_dist
        |FROM cand
        |WHERE levenshtein(pa, pb) <= 10""".stripMargin)),

    QuerySpec("t12_stratified_reservoir", stratifiedReservoir, Some(
      """WITH d AS (
        |  SELECT lang, doc_id,
        |         ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
        |  FROM documents)
        |SELECT lang, sample_rank, doc_id, h FROM (
        |  SELECT lang, doc_id, h,
        |    CAST(row_number() OVER (PARTITION BY lang
        |          ORDER BY h ASC, doc_id ASC) AS INTEGER) AS sample_rank
        |  FROM d) x
        |WHERE sample_rank <= 10""".stripMargin)),

    QuerySpec("m03_chunk_checksums", chunkChecksums, Some(
      """WITH d AS (SELECT doc_id, text, length(text) AS len
        |           FROM documents WHERE length(text) > 0),
        |ch AS (
        |  SELECT doc_id, i AS chunk_idx,
        |         substr(text, CAST(i * 1000 + 1 AS INT), 1000) AS chunk
        |  FROM d, UNNEST(range(0, (len - 1) // 1000 + 1)) u(i))
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(length(chunk) AS BIGINT) AS chunk_len,
        |  ('0x' || substr(md5(chunk), 1, 8))::BIGINT AS checksum32
        |FROM ch""".stripMargin)),

    QuerySpec("m04_phash_neardup", mediaPhashPairs, Some(
      """WITH d AS (SELECT doc_id, text, length(text) AS len
        |           FROM documents WHERE length(text) >= 64),
        |w AS (
        |  SELECT doc_id, substr(text, CAST(k * 16 + 1 AS INT), 64) AS win
        |  FROM d, UNNEST(range(0, (len - 64) // 16 + 1)) u(k)),
        |wh AS (
        |  SELECT doc_id, win,
        |         ('0x' || substr(md5(win), 1, 8))::BIGINT AS h0,
        |         ('0x' || substr(md5('w1#' || win), 1, 8))::BIGINT AS h1
        |  FROM w),
        |bitsum AS (
        |  SELECT doc_id, bit,
        |         CASE WHEN bit = 63 THEN (-9223372036854775807 - 1)
        |              ELSE (1::BIGINT << CAST(bit AS INT)) END AS p2,
        |         SUM(2 * (((CASE WHEN bit < 32 THEN h0 ELSE h1 END)
        |                   // (1::BIGINT << CAST(bit % 32 AS INT))) % 2) - 1) AS sgn
        |  FROM wh, UNNEST(range(0, 64)) u(bit) GROUP BY 1, 2, 3),
        |sigs AS (
        |  SELECT doc_id,
        |         CAST(SUM(CASE WHEN sgn > 0 THEN p2 ELSE 0 END) AS BIGINT) AS sig
        |  FROM bitsum GROUP BY 1),
        |banded AS (
        |  SELECT b.band, ((s.sig >> CAST(16 * b.band AS INT)) & 65535) AS bkey,
        |         s.doc_id, s.sig
        |  FROM sigs s, UNNEST(range(0, 4)) b(band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         a.sig AS sig_a, b.sig AS sig_b
        |  FROM banded a JOIN banded b
        |    ON b.band = a.band AND b.bkey = a.bkey AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        |       CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3""".stripMargin)),

    QuerySpec("m05_phash_incremental", phashIncremental, Some(
      """WITH d AS (SELECT doc_id, text, length(text) AS len
        |           FROM documents WHERE length(text) >= 64),
        |w AS (
        |  SELECT doc_id, substr(text, CAST(k * 16 + 1 AS INT), 64) AS win
        |  FROM d, UNNEST(range(0, (len - 64) // 16 + 1)) u(k)),
        |wh AS (
        |  SELECT doc_id, win,
        |         ('0x' || substr(md5(win), 1, 8))::BIGINT AS h0,
        |         ('0x' || substr(md5('w1#' || win), 1, 8))::BIGINT AS h1
        |  FROM w),
        |bitsum AS (
        |  SELECT doc_id, bit,
        |         CASE WHEN bit = 63 THEN (-9223372036854775807 - 1)
        |              ELSE (1::BIGINT << CAST(bit AS INT)) END AS p2,
        |         SUM(2 * (((CASE WHEN bit < 32 THEN h0 ELSE h1 END)
        |                   // (1::BIGINT << CAST(bit % 32 AS INT))) % 2) - 1) AS sgn
        |  FROM wh, UNNEST(range(0, 64)) u(bit) GROUP BY 1, 2, 3),
        |sigs AS (
        |  SELECT doc_id,
        |         CAST(SUM(CASE WHEN sgn > 0 THEN p2 ELSE 0 END) AS BIGINT) AS sig
        |  FROM bitsum GROUP BY 1),
        |cut AS (SELECT max(doc_id) * 9 AS c9 FROM documents),
        |banded AS (
        |  SELECT b.band, ((s.sig >> CAST(16 * b.band AS INT)) & 65535) AS bkey,
        |         s.doc_id, s.sig
        |  FROM sigs s, UNNEST(range(0, 4)) b(band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS new_doc, b.doc_id AS other_doc,
        |         a.sig AS sa, b.sig AS sb
        |  FROM banded a JOIN banded b
        |    ON b.band = a.band AND b.bkey = a.bkey AND a.doc_id <> b.doc_id,
        |    cut
        |  WHERE a.doc_id * 10 > cut.c9
        |    AND (b.doc_id * 10 <= cut.c9 OR a.doc_id < b.doc_id))
        |SELECT new_doc, other_doc,
        |       CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin)),

    QuerySpec("t13_corpus_materialize", corpusMaterialize,
      Some(ccCtes +
      """, kept AS (
        |  SELECT d.doc_id FROM documents d
        |  LEFT JOIN labels l ON l.doc_id = d.doc_id
        |  WHERE COALESCE(l.cluster_id, d.doc_id) = d.doc_id),
        |quality AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, string_split(text, ' ') AS t FROM documents) q
        |  WHERE len(t) >= 20
        |    AND (len(list_filter(t, x -> x IN ('a', 'the'))) * 1000000) // len(t) < 300000)
        |SELECT d.lang,
        |  CASE WHEN ('0x' || substr(md5(d.text), 1, 8))::BIGINT % 100 < 80 THEN 'train'
        |       WHEN ('0x' || substr(md5(d.text), 1, 8))::BIGINT % 100 < 90 THEN 'valid'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens
        |FROM documents d
        |JOIN kept k ON k.doc_id = d.doc_id
        |JOIN quality q ON q.doc_id = d.doc_id
        |GROUP BY 1, 2""".stripMargin)),

    // 64-bit twin of d04's 32-bit signature SQL: bits 32..63 from the
    // salted second hash; bit 63's power-of-two spelled as INT64 min
    // (DuckDB refuses both `1 << 63` and the raw negative literal);
    // 4 × 16-bit block keys (the radius+1 minimum — see simhashPairsAt)
    // via (sig >> 16k) & 65535, which is sign-safe where the 32-bit
    // form's `// 2^8k % 256` would diverge on negative signatures
    // (integer division truncates toward zero, the shift toward -inf).
    QuerySpec("d12_simhash_pairs", dedupSimhashPairs, Some(docCtes +
      """, tokc AS (
        |  SELECT doc_id, tok, count(*) AS c,
        |         ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h0,
        |         ('0x' || substr(md5('w1#' || tok), 1, 8))::BIGINT AS h1
        |  FROM tokrows GROUP BY doc_id, tok),
        |bitsum AS (
        |  SELECT doc_id, bit,
        |         CASE WHEN bit = 63 THEN (-9223372036854775807 - 1)
        |              ELSE (1::BIGINT << CAST(bit AS INT)) END AS p2,
        |         SUM(c * (2 * (((CASE WHEN bit < 32 THEN h0 ELSE h1 END)
        |                        // (1::BIGINT << CAST(bit % 32 AS INT))) % 2) - 1)) AS sgn
        |  FROM tokc, UNNEST(range(0, 64)) u(bit) GROUP BY 1, 2, 3),
        |sigs AS (
        |  SELECT doc_id,
        |         CAST(SUM(CASE WHEN sgn > 0 THEN p2 ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bitsum GROUP BY 1),
        |banded AS (
        |  SELECT b.band,
        |         ((s.simhash >> CAST(16 * b.band AS INT)) & 65535) AS bkey,
        |         s.doc_id, s.simhash
        |  FROM sigs s, UNNEST(range(0, 4)) b(band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         a.simhash AS sig_a, b.simhash AS sig_b
        |  FROM banded a JOIN banded b
        |    ON b.band = a.band AND b.bkey = a.bkey AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        |       CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3""".stripMargin)),

    // d13's oracle = s05's cell-blocked pair chain feeding an ITERATIVE
    // min-label connected-components unroll and d07's resolution tail —
    // the same composition the Spark side makes out of shared code
    // paths. A WITH RECURSIVE closure (rounds 5-9) computed the full
    // (node, reachable-label) relation with UNION dedup — quadratic in
    // component size, >120 s at sf0.1, which forced the sweep to skip
    // this query. The unroll below is the Spark fixpoint's own shape:
    // each round keeps ONE label per node (min over self, neighbors,
    // and the label's label — pointer jumping, so coverage grows
    // super-linearly; measured convergence is 9 rounds at BOTH sf0.01
    // and sf0.1 under the flat quantizer; the IMI cell structure has a
    // longer-diameter component at sf0.001, measured 14 — unrolled to
    // 16 for margin at ~zero marginal cost),
    // linear work per round. Depth is guarded, not assumed: a 13th
    // round feeds a sentinel row (doc_id -1, lang 'NONCONVERGED')
    // emitted only if any label still moves — the compare then fails
    // loudly instead of silently passing stale labels. The whole pair
    // chain is marked MATERIALIZED (here only — the shared embCtes stay
    // untouched for the other oracles): spairs feeds e's two-direction
    // union and scand reads assigned twice, so default inlining re-runs
    // the full embedding chain multiplicatively (measured 192 s at
    // sf0.1 vs 33 s materialized).
    QuerySpec("d13_semantic_canonical", semanticCanonical,
      Some(Seq("ev", "sq").foldLeft(embCtes)((s, c) =>
        s.replace(c + " AS (", c + " AS MATERIALIZED (")) + ", " + imiAssign4Ctes +
      """scand AS MATERIALIZED (
        |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
        |  FROM assigned x
        |  JOIN assigned y ON y.cell = x.cell AND x.vec_id < y.vec_id),
        |sdots AS MATERIALIZED (
        |  SELECT c.vec_a, c.vec_b, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM scand c
        |  JOIN ev a ON a.vec_id = c.vec_a
        |  JOIN ev b ON b.vec_id = c.vec_b AND b.i = a.i
        |  GROUP BY 1, 2),
        |spairs AS MATERIALIZED (
        |  SELECT vec_a AS doc_a, vec_b AS doc_b FROM (
        |    SELECT p.vec_a, p.vec_b,
        |           CAST(floor(p.dot / (sqrt(sx.s2) * sqrt(sy.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |    FROM sdots p
        |    JOIN sq sx ON sx.vec_id = p.vec_a
        |    JOIN sq sy ON sy.vec_id = p.vec_b) t
        |  WHERE cos_ppm >= 350000),
        |e AS MATERIALIZED (SELECT doc_a, doc_b FROM spairs
        |      UNION ALL SELECT doc_b, doc_a FROM spairs),
        |l0 AS MATERIALIZED (SELECT DISTINCT doc_a AS doc_id, doc_a AS lab FROM e),
        |""".stripMargin + (1 to 17).map(ccRoundSql).mkString +
      """labels AS (SELECT doc_id, lab AS cluster_id FROM l16)
        |SELECT d.doc_id, d.lang,
        |  COALESCE(l.cluster_id, d.doc_id) AS canonical_id,
        |  CASE WHEN COALESCE(l.cluster_id, d.doc_id) = d.doc_id
        |       THEN 1 ELSE 0 END AS is_kept
        |FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT) AS doc_id, 'NONCONVERGED' AS lang,
        |       CAST(-1 AS BIGINT) AS canonical_id, 0 AS is_kept
        |FROM (SELECT 1 AS x) one
        |WHERE EXISTS (SELECT 1 FROM l16 a JOIN l17 b
        |              ON b.doc_id = a.doc_id AND b.lab <> a.lab)""".stripMargin)),

    QuerySpec("t16_decontaminated_corpus", corpusDecontaminated,
      Some(ccCtes +
      """, kept AS (
        |  SELECT d.doc_id FROM documents d
        |  LEFT JOIN labels l ON l.doc_id = d.doc_id
        |  WHERE COALESCE(l.cluster_id, d.doc_id) = d.doc_id),
        |quality AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, string_split(text, ' ') AS t FROM documents) q
        |  WHERE len(t) >= 20
        |    AND (len(list_filter(t, x -> x IN ('a', 'the'))) * 1000000) // len(t) < 300000),
        |gd AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS bucket,
        |         string_split(text, ' ') AS t
        |  FROM documents),
        |grams16 AS (
        |  SELECT DISTINCT doc_id, bucket,
        |         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |         t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] AS gram
        |  FROM gd, UNNEST(range(1, greatest(len(t) - 6, 1))) u(i)),
        |testg AS (SELECT DISTINCT gram FROM grams16 WHERE bucket >= 90),
        |badtrain AS (
        |  SELECT DISTINCT g.doc_id
        |  FROM grams16 g JOIN testg tg ON tg.gram = g.gram
        |  WHERE g.bucket < 80)
        |SELECT d.lang,
        |  CASE WHEN ('0x' || substr(md5(d.text), 1, 8))::BIGINT % 100 < 80 THEN 'train'
        |       WHEN ('0x' || substr(md5(d.text), 1, 8))::BIGINT % 100 < 90 THEN 'valid'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens
        |FROM documents d
        |JOIN kept k ON k.doc_id = d.doc_id
        |JOIN quality q ON q.doc_id = d.doc_id
        |LEFT JOIN badtrain b ON b.doc_id = d.doc_id
        |WHERE b.doc_id IS NULL
        |GROUP BY 1, 2""".stripMargin)),

    QuerySpec("t20_bigram_lm_score", bigramLmScore, Some(
      """WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
        |tokrows AS (SELECT doc_id, lang, pos, t[pos] AS tok
        |            FROM toks, UNNEST(range(1, len(t) + 1)) u(pos)),
        |big AS (
        |  SELECT a.doc_id, a.lang, a.tok AS ta, b.tok AS tb
        |  FROM tokrows a JOIN tokrows b
        |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
        |cab AS (SELECT lang, ta, tb, count(*) AS c FROM big GROUP BY 1, 2, 3),
        |ca AS (SELECT lang, tok AS ta, count(*) AS c1 FROM tokrows GROUP BY 1, 2),
        |model AS (
        |  SELECT cab.lang, cab.ta, cab.tb, (cab.c * 1000000) // ca.c1 AS p_ppm
        |  FROM cab JOIN ca ON ca.lang = cab.lang AND ca.ta = cab.ta)
        |SELECT b.doc_id, count(*) AS n_bigrams,
        |  CAST(SUM(m.p_ppm) // count(*) AS BIGINT) AS lm_score_ppm
        |FROM big b JOIN model m
        |  ON m.lang = b.lang AND m.ta = b.ta AND m.tb = b.tb
        |GROUP BY 1""".stripMargin)),

    QuerySpec("t21_ngram_novelty", ngramNovelty, Some(docCtes + ", " +
      """fs AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1),
        |per AS (
        |  SELECT s.doc_id, count(*) AS n_grams,
        |         count(CASE WHEN f.first_doc = s.doc_id THEN 1 END) AS n_novel
        |  FROM sh s JOIN fs f ON f.shingle = s.shingle
        |  GROUP BY 1)
        |SELECT d.doc_id,
        |  COALESCE(p.n_grams, 0) AS n_grams,
        |  COALESCE(p.n_novel, 0) AS n_novel,
        |  CASE WHEN p.n_grams > 0
        |       THEN (p.n_novel * 1000000) // p.n_grams END AS novelty_ppm
        |FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id""".stripMargin)),

    QuerySpec("t22_novelty_incremental", noveltyIncremental, Some(docCtes + ", " +
      """cut AS (SELECT max(doc_id) * 9 AS c9 FROM documents),
        |basef AS (
        |  SELECT shingle, min(doc_id) AS base_first
        |  FROM sh, cut WHERE doc_id * 10 <= c9 GROUP BY 1),
        |delta AS (
        |  SELECT s.doc_id, s.shingle FROM sh s, cut WHERE s.doc_id * 10 > c9),
        |deltaf AS (SELECT shingle, min(doc_id) AS delta_first
        |           FROM delta GROUP BY 1),
        |per AS (
        |  SELECT d.doc_id, count(*) AS n_grams,
        |         count(CASE WHEN b.base_first IS NULL
        |                     AND f.delta_first = d.doc_id THEN 1 END) AS n_novel
        |  FROM delta d
        |  LEFT JOIN basef b ON b.shingle = d.shingle
        |  JOIN deltaf f ON f.shingle = d.shingle
        |  GROUP BY 1)
        |SELECT dd.doc_id,
        |  COALESCE(p.n_grams, 0) AS n_grams,
        |  COALESCE(p.n_novel, 0) AS n_novel,
        |  CASE WHEN p.n_grams > 0
        |       THEN (p.n_novel * 1000000) // p.n_grams END AS novelty_ppm
        |FROM documents dd CROSS JOIN cut
        |LEFT JOIN per p ON p.doc_id = dd.doc_id
        |WHERE dd.doc_id * 10 > cut.c9""".stripMargin)),

    QuerySpec("t23_source_stats", sourceStats, Some(docCtes + ", " +
      """fs AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1),
        |per AS (
        |  SELECT s.doc_id, count(*) AS n_grams,
        |         count(CASE WHEN f.first_doc = s.doc_id THEN 1 END) AS n_novel
        |  FROM sh s JOIN fs f ON f.shingle = s.shingle
        |  GROUP BY 1),
        |nov AS (
        |  SELECT d.doc_id, COALESCE(p.n_grams, 0) AS n_grams,
        |         COALESCE(p.n_novel, 0) AS n_novel
        |  FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id)
        |SELECT d.source, count(*) AS n_docs,
        |  CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS total_tokens,
        |  count(DISTINCT d.lang) AS n_langs,
        |  CAST(SUM(n.n_grams) AS BIGINT) AS n_grams,
        |  CAST(SUM(n.n_novel) AS BIGINT) AS n_novel,
        |  CASE WHEN SUM(n.n_grams) > 0
        |       THEN CAST((SUM(n.n_novel) * 1000000) // SUM(n.n_grams) AS BIGINT)
        |  END AS novelty_ppm
        |FROM documents d JOIN nov n ON n.doc_id = d.doc_id
        |GROUP BY 1""".stripMargin)),

    QuerySpec("t17_boilerplate_scrub", boilerplateScrub, Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |segs AS (
        |  SELECT t.doc_id,
        |         array_to_string(tk[(u.i * 10 + 1):(u.i * 10 + 10)], ' ') AS seg
        |  FROM t, UNNEST(range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT))) u(i)),
        |f AS (SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY 1)
        |SELECT s.doc_id,
        |  count(*) AS n_segments,
        |  CAST(SUM(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  CAST(SUM(CASE WHEN f.df < 2 THEN len(string_split(s.seg, ' ')) ELSE 0 END) AS BIGINT) AS n_toks_kept
        |FROM segs s JOIN f ON f.seg = s.seg
        |GROUP BY 1""".stripMargin)),

    QuerySpec("t19_scrubbed_corpus", scrubbedCorpus, Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |segs AS (
        |  SELECT t.doc_id, u.i,
        |         array_to_string(tk[(u.i * 10 + 1):(u.i * 10 + 10)], ' ') AS seg
        |  FROM t, UNNEST(range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT))) u(i)),
        |f AS (SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY 1),
        |k AS (
        |  SELECT s.doc_id, string_agg(s.seg, ' ' ORDER BY s.i) AS clean_text
        |  FROM segs s JOIN f ON f.seg = s.seg
        |  WHERE f.df < 2
        |  GROUP BY 1)
        |SELECT d.doc_id, COALESCE(k.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN k ON k.doc_id = d.doc_id""".stripMargin)),

    QuerySpec("t18_token_budget_mix", tokenBudgetMix, Some(
      """WITH d AS (
        |  SELECT lang, ('0x' || substr(md5(text), 1, 8))::BIGINT AS h,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents),
        |c AS (SELECT lang, CAST(SUM(n_toks) AS BIGINT) AS lang_toks
        |      FROM d GROUP BY 1),
        |b AS (SELECT CAST(SUM(lang_toks) AS BIGINT) // count(*) AS budget_toks
        |      FROM c),
        |r AS (SELECT c.lang, c.lang_toks, b.budget_toks,
        |        CAST(least(1000000, (b.budget_toks * 1000000) // c.lang_toks) AS BIGINT) AS rate_ppm
        |      FROM c, b)
        |SELECT r.lang, r.lang_toks, r.budget_toks, r.rate_ppm,
        |  count(CASE WHEN d.h % 1000000 < r.rate_ppm THEN 1 END) AS n_docs_kept,
        |  CAST(COALESCE(SUM(CASE WHEN d.h % 1000000 < r.rate_ppm THEN d.n_toks END), 0) AS BIGINT) AS n_toks_kept
        |FROM d JOIN r ON r.lang = d.lang
        |GROUP BY 1, 2, 3, 4""".stripMargin)),

    QuerySpec("t11_temperature_sample", temperatureSample, Some(
      """WITH d AS (
        |  SELECT lang, ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
        |  FROM documents),
        |c AS (SELECT lang, count(*) AS n_docs FROM d GROUP BY 1),
        |m AS (SELECT min(n_docs) AS n_min FROM c),
        |p AS (SELECT c.lang, c.n_docs,
        |        CAST(floor(sqrt(m.n_min / c.n_docs) * 1000000 + 0.5) AS BIGINT) AS p_ppm
        |      FROM c, m)
        |SELECT p.lang, p.n_docs, p.p_ppm,
        |  count(CASE WHEN d.h % 1000000 < p.p_ppm THEN 1 END) AS n_kept
        |FROM d JOIN p ON p.lang = d.lang
        |GROUP BY 1, 2, 3""".stripMargin)),

    QuerySpec("s03_ann_ivf", annIvf, Some(embCtes + ", " + imiAssignProbeCtes(12) +
      """cand AS (
        |  SELECT p.query_id, a.neighbor_id
        |  FROM probes p JOIN assigned a ON a.cell = p.cell
        |  WHERE a.neighbor_id <> p.query_id),
        |cdots AS (
        |  SELECT c.query_id, c.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN ev a ON a.vec_id = c.query_id
        |  JOIN ev b ON b.vec_id = c.neighbor_id AND b.i = a.i
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM cdots d
        |  JOIN sq x ON x.vec_id = d.query_id
        |  JOIN sq y ON y.vec_id = d.neighbor_id)
        |SELECT query_id, neighbor_id, cos_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 5""".stripMargin)),

    QuerySpec("s11_ann_filtered", annIvfFiltered,
      Some(filteredIvfOracle)),

    QuerySpec("s12_ann_filtered_indexed", annIvfFilteredIndexed,
      Some(filteredIvfOracle)),

    QuerySpec("t06_stratified_split", stratifiedSplit, Some(
      """SELECT lang,
        |  CASE WHEN ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 < 80 THEN 'train'
        |       WHEN ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 < 90 THEN 'valid'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs
        |FROM documents GROUP BY 1, 2""".stripMargin)),

    QuerySpec("t07_length_histogram", lengthHistogram, Some(
      """SELECT (CAST(len(string_split(text, ' ')) AS BIGINT) // 10) * 10 AS bucket_lo,
        |  count(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin)),

    QuerySpec("s04_lang_centroids", langCentroids, Some(embCtes +
      """SELECT d.lang, e.i AS dim, count(*) AS n_vecs,
        |  CAST(SUM(e.v) AS BIGINT) // count(*) AS centroid_ppm
        |FROM ev e JOIN documents d ON d.doc_id = e.vec_id
        |GROUP BY 1, 2""".stripMargin)),

    QuerySpec("s10_centroid_outliers", centroidOutliers, Some(embCtes +
      """, el AS (
        |  SELECT e.vec_id, e.i, e.v, d.lang
        |  FROM ev e JOIN documents d ON d.doc_id = e.vec_id),
        |cs AS (SELECT lang, i, CAST(SUM(v) AS BIGINT) AS sv
        |       FROM el GROUP BY 1, 2),
        |cs2 AS (SELECT lang, CAST(SUM(sv * sv) AS BIGINT) AS cs2
        |        FROM cs GROUP BY 1),
        |dots AS (
        |  SELECT el.vec_id, el.lang, CAST(SUM(el.v * c.sv) AS BIGINT) AS dot
        |  FROM el JOIN cs c ON c.lang = el.lang AND c.i = el.i
        |  GROUP BY 1, 2)
        |SELECT vec_id, lang, cos_ppm,
        |  CASE WHEN cos_ppm < 0 THEN 1 ELSE 0 END AS is_outlier
        |FROM (
        |  SELECT d.vec_id, d.lang,
        |         CAST(floor(d.dot / (sqrt(s.s2) * sqrt(c.cs2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM dots d
        |  JOIN sq s ON s.vec_id = d.vec_id
        |  JOIN cs2 c ON c.lang = d.lang) t""".stripMargin)),

    QuerySpec("t08_vocab_topk", vocabTopK, Some(docCtes +
      """SELECT lang, rnk, tok, c FROM (
        |  SELECT lang, tok, count(*) AS c,
        |    CAST(row_number() OVER (PARTITION BY lang
        |          ORDER BY count(*) DESC, tok ASC) AS INTEGER) AS rnk
        |  FROM tokrows GROUP BY lang, tok) t
        |WHERE rnk <= 20""".stripMargin)),

    QuerySpec("t09_pack_bins", packBins, Some(
      """WITH d AS (
        |  SELECT doc_id, lang,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, lang, n_tokens,
        |  COALESCE(CAST(SUM(n_tokens) OVER (PARTITION BY lang
        |             ORDER BY n_tokens DESC, doc_id ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS BIGINT), 0) // 2048 AS bin_id
        |FROM d""".stripMargin)),

    QuerySpec("t05_text_normalize", textNormalize, Some(
      """SELECT doc_id, norm_text,
        |  ('0x' || substr(md5(norm_text), 1, 8))::BIGINT AS norm_hash,
        |  CAST(length(norm_text) AS INTEGER) AS n_chars_norm
        |FROM (SELECT doc_id,
        |        lower(trim(regexp_replace(
        |          regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' +', ' ', 'g')))
        |          AS norm_text
        |      FROM documents) t""".stripMargin)),

    QuerySpec("m02_frame_sample", frameSample, Some(
      """SELECT doc_id, u.frame_id, u.frame_id * 1000 AS frame_offset,
        |  ('0x' || substr(md5(doc_id || ':' || u.frame_id), 1, 8))::BIGINT AS frame_sig
        |FROM (SELECT doc_id, octet_length(encode(text)) // 1000 + 1 AS n_frames
        |      FROM documents) m,
        |  UNNEST(range(0, m.n_frames, 3)) u(frame_id)""".stripMargin)),

    QuerySpec("s05_semdedup_cells", semdedupCells, Some(semdedupOracleSql)),

    // s09 is s05 with the assignment READ from the stored index instead
    // of recomputed — semantically identical by contract, so it is
    // checked against the IDENTICAL oracle SQL (and SemDedupIndexSpec
    // pins the two Spark plans row-for-row equal).
    QuerySpec("s09_semdedup_indexed", semdedupIndexed, Some(semdedupOracleSql)),

    QuerySpec("s06_ann_truncated", annTruncated, Some(embCtes +
      """, psq AS (
        |  SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS sp
        |  FROM ev WHERE i <= 32 GROUP BY 1),
        |pdots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         CAST(SUM(a.v * b.v) AS BIGINT) AS pdot
        |  FROM ev a JOIN ev b ON a.i = b.i AND a.i <= 32
        |   AND a.vec_id < 10 AND b.vec_id <> a.vec_id
        |  GROUP BY 1, 2),
        |pscored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.pdot / (sqrt(x.sp) * sqrt(y.sp)) * 1000000 + 0.5) AS BIGINT) AS pcos
        |  FROM pdots d
        |  JOIN psq x ON x.vec_id = d.query_id
        |  JOIN psq y ON y.vec_id = d.neighbor_id),
        |cand AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |                ORDER BY pcos DESC, neighbor_id) AS prn
        |    FROM pscored) t WHERE prn <= 100),
        |cdots AS (
        |  SELECT c.query_id, c.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN ev a ON a.vec_id = c.query_id
        |  JOIN ev b ON b.vec_id = c.neighbor_id AND b.i = a.i
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM cdots d
        |  JOIN sq x ON x.vec_id = d.query_id
        |  JOIN sq y ON y.vec_id = d.neighbor_id)
        |SELECT query_id, neighbor_id, cos_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 5""".stripMargin)),

    QuerySpec("s13_ann_sq8", annSq8, Some(embCtes +
      """, dim AS (SELECT i, min(v) AS mn, max(v) - min(v) AS r
        |         FROM ev GROUP BY 1),
        |code AS (
        |  SELECT e.vec_id, e.i,
        |    CASE WHEN d.r = 0 THEN 255 * d.mn
        |         ELSE 255 * d.mn + (((e.v - d.mn) * 510 + d.r) // (2 * d.r)) * d.r
        |    END AS vh
        |  FROM ev e JOIN dim d ON d.i = e.i),
        |csq AS (SELECT vec_id, CAST(SUM(vh * vh) AS BIGINT) AS ss
        |        FROM code GROUP BY 1),
        |adots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         CAST(SUM(a.vh * b.vh) AS BIGINT) AS adot
        |  FROM code a JOIN code b ON a.i = b.i
        |   AND a.vec_id < 10 AND b.vec_id <> a.vec_id
        |  GROUP BY 1, 2),
        |ascored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.adot / (sqrt(x.ss) * sqrt(y.ss)) * 1000000 + 0.5) AS BIGINT) AS acos
        |  FROM adots d
        |  JOIN csq x ON x.vec_id = d.query_id
        |  JOIN csq y ON y.vec_id = d.neighbor_id),
        |cand AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |                ORDER BY acos DESC, neighbor_id) AS arn
        |    FROM ascored) t WHERE arn <= 100),
        |cdots AS (
        |  SELECT c.query_id, c.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN ev a ON a.vec_id = c.query_id
        |  JOIN ev b ON b.vec_id = c.neighbor_id AND b.i = a.i
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM cdots d
        |  JOIN sq x ON x.vec_id = d.query_id
        |  JOIN sq y ON y.vec_id = d.neighbor_id)
        |SELECT query_id, neighbor_id, cos_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 5""".stripMargin)),

    QuerySpec("s07_ann_ivf_prefix", annIvfPrefix, Some(ivfPrefixOracle)),

    // s08 answers the SAME query as s07 from the materialized index —
    // one oracle text, two engine-side strategies that must agree
    // row-for-row (AnnIndexSpec pins the frames identical too).
    QuerySpec("s08_ann_ivf_indexed", annIvfIndexed, Some(ivfPrefixOracle)),

    QuerySpec("d09_contamination", contamination, Some(
      """WITH d AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS bucket,
        |         string_split(text, ' ') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, bucket,
        |         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |         t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] AS gram
        |  FROM d, UNNEST(range(1, greatest(len(t) - 6, 1))) u(i)),
        |train AS (SELECT DISTINCT gram FROM grams WHERE bucket < 80)
        |SELECT g.doc_id, count(*) AS n_shared_8grams
        |FROM grams g JOIN train tr ON tr.gram = g.gram
        |WHERE g.bucket >= 90
        |GROUP BY 1""".stripMargin)),

    QuerySpec("d10_dedup_incremental", dedupIncremental, Some(docCtes +
      sigCtes +
      """, mx AS (SELECT max(doc_id) * 9 AS c9 FROM documents),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS new_doc, b.doc_id AS other_doc
        |  FROM sig a, sig b, mx
        |  WHERE a.doc_id * 10 > mx.c9
        |    AND a.doc_id <> b.doc_id
        |    AND (b.doc_id * 10 <= mx.c9 OR a.doc_id < b.doc_id)
        |    AND ((a.m0 = b.m0 AND a.m1 = b.m1 AND a.m2 = b.m2 AND a.m3 = b.m3) OR
        |         (a.m4 = b.m4 AND a.m5 = b.m5 AND a.m6 = b.m6 AND a.m7 = b.m7) OR
        |         (a.m8 = b.m8 AND a.m9 = b.m9 AND a.m10 = b.m10 AND a.m11 = b.m11) OR
        |         (a.m12 = b.m12 AND a.m13 = b.m13 AND a.m14 = b.m14 AND a.m15 = b.m15))),
        |common AS (
        |  SELECT c.new_doc, c.other_doc, count(*) AS c
        |  FROM cand c
        |  JOIN sh a ON a.doc_id = c.new_doc
        |  JOIN sh b ON b.doc_id = c.other_doc AND b.shingle = a.shingle
        |  GROUP BY 1, 2)
        |SELECT c.new_doc, c.other_doc,
        |       (COALESCE(cm.c, 0) * 1000000) // (x.n_sh + y.n_sh - COALESCE(cm.c, 0)) AS jaccard_ppm
        |FROM cand c
        |LEFT JOIN common cm ON cm.new_doc = c.new_doc AND cm.other_doc = c.other_doc
        |JOIN shc x ON x.doc_id = c.new_doc
        |JOIN shc y ON y.doc_id = c.other_doc""".stripMargin)),

    QuerySpec("d11_substring_dupes", substringDupes, Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, array_to_string(t[i:i+29], ' ') AS gram
        |  FROM t, UNNEST(range(1, greatest(len(t) - 28, 1))) u(i))
        |SELECT ('0x' || substr(md5(gram), 1, 8))::BIGINT AS gram_hash,
        |       count(DISTINCT doc_id) AS n_docs,
        |       min(doc_id) AS first_doc,
        |       max(doc_id) AS last_doc
        |FROM g
        |GROUP BY 1
        |HAVING count(DISTINCT doc_id) >= 2""".stripMargin)),

    QuerySpec("t15_shard_assign", shardAssign, Some(
      """WITH d AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_tokens,
        |         row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
        |  FROM d)
        |SELECT CAST((rn - 1) % 8 AS BIGINT) AS shard_id,
        |       count(*) AS n_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |FROM r GROUP BY 1""".stripMargin)),

    QuerySpec("t14_repetition_quality", repetitionQuality, Some(
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS g
        |       FROM toks, UNNEST(range(1, len(t))) u(i)),
        |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |  count(*) AS n_distinct_bigrams,
        |  CAST(((SUM(c) - count(*)) * 1000000) // SUM(c) AS BIGINT) AS dup_bigram_ppm,
        |  CAST((MAX(c) * 1000000) // SUM(c) AS BIGINT) AS top_bigram_ppm,
        |  CASE WHEN ((SUM(c) - count(*)) * 1000000) // SUM(c) < 200000
        |        AND (MAX(c) * 1000000) // SUM(c) < 100000
        |       THEN 1 ELSE 0 END AS repetition_ok
        |FROM bgc GROUP BY 1""".stripMargin)),

    QuerySpec("s14_kmeans_refine", kmeansRefine, Some(embCtes + ", " + centsCte +
      """a0 AS (
        |  SELECT a.vec_id, b.vec_id AS cent_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM ev a JOIN ev b ON b.i = a.i JOIN cents c ON c.vec_id = b.vec_id
        |  GROUP BY 1, 2),
        |s0 AS (
        |  SELECT d.vec_id, d.cent_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM a0 d
        |  JOIN sq x ON x.vec_id = d.vec_id
        |  JOIN sq y ON y.vec_id = d.cent_id),
        |asg1 AS (
        |  SELECT vec_id, cent_id AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |                ORDER BY cos_ppm DESC, cent_id ASC) AS rn
        |    FROM s0) t WHERE rn = 1),
        |c1 AS (
        |  SELECT g.cell, e.i, CAST(SUM(e.v) AS BIGINT) AS csum
        |  FROM asg1 g JOIN ev e ON e.vec_id = g.vec_id
        |  GROUP BY 1, 2),
        |c1s AS (
        |  SELECT cell, CAST(SUM(csum * csum) AS BIGINT) AS sc
        |  FROM c1 GROUP BY 1 HAVING SUM(csum * csum) > 0),
        |a1 AS (
        |  SELECT e.vec_id, c.cell, CAST(SUM(e.v * c.csum) AS BIGINT) AS dot
        |  FROM ev e JOIN c1 c ON c.i = e.i
        |  JOIN c1s s ON s.cell = c.cell
        |  GROUP BY 1, 2),
        |s1 AS (
        |  SELECT d.vec_id, d.cell,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(s.sc)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM a1 d
        |  JOIN sq x ON x.vec_id = d.vec_id
        |  JOIN c1s s ON s.cell = d.cell),
        |asg2 AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |                ORDER BY cos_ppm DESC, cell ASC) AS rn
        |    FROM s1) t WHERE rn = 1)
        |SELECT g.cell AS cent_id, CAST(e.i AS INTEGER) AS i,
        |       CAST(SUM(e.v) AS BIGINT) AS csum, count(*) AS n_members
        |FROM asg2 g
        |JOIN ev e ON e.vec_id = g.vec_id
        |GROUP BY 1, 2""".stripMargin)),

    QuerySpec("s15_ann_ivf_sq8", annIvfSq8, Some(ivfSq8Oracle)),

    // s17 = s15 served off the stored index: one oracle text, two
    // engine paths — the s07/s08 sharing pattern. The DuckDB twin
    // cannot tell recompute from storage; AnnIndexSpec pins the two
    // Spark paths row-identical, PlanSpec pins s17's pruned-read shape.
    QuerySpec("s17_ann_ivf_sq8_indexed", annIvfSq8Indexed,
      Some(ivfSq8Oracle)),


    QuerySpec("s16_hybrid_rrf", hybridRrf, Some(embCtes +
      """, vdots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM ev a JOIN ev b ON b.i = a.i
        |   AND a.vec_id < 10 AND b.vec_id <> a.vec_id
        |  GROUP BY 1, 2),
        |vrank AS (
        |  SELECT query_id, neighbor_id, rank_v FROM (
        |    SELECT d.query_id, d.neighbor_id,
        |           row_number() OVER (PARTITION BY d.query_id ORDER BY
        |             CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) DESC,
        |             d.neighbor_id) AS rank_v
        |    FROM vdots d
        |    JOIN sq x ON x.vec_id = d.query_id
        |    JOIN sq y ON y.vec_id = d.neighbor_id) t
        |  WHERE rank_v <= 20),
        |tf AS (
        |  SELECT doc_id, t[i] AS tok, count(*) AS tf
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) x,
        |       UNNEST(range(1, len(t) + 1)) u(i)
        |  GROUP BY 1, 2),
        |dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |nn AS (SELECT count(*) AS n_docs FROM documents),
        |lex AS (
        |  SELECT q.doc_id AS query_id, d.doc_id AS neighbor_id,
        |         CAST(SUM(d.tf * ((nn.n_docs * 1000000) // dfx.df)) AS BIGINT) AS lex_score
        |  FROM tf q
        |  JOIN tf d ON d.tok = q.tok AND d.doc_id <> q.doc_id
        |  JOIN dfx ON dfx.tok = q.tok
        |  CROSS JOIN nn
        |  WHERE q.doc_id < 10
        |  GROUP BY 1, 2),
        |lrank AS (
        |  SELECT query_id, neighbor_id, rank_l FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id
        |             ORDER BY lex_score DESC, neighbor_id) AS rank_l
        |    FROM lex) t
        |  WHERE rank_l <= 20),
        |fused AS (
        |  SELECT COALESCE(v.query_id, l.query_id) AS query_id,
        |         COALESCE(v.neighbor_id, l.neighbor_id) AS neighbor_id,
        |         COALESCE(1000000 // (60 + v.rank_v), 0) +
        |         COALESCE(1000000 // (60 + l.rank_l), 0) AS rrf_ppm
        |  FROM vrank v
        |  FULL JOIN lrank l
        |    ON l.query_id = v.query_id AND l.neighbor_id = v.neighbor_id)
        |SELECT query_id, neighbor_id, CAST(rrf_ppm AS BIGINT) AS rrf_ppm, rank
        |FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY rrf_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM fused) t
        |WHERE rank <= 10""".stripMargin)),

    QuerySpec("t24_cluster_sample", clusterSample, Some(embCtes + ", " +
      imiCtes + imiCellsCte("acells", 1) +
      """asg1 AS (SELECT vec_id, cell FROM acells WHERE rn = 1)
        |SELECT cell, vec_id, smp_rank FROM (
        |  SELECT cell, vec_id,
        |         CAST(row_number() OVER (PARTITION BY cell
        |              ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
        |                       vec_id) AS INTEGER) AS smp_rank
        |  FROM asg1) t
        |WHERE smp_rank <= 8""".stripMargin)),

    QuerySpec("t25_chunk_docs", chunkDocs, Some(
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |SELECT doc_id, CAST(k AS INTEGER) AS chunk_id,
        |       CAST(LEAST(64, len(t) - k * 48) AS BIGINT) AS n_tokens,
        |       md5(array_to_string(t[k * 48 + 1:k * 48 + 64], ' ')) AS chunk_hash
        |FROM toks, UNNEST(range(0, GREATEST((len(t) - 17) // 48, 0) + 1)) u(k)""".stripMargin)),

    // s22's oracle: the exact top-20 pool + its internal similarity
    // frame, then the 5 greedy MMR rounds unrolled (mmrRoundSql — the
    // d13 pattern), everything MATERIALIZED.
    QuerySpec("s22_mmr_diversified", mmrDiversified, Some(
      Seq("ev", "sq").foldLeft(embCtes)((acc, c) =>
        acc.replace(c + " AS (", c + " AS MATERIALIZED (")) + ", " +
      """vdots AS MATERIALIZED (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM ev a JOIN ev b ON b.i = a.i
        |   AND a.vec_id < 10 AND b.vec_id <> a.vec_id
        |  GROUP BY 1, 2),
        |pool AS MATERIALIZED (
        |  SELECT query_id, neighbor_id AS cand, cos_ppm AS rel FROM (
        |    SELECT d.query_id, d.neighbor_id,
        |           CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm,
        |           row_number() OVER (PARTITION BY d.query_id ORDER BY
        |             CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) DESC,
        |             d.neighbor_id) AS rnk
        |    FROM vdots d
        |    JOIN sq x ON x.vec_id = d.query_id
        |    JOIN sq y ON y.vec_id = d.neighbor_id) t
        |  WHERE rnk <= 20),
        |pdots AS MATERIALIZED (
        |  SELECT pa.query_id, pa.cand AS a, pb.cand AS b,
        |         CAST(SUM(ea.v * eb.v) AS BIGINT) AS dot
        |  FROM pool pa
        |  JOIN pool pb ON pb.query_id = pa.query_id AND pb.cand <> pa.cand
        |  JOIN ev ea ON ea.vec_id = pa.cand
        |  JOIN ev eb ON eb.vec_id = pb.cand AND eb.i = ea.i
        |  GROUP BY 1, 2, 3),
        |ps AS MATERIALIZED (
        |  SELECT d.query_id, d.a, d.b,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS sim
        |  FROM pdots d
        |  JOIN sq x ON x.vec_id = d.a
        |  JOIN sq y ON y.vec_id = d.b),
        |sel1 AS MATERIALIZED (
        |  SELECT query_id, cand, rel, 1 AS mmr_rank FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |                ORDER BY rel DESC, cand) AS rn
        |    FROM pool) t WHERE rn = 1),
        |selall1 AS MATERIALIZED (SELECT * FROM sel1),
        |""".stripMargin + (2 to 5).map(mmrRoundSql).mkString +
      """final_sel AS (SELECT * FROM selall5)
        |SELECT query_id, cand AS neighbor_id, rel AS cos_ppm,
        |       CAST(mmr_rank AS INTEGER) AS mmr_rank
        |FROM final_sel""".stripMargin)),

    QuerySpec("t26_hard_negatives", hardNegatives,
      Some(hardNegativesOracleSql)),

    // t27 is t26 with the assignment READ from the stored index instead
    // of recomputed — semantically identical by contract, so it is
    // checked against the IDENTICAL oracle SQL (and QueriesSpec pins
    // the two Spark plans row-for-row equal), the s05/s09 pattern.
    QuerySpec("t27_hard_negatives_indexed", hardNegativesIndexed,
      Some(hardNegativesOracleSql)),

    QuerySpec("d15_chunk_dupes", chunkDupes, Some(
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |ch AS (
        |  SELECT doc_id,
        |         md5(array_to_string(t[k * 48 + 1:k * 48 + 64], ' ')) AS chunk_hash
        |  FROM toks, UNNEST(range(0, GREATEST((len(t) - 17) // 48, 0) + 1)) u(k))
        |SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs,
        |       count(*) AS n_chunks, min(doc_id) AS first_doc
        |FROM ch GROUP BY 1
        |HAVING count(DISTINCT doc_id) >= 2""".stripMargin)),

    // d16 = d03's exact chain over the synthesized book-bearing fixture
    // corpus — the standing coverage row for the long-doc frame route
    // (census non-empty by construction; see longdocFixtureCorpus).
    // Oracle: regenerate the corpus in SQL, then the d03 tail verbatim.
    QuerySpec("d16_longdoc_routed", dedupLongdocRouted, Some(
      bookCorpusCtes + docCtesOver("corpus") + minhashCtes +
      """SELECT c.doc_a, c.doc_b,
        |       (COALESCE(cm.c, 0) * 1000000) // (x.n_sh + y.n_sh - COALESCE(cm.c, 0)) AS jaccard_ppm
        |FROM cand c
        |LEFT JOIN common cm ON cm.doc_a = c.doc_a AND cm.doc_b = c.doc_b
        |JOIN shc x ON x.doc_id = c.doc_a
        |JOIN shc y ON y.doc_id = c.doc_b""".stripMargin)),

    // s20's oracle recomputes the full PQ chain in SQL: hash-sampled
    // codebooks, exact-L2 assignment per (vector, subspace), ADC dots
    // of the raw query against reconstructions, exact rerank. Every
    // multi-referenced CTE MATERIALIZED (the d13 inlining lesson).
    QuerySpec("s20_ann_pq", annPq, Some(
      Seq("ev", "sq").foldLeft(embCtes)((acc, c) =>
        acc.replace(c + " AS (", c + " AS MATERIALIZED (")) + ", " +
      """strideq AS MATERIALIZED (
        |  SELECT GREATEST(1, count(*) // 256) AS st FROM embeddings),
        |csel AS MATERIALIZED (
        |  SELECT vec_id AS cent_id FROM embeddings
        |  WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
        |        % (SELECT st FROM strideq) = 0),
        |cev AS MATERIALIZED (
        |  SELECT c.cent_id, (e.i - 1) // 16 AS sub, e.i, e.v
        |  FROM ev e JOIN csel c ON c.cent_id = e.vec_id),
        |vs AS MATERIALIZED (
        |  SELECT vec_id, (i - 1) // 16 AS sub, CAST(SUM(v * v) AS BIGINT) AS ss
        |  FROM ev GROUP BY 1, 2),
        |cs AS MATERIALIZED (
        |  SELECT cent_id, sub, CAST(SUM(v * v) AS BIGINT) AS scs
        |  FROM cev GROUP BY 1, 2),
        |ad AS MATERIALIZED (
        |  SELECT e.vec_id, c.sub, c.cent_id, CAST(SUM(e.v * c.v) AS BIGINT) AS dot
        |  FROM ev e JOIN cev c ON c.i = e.i
        |  GROUP BY 1, 2, 3),
        |code AS MATERIALIZED (
        |  SELECT vec_id, sub, cent_id FROM (
        |    SELECT a.vec_id, a.sub, a.cent_id,
        |           row_number() OVER (PARTITION BY a.vec_id, a.sub
        |             ORDER BY vs.ss + cs.scs - 2 * a.dot ASC, a.cent_id ASC) AS rn
        |    FROM ad a
        |    JOIN vs ON vs.vec_id = a.vec_id AND vs.sub = a.sub
        |    JOIN cs ON cs.cent_id = a.cent_id AND cs.sub = a.sub) t
        |  WHERE rn = 1),
        |rnorm AS MATERIALIZED (
        |  SELECT k.vec_id, CAST(SUM(cs.scs) AS BIGINT) AS ssr
        |  FROM code k JOIN cs ON cs.cent_id = k.cent_id AND cs.sub = k.sub
        |  GROUP BY 1),
        |adc AS MATERIALIZED (
        |  SELECT q.vec_id AS query_id, k.vec_id AS neighbor_id,
        |         CAST(SUM(q.v * c.v) AS BIGINT) AS adot
        |  FROM code k
        |  JOIN cev c ON c.cent_id = k.cent_id AND c.sub = k.sub
        |  JOIN ev q ON q.i = c.i AND q.vec_id < 10 AND q.vec_id <> k.vec_id
        |  GROUP BY 1, 2),
        |qsc AS (
        |  SELECT a.query_id, a.neighbor_id,
        |         CAST(floor(a.adot / (sqrt(sq.s2) * sqrt(r.ssr)) * 1000000 + 0.5) AS BIGINT) AS acos
        |  FROM adc a
        |  JOIN sq ON sq.vec_id = a.query_id
        |  JOIN rnorm r ON r.vec_id = a.neighbor_id),
        |cand AS MATERIALIZED (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |                ORDER BY acos DESC, neighbor_id) AS arn
        |    FROM qsc) t WHERE arn <= 100),
        |cdots AS (
        |  SELECT c.query_id, c.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN ev a ON a.vec_id = c.query_id
        |  JOIN ev b ON b.vec_id = c.neighbor_id AND b.i = a.i
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM cdots d
        |  JOIN sq x ON x.vec_id = d.query_id
        |  JOIN sq y ON y.vec_id = d.neighbor_id)
        |SELECT query_id, neighbor_id, cos_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 5""".stripMargin)),

    // s21's oracle = s15's IVF skeleton (probes → cell candidates) ∘
    // s20's PQ chain (codebooks → exact-L2 codes → ADC) restricted to
    // those candidates, with the family's exact-rerank tail. Fully
    // MATERIALIZED (the d13 lesson).
    QuerySpec("s21_ann_ivf_pq_indexed", annIvfPqIndexed, Some(
      Seq("ev", "sq").foldLeft(embCtes)((acc, c) =>
        acc.replace(c + " AS (", c + " AS MATERIALIZED (")) + ", " + imiAssignProbeCtes(12) +
      """ccand AS MATERIALIZED (
        |  SELECT DISTINCT p.query_id, a.neighbor_id
        |  FROM probes p JOIN assigned a ON a.cell = p.cell
        |  WHERE a.neighbor_id <> p.query_id),
        |strideq AS MATERIALIZED (
        |  SELECT GREATEST(1, count(*) // 256) AS st FROM embeddings),
        |csel AS MATERIALIZED (
        |  SELECT vec_id AS cent_id FROM embeddings
        |  WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
        |        % (SELECT st FROM strideq) = 0),
        |cev AS MATERIALIZED (
        |  SELECT c.cent_id, (e.i - 1) // 16 AS sub, e.i, e.v
        |  FROM ev e JOIN csel c ON c.cent_id = e.vec_id),
        |vs AS MATERIALIZED (
        |  SELECT vec_id, (i - 1) // 16 AS sub, CAST(SUM(v * v) AS BIGINT) AS ss
        |  FROM ev GROUP BY 1, 2),
        |cs AS MATERIALIZED (
        |  SELECT cent_id, sub, CAST(SUM(v * v) AS BIGINT) AS scs
        |  FROM cev GROUP BY 1, 2),
        |ad AS MATERIALIZED (
        |  SELECT e.vec_id, c.sub, c.cent_id, CAST(SUM(e.v * c.v) AS BIGINT) AS dot
        |  FROM ev e JOIN cev c ON c.i = e.i
        |  GROUP BY 1, 2, 3),
        |code AS MATERIALIZED (
        |  SELECT vec_id, sub, cent_id FROM (
        |    SELECT a.vec_id, a.sub, a.cent_id,
        |           row_number() OVER (PARTITION BY a.vec_id, a.sub
        |             ORDER BY vs.ss + cs.scs - 2 * a.dot ASC, a.cent_id ASC) AS rn
        |    FROM ad a
        |    JOIN vs ON vs.vec_id = a.vec_id AND vs.sub = a.sub
        |    JOIN cs ON cs.cent_id = a.cent_id AND cs.sub = a.sub) t
        |  WHERE rn = 1),
        |rnorm AS MATERIALIZED (
        |  SELECT k.vec_id, CAST(SUM(cs.scs) AS BIGINT) AS ssr
        |  FROM code k JOIN cs ON cs.cent_id = k.cent_id AND cs.sub = k.sub
        |  GROUP BY 1),
        |adc AS MATERIALIZED (
        |  SELECT cc.query_id, cc.neighbor_id,
        |         CAST(SUM(q.v * cb.v) AS BIGINT) AS adot
        |  FROM ccand cc
        |  JOIN code k ON k.vec_id = cc.neighbor_id
        |  JOIN cev cb ON cb.cent_id = k.cent_id AND cb.sub = k.sub
        |  JOIN ev q ON q.i = cb.i AND q.vec_id = cc.query_id
        |  GROUP BY 1, 2),
        |qsc AS (
        |  SELECT a.query_id, a.neighbor_id,
        |         CAST(floor(a.adot / (sqrt(sq.s2) * sqrt(r.ssr)) * 1000000 + 0.5) AS BIGINT) AS acos
        |  FROM adc a
        |  JOIN sq ON sq.vec_id = a.query_id
        |  JOIN rnorm r ON r.vec_id = a.neighbor_id),
        |cand AS MATERIALIZED (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |                ORDER BY acos DESC, neighbor_id) AS arn
        |    FROM qsc) t WHERE arn <= 100),
        |cdots AS (
        |  SELECT c.query_id, c.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN ev a ON a.vec_id = c.query_id
        |  JOIN ev b ON b.vec_id = c.neighbor_id AND b.i = a.i
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM cdots d
        |  JOIN sq x ON x.vec_id = d.query_id
        |  JOIN sq y ON y.vec_id = d.neighbor_id)
        |SELECT query_id, neighbor_id, cos_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 5""".stripMargin)),

    QuerySpec("s19_bm25_topk", bm25TopK, Some(
      """WITH tf AS MATERIALIZED (
        |  SELECT doc_id, t[i] AS tok, count(*) AS tf
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) x,
        |       UNNEST(range(1, len(t) + 1)) u(i)
        |  GROUP BY 1, 2),
        |dlen AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dlen
        |         FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(SUM(dlen) AS BIGINT) AS total_toks,
        |               count(*) AS n_docs FROM dlen),
        |dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |terms AS (
        |  SELECT q.doc_id AS query_id, d.doc_id AS neighbor_id,
        |         (tot.n_docs * 1000000) // dfx.df AS idf_ppm,
        |         (d.tf * 2200000 * 1000000) //
        |           (d.tf * 1000000 +
        |            (1200000 * (250000 +
        |              (750000 * ((dl.dlen * tot.n_docs * 1000000)
        |                         // tot.total_toks)) // 1000000))
        |             // 1000000) AS sat_ppm
        |  FROM tf q
        |  JOIN tf d ON d.tok = q.tok AND d.doc_id <> q.doc_id
        |  JOIN dfx ON dfx.tok = q.tok
        |  JOIN dlen dl ON dl.doc_id = d.doc_id
        |  CROSS JOIN tot
        |  WHERE q.doc_id < 10),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         CAST(SUM(((idf_ppm // 1000) * sat_ppm) // 1000) AS BIGINT)
        |           AS bm25_ppm
        |  FROM terms GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, bm25_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY bm25_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 10""".stripMargin)),

    // s18's oracle recomputes the whole chunk→vector→MaxSim chain in
    // SQL: t25's tiling, the h32-derived chunk dims, integer chunk
    // dots, and the max-chunk doc rollup. MATERIALIZED on the per-dim
    // frame — it feeds both the norm agg and both sides of the pair
    // join (the d13 inlining lesson).
    QuerySpec("s18_chunk_ann", chunkAnn, Some(
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |cht AS (
        |  SELECT doc_id, CAST(k AS INTEGER) AS chunk_id,
        |         md5(array_to_string(t[k * 48 + 1:k * 48 + 64], ' ')) AS chunk_hash
        |  FROM toks, UNNEST(range(0, GREATEST((len(t) - 17) // 48, 0) + 1)) u(k)),
        |cev AS MATERIALIZED (
        |  SELECT doc_id, doc_id * 4096 + chunk_id AS vec_id, CAST(i AS INTEGER) AS i,
        |         (('0x' || substr(md5(chunk_hash || ':' || CAST(i AS VARCHAR)), 1, 8))::BIGINT
        |          % 2001) - 1000 AS v
        |  FROM cht, UNNEST(range(1, 65)) u(i)),
        |csq AS MATERIALIZED (
        |  SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS s2 FROM cev GROUP BY 1),
        |cdots AS (
        |  SELECT a.doc_id AS query_id, b.doc_id AS neighbor_id,
        |         a.vec_id AS va, b.vec_id AS vb,
        |         CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM cev a JOIN cev b ON b.i = a.i
        |   AND a.doc_id < 10 AND b.doc_id <> a.doc_id
        |  GROUP BY 1, 2, 3, 4),
        |scored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM cdots d
        |  JOIN csq x ON x.vec_id = d.va
        |  JOIN csq y ON y.vec_id = d.vb),
        |rolled AS (
        |  SELECT query_id, neighbor_id, MAX(cos_ppm) AS max_cos_ppm
        |  FROM scored GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, max_cos_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY max_cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM rolled) t
        |WHERE rank <= 5""".stripMargin)),

    // s23's oracle: the full chunk-grain hybrid in SQL — t25's tiling
    // feeding BOTH rankers (the hash-derived chunk vectors for the
    // MaxSim side, the overlapping-window token rows for the BM25
    // side), s19's exact integer BM25 chain at chunk grain, s16's RRF
    // fusion. MATERIALIZED on every frame referenced twice.
    QuerySpec("s23_chunk_hybrid", chunkHybrid, Some(
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |cht AS (
        |  SELECT doc_id, CAST(k AS INTEGER) AS chunk_id,
        |         md5(array_to_string(t[k * 48 + 1:k * 48 + 64], ' ')) AS chunk_hash
        |  FROM toks, UNNEST(range(0, GREATEST((len(t) - 17) // 48, 0) + 1)) u(k)),
        |cev AS MATERIALIZED (
        |  SELECT doc_id, doc_id * 4096 + chunk_id AS vec_id, CAST(i AS INTEGER) AS i,
        |         (('0x' || substr(md5(chunk_hash || ':' || CAST(i AS VARCHAR)), 1, 8))::BIGINT
        |          % 2001) - 1000 AS v
        |  FROM cht, UNNEST(range(1, 65)) u(i)),
        |csq AS MATERIALIZED (
        |  SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS s2 FROM cev GROUP BY 1),
        |cdots AS (
        |  SELECT a.doc_id AS query_id, b.vec_id AS neighbor_id,
        |         a.vec_id AS va, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM cev a JOIN cev b ON b.i = a.i
        |   AND a.doc_id < 10 AND b.doc_id <> a.doc_id
        |  GROUP BY 1, 2, 3),
        |chunkbest AS (
        |  SELECT query_id, neighbor_id, MAX(cos_ppm) AS best_cos_ppm FROM (
        |    SELECT d.query_id, d.neighbor_id,
        |           CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |    FROM cdots d
        |    JOIN csq x ON x.vec_id = d.va
        |    JOIN csq y ON y.vec_id = d.neighbor_id) s
        |  GROUP BY 1, 2),
        |vrank AS (
        |  SELECT query_id, neighbor_id, rank_v FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id
        |             ORDER BY best_cos_ppm DESC, neighbor_id) AS rank_v
        |    FROM chunkbest) t
        |  WHERE rank_v <= 20),
        |ctf AS MATERIALIZED (
        |  SELECT doc_id * 4096 + k AS cid, t[k * 48 + j] AS tok, count(*) AS tf
        |  FROM toks,
        |       UNNEST(range(0, GREATEST((len(t) - 17) // 48, 0) + 1)) u(k),
        |       UNNEST(range(1, LEAST(64, len(t) - k * 48) + 1)) w(j)
        |  GROUP BY 1, 2),
        |dlen AS MATERIALIZED (
        |  SELECT cid, CAST(SUM(tf) AS BIGINT) AS dlen FROM ctf GROUP BY 1),
        |tot AS (SELECT CAST(SUM(dlen) AS BIGINT) AS total_toks,
        |               count(*) AS n_docs FROM dlen),
        |dfx AS (SELECT tok, count(*) AS df FROM ctf GROUP BY 1),
        |qt AS (SELECT DISTINCT doc_id AS query_id, t[i] AS tok
        |       FROM toks, UNNEST(range(1, len(t) + 1)) u(i)
        |       WHERE doc_id < 10),
        |terms AS (
        |  SELECT q.query_id, d.cid AS neighbor_id,
        |         (tot.n_docs * 1000000) // dfx.df AS idf_ppm,
        |         (d.tf * 2200000 * 1000000) //
        |           (d.tf * 1000000 +
        |            (1200000 * (250000 +
        |              (750000 * ((dl.dlen * tot.n_docs * 1000000)
        |                         // tot.total_toks)) // 1000000))
        |             // 1000000) AS sat_ppm
        |  FROM qt q
        |  JOIN ctf d ON d.tok = q.tok AND d.cid // 4096 <> q.query_id
        |  JOIN dfx ON dfx.tok = q.tok
        |  JOIN dlen dl ON dl.cid = d.cid
        |  CROSS JOIN tot),
        |lrank AS (
        |  SELECT query_id, neighbor_id, rank_l FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id
        |             ORDER BY bm25_ppm DESC, neighbor_id) AS rank_l
        |    FROM (SELECT query_id, neighbor_id,
        |                 CAST(SUM(((idf_ppm // 1000) * sat_ppm) // 1000) AS BIGINT) AS bm25_ppm
        |          FROM terms GROUP BY 1, 2) s) t
        |  WHERE rank_l <= 20),
        |fused AS (
        |  SELECT COALESCE(v.query_id, l.query_id) AS query_id,
        |         COALESCE(v.neighbor_id, l.neighbor_id) AS neighbor_id,
        |         COALESCE(1000000 // (60 + v.rank_v), 0) +
        |         COALESCE(1000000 // (60 + l.rank_l), 0) AS rrf_ppm
        |  FROM vrank v
        |  FULL JOIN lrank l
        |    ON l.query_id = v.query_id AND l.neighbor_id = v.neighbor_id)
        |SELECT query_id, neighbor_id, CAST(rrf_ppm AS BIGINT) AS rrf_ppm, rank
        |FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY rrf_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM fused) t
        |WHERE rank <= 10""".stripMargin)),

    QuerySpec("s24_recall_audit", recallAudit, Some(recallAuditOracle)),

    QuerySpec("t28_pack_manifest", packManifest, Some(
      """WITH pd AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents),
        |""".stripMargin + packSqlTail)),

    // t29's oracle: the d06 label table (single reference — no
    // MATERIALIZED needed), split bucket hashed over the CANONICAL id.
    QuerySpec("t29_cluster_split", clusterSplit, Some(ccCtes +
      """SELECT d.doc_id,
        |  COALESCE(l.cluster_id, d.doc_id) AS canonical_id,
        |  CASE WHEN ('0x' || substr(md5(CAST(COALESCE(l.cluster_id, d.doc_id) AS VARCHAR)), 1, 8))::BIGINT % 100 < 80 THEN 'train'
        |       WHEN ('0x' || substr(md5(CAST(COALESCE(l.cluster_id, d.doc_id) AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id""".stripMargin)),

    // t30: all three gates folded into ONE labels reference (kept ⇒
    // canonical = doc_id, so the split hash reads the same coalesce),
    // then t28's packing tail over the gated frame.
    QuerySpec("t30_training_packs", trainingPacks, Some(ccCtes +
      """, quality AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, string_split(text, ' ') AS t FROM documents) q
        |  WHERE len(t) >= 20
        |    AND (len(list_filter(t, x -> x IN ('a', 'the'))) * 1000000) // len(t) < 300000),
        |pd AS (
        |  SELECT d.doc_id, CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents d
        |  LEFT JOIN labels l ON l.doc_id = d.doc_id
        |  JOIN quality q ON q.doc_id = d.doc_id
        |  WHERE COALESCE(l.cluster_id, d.doc_id) = d.doc_id
        |    AND ('0x' || substr(md5(CAST(COALESCE(l.cluster_id, d.doc_id) AS VARCHAR)), 1, 8))::BIGINT % 100 < 80),
        |""".stripMargin + packSqlTail)),

    // t31's oracle: pack ids are dense 0..ceil(T/cap)-1 by t28's
    // construction, so the oracle enumerates them from the token total
    // instead of re-running the packing CTE chain.
    QuerySpec("t31_pack_shards", packShards, Some(
      """WITH tot AS (
        |  SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS t
        |  FROM documents),
        |p AS (
        |  SELECT CAST(u.p AS BIGINT) AS pack_id
        |  FROM tot, UNNEST(range(0, (t + 127) // 128)) u(p)),
        |e AS (
        |  SELECT pack_id, CAST(u.e AS BIGINT) AS epoch
        |  FROM p, UNNEST(range(0, 2)) u(e))
        |SELECT pack_id, epoch,
        |       ('0x' || substr(md5(CAST(pack_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard,
        |       ('0x' || substr(md5('e' || epoch || ':' || pack_id), 1, 8))::BIGINT AS ord_key
        |FROM e""".stripMargin)),

    QuerySpec("t32_bpe_vocab", bpeVocab, Some(bpeVocabOracle)),
    QuerySpec("t33_bpe_tokens", bpeTokens, Some(bpeTokensOracle)),
    // t34 shares t33's oracle text — the s05/s09 pattern: one SQL truth,
    // two plans (retrain-per-call vs fold under the stored merge list).
    QuerySpec("t34_bpe_tokens_stored", bpeTokensStored, Some(bpeTokensOracle)),
    QuerySpec("t35_bpe_packs", bpePacks, Some(bpePacksOracle)),
    QuerySpec("t36_bpe_fertility", bpeFertility, Some(bpeFertilityOracle)),
    QuerySpec("t37_cms_heavy_hitters", cmsHeavyHitters, Some(cmsOracle)),

    QuerySpec("t38_dsir_select", dsirSelect, Some(
      """WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
        |tokrows AS (SELECT doc_id, pos, t[pos] AS tok
        |            FROM toks, UNNEST(range(1, len(t) + 1)) u(pos)),
        |big AS MATERIALIZED (
        |  SELECT a.doc_id,
        |         ('0x' || substr(md5(a.tok || ' ' || b.tok), 1, 8))::BIGINT % 1024 AS bkt
        |  FROM tokrows a JOIN tokrows b
        |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
        |q AS (SELECT doc_id FROM toks
        |      WHERE len(t) >= 20
        |        AND (len(list_filter(t, x -> x IN ('a', 'the'))) * 1000000) // len(t) < 300000),
        |raw AS MATERIALIZED (SELECT bkt, count(*) AS cr FROM big GROUP BY 1),
        |tgt AS MATERIALIZED (
        |  SELECT bkt, count(*) AS ct FROM big
        |  WHERE doc_id IN (SELECT doc_id FROM q) GROUP BY 1),
        |probs AS (
        |  SELECT r.bkt,
        |         (r.cr * 1000000) // (SELECT SUM(cr) FROM raw) AS pr,
        |         COALESCE((t.ct * 1000000) // (SELECT SUM(ct) FROM tgt), 0) AS pt
        |  FROM raw r LEFT JOIN tgt t ON t.bkt = r.bkt),
        |scored AS MATERIALIZED (
        |  SELECT g.doc_id, count(*) AS n_bigrams,
        |         CAST((SUM(p.pt - p.pr) + count(*) * 1000000) // count(*)
        |              - 1000000 AS BIGINT) AS dsir_score_ppm
        |  FROM big g JOIN probs p ON p.bkt = g.bkt GROUP BY 1),
        |hist AS MATERIALIZED (
        |  SELECT dsir_score_ppm AS sc, count(*) AS cnt FROM scored GROUP BY 1),
        |nk AS MATERIALIZED (SELECT CAST((SUM(cnt) * 25) // 100 AS BIGINT) AS n_keep FROM hist),
        |bo AS MATERIALIZED (
        |  SELECT sc AS s_star,
        |         (SELECT n_keep FROM nk) - (cum - cnt) AS take_at
        |  FROM (SELECT sc, cnt, SUM(cnt) OVER (ORDER BY sc DESC) AS cum FROM hist)
        |  WHERE cum >= (SELECT n_keep FROM nk)
        |  ORDER BY sc DESC LIMIT 1),
        |kb AS (
        |  SELECT doc_id FROM (
        |    SELECT s.doc_id, row_number() OVER (ORDER BY s.doc_id) AS rn
        |    FROM scored s JOIN bo ON s.dsir_score_ppm = bo.s_star)
        |  WHERE rn <= (SELECT take_at FROM bo))
        |SELECT s.doc_id, s.n_bigrams, s.dsir_score_ppm,
        |       CASE WHEN s.dsir_score_ppm > (SELECT s_star FROM bo)
        |              OR s.doc_id IN (SELECT doc_id FROM kb)
        |            THEN 1 ELSE 0 END AS keep
        |FROM scored s""".stripMargin)),

    // t40's oracle: the composed pipeline assembled from the pieces'
    // own oracle texts — ccCtes' labels (d07/t29's grain), t30's
    // quality gate, t16's contamination CTEs verbatim, t38's scoring
    // chain (docCtes already provides its toks/tokrows), one gated pd,
    // then t28's packing arithmetic with t31's shard deal on top.
    QuerySpec("t40_curation_manifest", curationManifest, Some(ccCtes +
      """, quality AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, string_split(text, ' ') AS t FROM documents) qq
        |  WHERE len(t) >= 20
        |    AND (len(list_filter(t, x -> x IN ('a', 'the'))) * 1000000) // len(t) < 300000),
        |gd AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS bucket,
        |         string_split(text, ' ') AS t
        |  FROM documents),
        |grams16 AS (
        |  SELECT DISTINCT doc_id, bucket,
        |         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |         t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] AS gram
        |  FROM gd, UNNEST(range(1, greatest(len(t) - 6, 1))) u(i)),
        |testg AS (SELECT DISTINCT gram FROM grams16 WHERE bucket >= 90),
        |badtrain AS (
        |  SELECT DISTINCT g.doc_id
        |  FROM grams16 g JOIN testg tg ON tg.gram = g.gram
        |  WHERE g.bucket < 80),
        |big AS MATERIALIZED (
        |  SELECT a.doc_id,
        |         ('0x' || substr(md5(a.tok || ' ' || b.tok), 1, 8))::BIGINT % 1024 AS bkt
        |  FROM tokrows a JOIN tokrows b
        |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
        |raw AS MATERIALIZED (SELECT bkt, count(*) AS cr FROM big GROUP BY 1),
        |tgt AS MATERIALIZED (
        |  SELECT bkt, count(*) AS ct FROM big
        |  WHERE doc_id IN (SELECT doc_id FROM quality) GROUP BY 1),
        |probs AS (
        |  SELECT r.bkt,
        |         (r.cr * 1000000) // (SELECT SUM(cr) FROM raw) AS pr,
        |         COALESCE((t.ct * 1000000) // (SELECT SUM(ct) FROM tgt), 0) AS pt
        |  FROM raw r LEFT JOIN tgt t ON t.bkt = r.bkt),
        |scored AS MATERIALIZED (
        |  SELECT g.doc_id, count(*) AS n_bigrams,
        |         CAST((SUM(p.pt - p.pr) + count(*) * 1000000) // count(*)
        |              - 1000000 AS BIGINT) AS dsir_score_ppm
        |  FROM big g JOIN probs p ON p.bkt = g.bkt GROUP BY 1),
        |shist AS MATERIALIZED (
        |  SELECT dsir_score_ppm AS sc, count(*) AS cnt FROM scored GROUP BY 1),
        |nk AS MATERIALIZED (SELECT CAST((SUM(cnt) * 25) // 100 AS BIGINT) AS n_keep FROM shist),
        |bo AS MATERIALIZED (
        |  SELECT sc AS s_star,
        |         (SELECT n_keep FROM nk) - (cum - cnt) AS take_at
        |  FROM (SELECT sc, cnt, SUM(cnt) OVER (ORDER BY sc DESC) AS cum FROM shist)
        |  WHERE cum >= (SELECT n_keep FROM nk)
        |  ORDER BY sc DESC LIMIT 1),
        |kb AS (
        |  SELECT doc_id FROM (
        |    SELECT s.doc_id, row_number() OVER (ORDER BY s.doc_id) AS rn
        |    FROM scored s JOIN bo ON s.dsir_score_ppm = bo.s_star)
        |  WHERE rn <= (SELECT take_at FROM bo)),
        |dsel AS MATERIALIZED (
        |  SELECT s.doc_id FROM scored s
        |  WHERE s.dsir_score_ppm > (SELECT s_star FROM bo)
        |     OR s.doc_id IN (SELECT doc_id FROM kb)),
        |pd AS (
        |  SELECT d.doc_id, CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents d
        |  LEFT JOIN labels l ON l.doc_id = d.doc_id
        |  JOIN quality q2 ON q2.doc_id = d.doc_id
        |  JOIN dsel ds ON ds.doc_id = d.doc_id
        |  LEFT JOIN badtrain b ON b.doc_id = d.doc_id
        |  WHERE b.doc_id IS NULL
        |    AND COALESCE(l.cluster_id, d.doc_id) = d.doc_id
        |    AND ('0x' || substr(md5(CAST(COALESCE(l.cluster_id, d.doc_id) AS VARCHAR)), 1, 8))::BIGINT % 100 < 80),
        |c AS (SELECT doc_id, n_toks,
        |        CAST(COALESCE(SUM(n_toks) OVER (ORDER BY doc_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS strt
        |      FROM pd WHERE n_toks > 0),
        |spans AS (
        |  SELECT doc_id, CAST(u.p AS BIGINT) AS pack_id,
        |         GREATEST(u.p * 128 - strt, 0) AS doc_start,
        |         GREATEST(strt - u.p * 128, 0) AS pack_start,
        |         LEAST((u.p + 1) * 128, strt + n_toks) - GREATEST(u.p * 128, strt) AS span_toks
        |  FROM c, UNNEST(range(strt // 128, (strt + n_toks - 1) // 128 + 1)) u(p))
        |SELECT doc_id, pack_id, doc_start, pack_start, span_toks,
        |       ('0x' || substr(md5(CAST(pack_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard
        |FROM spans""".stripMargin)),

    QuerySpec("t39_length_quantiles", lengthQuantiles, Some(
      """WITH d AS (
        |  SELECT lang,
        |         CASE WHEN nt < 8192 THEN nt // 16
        |              ELSE least(512 + (nt - 8192) // 2048, 1023) END AS bin
        |  FROM (SELECT lang, len(string_split(text, ' ')) AS nt
        |        FROM documents)),
        |hist AS MATERIALIZED (
        |  SELECT lang, bin, count(*) AS cnt FROM d GROUP BY 1, 2),
        |tot AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS nd FROM hist GROUP BY 1),
        |cum AS (
        |  SELECT lang, bin, cnt,
        |         SUM(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum
        |  FROM hist),
        |qs AS (
        |  SELECT c.lang, u.q, t.nd,
        |         (CASE WHEN c.bin < 512 THEN c.bin * 16
        |               ELSE 8192 + (c.bin - 512) * 2048 END)
        |         + ((((t.nd * u.q + 99) // 100) - (c.cum - c.cnt))
        |            * (CASE WHEN c.bin < 512 THEN 16 ELSE 2048 END))
        |           // c.cnt AS est
        |  FROM cum c JOIN tot t USING (lang), UNNEST([50, 90, 99]) u(q)
        |  WHERE c.cum - c.cnt < (t.nd * u.q + 99) // 100
        |    AND (t.nd * u.q + 99) // 100 <= c.cum)
        |SELECT lang, MAX(nd) AS n_docs,
        |       CAST(MAX(CASE WHEN q = 50 THEN est END) AS BIGINT) AS p50_est,
        |       CAST(MAX(CASE WHEN q = 90 THEN est END) AS BIGINT) AS p90_est,
        |       CAST(MAX(CASE WHEN q = 99 THEN est END) AS BIGINT) AS p99_est
        |FROM qs GROUP BY 1""".stripMargin))
  )
}
