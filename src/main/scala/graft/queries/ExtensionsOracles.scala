package graft.queries

import graft.Tables
import graft.functions.{DotI64, ImiCells, Portable}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared DuckDB-oracle CTE builders — the SQL twins' common text,
  * mirrored against the Spark-side assigners cell-for-cell.
  *
  * One mixin of [[Extensions]] (a pure file split of the original
  * single object — every member still resolves on Extensions.type via
  * the self-type; call sites and the query registry are unchanged). */
private[queries] trait ExtOracles { this: Extensions.type =>
  import Portable.{h32, idiv, ppm, P}

  // --------------------------------------------------------------- oracle SQL

  private[queries] val docCtes: String =
    """WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
      |tokrows AS (SELECT doc_id, lang, pos, t[pos] AS tok
      |            FROM toks, UNNEST(range(1, len(t) + 1)) u(pos)),
      |sh AS (SELECT DISTINCT doc_id, lang,
      |              t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      |       FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) u(i)),
      |shc AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      |shh AS (SELECT doc_id, lang, shingle,
      |               ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh)
      |""".stripMargin

  /** MinHash signature chain alone (mh → 16-col sig), shared with the
    * incremental variant (d10), whose candidate join differs. */
  private[queries] val sigCtes: String =
    """, mh AS (
      |  SELECT doc_id, j,
      |         min(((2 * j + 1) * h + 1000003 * j) % 2147483647) AS mh
      |  FROM shh, UNNEST(range(0, 16)) u(j) GROUP BY 1, 2),
      |sig AS (
      |  SELECT doc_id,
      |    max(CASE WHEN j = 0 THEN mh END) m0, max(CASE WHEN j = 1 THEN mh END) m1,
      |    max(CASE WHEN j = 2 THEN mh END) m2, max(CASE WHEN j = 3 THEN mh END) m3,
      |    max(CASE WHEN j = 4 THEN mh END) m4, max(CASE WHEN j = 5 THEN mh END) m5,
      |    max(CASE WHEN j = 6 THEN mh END) m6, max(CASE WHEN j = 7 THEN mh END) m7,
      |    max(CASE WHEN j = 8 THEN mh END) m8, max(CASE WHEN j = 9 THEN mh END) m9,
      |    max(CASE WHEN j = 10 THEN mh END) m10, max(CASE WHEN j = 11 THEN mh END) m11,
      |    max(CASE WHEN j = 12 THEN mh END) m12, max(CASE WHEN j = 13 THEN mh END) m13,
      |    max(CASE WHEN j = 14 THEN mh END) m14, max(CASE WHEN j = 15 THEN mh END) m15
      |  FROM mh GROUP BY 1)
      |""".stripMargin

  /** The full d03 chain (sig → banded cand → verified common-shingle
    * counts), shared by the d03 oracle and the terminal dedup oracles
    * (d06/d07/t13) so the LSH graph they cluster is textually identical
    * to the one d03 verifies. */
  private[queries] val minhashCtes: String = sigCtes +
    """, cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
      |    (a.m0 = b.m0 AND a.m1 = b.m1 AND a.m2 = b.m2 AND a.m3 = b.m3) OR
      |    (a.m4 = b.m4 AND a.m5 = b.m5 AND a.m6 = b.m6 AND a.m7 = b.m7) OR
      |    (a.m8 = b.m8 AND a.m9 = b.m9 AND a.m10 = b.m10 AND a.m11 = b.m11) OR
      |    (a.m12 = b.m12 AND a.m13 = b.m13 AND a.m14 = b.m14 AND a.m15 = b.m15))),
      |common AS (
      |  SELECT c.doc_a, c.doc_b, count(*) AS c
      |  FROM cand c
      |  JOIN sh a ON a.doc_id = c.doc_a
      |  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      |  GROUP BY 1, 2)
      |""".stripMargin

  /** d16's synthesized book corpus in SQL — regenerates
    * [[longdocFixtureCorpus]] byte-for-byte: md5-derived token streams
    * are the one primitive both engines hash identically (Spark
    * conv(hex,16,10) ↔ DuckDB ('0x'||…)::BIGINT, both unsigned 32-bit;
    * '-'-joined keys render the same because BIGINT→VARCHAR is
    * unpadded decimal in both). Ends with a `corpus(doc_id, lang,
    * text)` CTE; [[docCtesOver]] rebases the shingle chain onto it. */
  private[queries] val bookCorpusCtes: String =
    """WITH seeds AS (SELECT doc_id AS seed FROM documents
      |               WHERE doc_id % 97 = 0 AND doc_id < 1200),
      |booktoks AS (
      |  SELECT 10000000 + seed * 16 + v AS doc_id, i,
      |    CASE WHEN ('0x' || substr(md5(seed || '-' || i || '-' || v || '-m'), 1, 8))::BIGINT % 100 = 0
      |         THEN 'm' || (('0x' || substr(md5(seed || '-' || i || '-' || v || '-x'), 1, 8))::BIGINT % 100)
      |         ELSE (('0x' || substr(md5(seed || '-' || i || '-0-b'), 1, 8))::BIGINT % 1000000)::VARCHAR
      |    END AS tok
      |  FROM seeds, UNNEST(range(0, 16)) uv(v), UNNEST(range(1, 4201)) ui(i)),
      |books AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text
      |          FROM booktoks GROUP BY 1),
      |corpus AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 41 = 0
      |           UNION ALL SELECT doc_id, 'xx' AS lang, text FROM books)
      |""".stripMargin

  /** [[docCtes]] rebased onto a prior CTE instead of the raw documents
    * table (continuation form — the caller supplies the WITH). */
  private[queries] def docCtesOver(rel: String): String =
    docCtes.replaceFirst("WITH ", ", ").replace("FROM documents", s"FROM $rel")

  /** Oracle twin of `connectedComponents(lshPairs(...))`: LSH-verified
    * pairs → symmetric edges → recursive transitive closure →
    * component-min labels. */
  private[queries] val ccCtes: String =
    docCtes.replaceFirst("WITH ", "WITH RECURSIVE ") + minhashCtes +
    """, pairs AS (
      |  SELECT c.doc_a, c.doc_b
      |  FROM cand c
      |  LEFT JOIN common cm ON cm.doc_a = c.doc_a AND cm.doc_b = c.doc_b
      |  JOIN shc x ON x.doc_id = c.doc_a
      |  JOIN shc y ON y.doc_id = c.doc_b
      |  WHERE (COALESCE(cm.c, 0) * 1000000) // (x.n_sh + y.n_sh - COALESCE(cm.c, 0)) >= 800000),
      |e AS (SELECT doc_a, doc_b FROM pairs
      |      UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach(doc_id, lab) AS (
      |  SELECT doc_a, doc_a FROM e
      |  UNION
      |  SELECT e.doc_a, r.lab FROM e JOIN reach r ON r.doc_id = e.doc_b),
      |labels AS (SELECT doc_id, min(lab) AS cluster_id FROM reach GROUP BY 1)
      |""".stripMargin

  /** t28/t30's packing arithmetic in SQL, over a prior CTE `pd(doc_id,
    * n_toks)`: the oracle computes the running offset as ONE global
    * cumsum window — the associativity-equivalent of the Spark side's
    * block-hierarchical prefix sum (PackSpec pins the equivalence across
    * block sizes), exact because every value is BIGINT. */
  private[queries] val packSqlTail: String =
    """c AS (SELECT doc_id, n_toks,
      |        CAST(COALESCE(SUM(n_toks) OVER (ORDER BY doc_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS strt
      |      FROM pd WHERE n_toks > 0)
      |SELECT doc_id, CAST(u.p AS BIGINT) AS pack_id,
      |       GREATEST(u.p * 128 - strt, 0) AS doc_start,
      |       GREATEST(strt - u.p * 128, 0) AS pack_start,
      |       LEAST((u.p + 1) * 128, strt + n_toks) - GREATEST(u.p * 128, strt) AS span_toks
      |FROM c, UNNEST(range(strt // 128, (strt + n_toks - 1) // 128 + 1)) u(p)
      |""".stripMargin

  private[queries] val embCtes: String =
    """WITH qe AS (SELECT vec_id,
      |        list_transform(embedding,
      |          v -> CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS q
      |       FROM embeddings),
      |ev AS (SELECT vec_id, i, q[i] AS v FROM qe, UNNEST(range(1, len(q) + 1)) u(i)),
      |sq AS (SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS s2 FROM ev GROUP BY 1)
      |""".stripMargin

  /** The IVF ∘ prefix oracle, shared by s07 (assignment recomputed per
    * invocation) and s08 (assignment read from the materialized index):
    * the two strategies answer the same query and must agree
    * row-for-row, so one SQL text serves both. */
  /** The prefix-then-rerank IVF chain as a reusable CTE block (ends at
    * `scored` — the exact cosine over the ~100 rerank survivors);
    * ivfPrefixOracle adds the top-5 cut, s24's audit joins it against
    * the exact scan instead. */
  private[queries] val ivfChainCtes: String = embCtes + ", " + imiAssignProbeCtes(12) +
    """ccand AS (
      |  SELECT DISTINCT p.query_id, a.neighbor_id
      |  FROM probes p JOIN assigned a ON a.cell = p.cell
      |  WHERE a.neighbor_id <> p.query_id),
      |psq AS (
      |  SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS sp
      |  FROM ev WHERE i <= 32 GROUP BY 1),
      |pdots AS (
      |  SELECT c.query_id, c.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS pdot
      |  FROM ccand c
      |  JOIN ev a ON a.vec_id = c.query_id AND a.i <= 32
      |  JOIN ev b ON b.vec_id = c.neighbor_id AND b.i = a.i
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
      |""".stripMargin

  private[queries] val ivfPrefixOracle: String = ivfChainCtes +
    """SELECT query_id, neighbor_id, cos_ppm, rank FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
      |              ORDER BY cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
      |  FROM scored) t
      |WHERE rank <= 5""".stripMargin

  /** s24's oracle: the IVF chain's top-5 against the exact scan's
    * top-5, joined to per-query hit counts — recall in ppm with the
    * truncating-div idiom. */
  private[queries] val recallAuditOracle: String = ivfChainCtes.stripSuffix("\n") +
    """,
      |itop AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |                ORDER BY cos_ppm DESC, neighbor_id) AS rn
      |    FROM scored) t WHERE rn <= 5),
      |qdots AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |         CAST(SUM(a.v * b.v) AS BIGINT) AS dot
      |  FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id < 10 AND b.vec_id <> a.vec_id
      |  GROUP BY 1, 2),
      |escored AS (
      |  SELECT d.query_id, d.neighbor_id,
      |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
      |  FROM qdots d
      |  JOIN sq x ON x.vec_id = d.query_id
      |  JOIN sq y ON y.vec_id = d.neighbor_id),
      |etop AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |                ORDER BY cos_ppm DESC, neighbor_id) AS rn
      |    FROM escored) t WHERE rn <= 5),
      |hits AS (
      |  SELECT e.query_id, count(*) AS c
      |  FROM etop e JOIN itop i
      |    ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
      |  GROUP BY 1),
      |ek AS (SELECT query_id, count(*) AS k FROM etop GROUP BY 1)
      |SELECT ek.query_id, COALESCE(h.c, 0) AS n_hit, ek.k,
      |       (COALESCE(h.c, 0) * 1000000) // ek.k AS recall_ppm
      |FROM ek LEFT JOIN hits h ON h.query_id = ek.query_id""".stripMargin

  /** The filtered-IVF oracle, shared by s11 (assignment + label
    * joined per invocation) and s12 (both read from the stored
    * index): two strategies, one answer, one SQL text — the s07/s08
    * sharing pattern. */
  private[queries] val filteredIvfOracle: String = embCtes + ", " + imiAssignProbeCtes(20) +
      """cand AS (
        |  SELECT p.query_id, lq.label, a.neighbor_id
        |  FROM probes p JOIN assigned a ON a.cell = p.cell
        |  JOIN embeddings lq ON lq.vec_id = p.query_id
        |  JOIN embeddings ln ON ln.vec_id = a.neighbor_id
        |  WHERE a.neighbor_id <> p.query_id AND ln.label = lq.label),
        |cdots AS (
        |  SELECT c.query_id, c.label, c.neighbor_id,
        |         CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN ev a ON a.vec_id = c.query_id
        |  JOIN ev b ON b.vec_id = c.neighbor_id AND b.i = a.i
        |  GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT d.query_id, d.label, d.neighbor_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM cdots d
        |  JOIN sq x ON x.vec_id = d.query_id
        |  JOIN sq y ON y.vec_id = d.neighbor_id)
        |SELECT query_id, label, neighbor_id, cos_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 5""".stripMargin


  /** The cell-blocked semantic-dedup oracle, shared by s05 (assignment
    * recomputed per invocation) and s09 (assignment read from the
    * materialized index): the two strategies answer the same query and
    * must agree row-for-row, so one SQL text serves both — the same
    * contract the s07/s08 pair carries via ivfPrefixOracle. */
  /** The IVF∘SQ8 oracle text shared by s15 (recompute) and s17
    * (index-served) — the ivfPrefixOracle sharing pattern: DuckDB
    * cannot tell where the codes came from, only that the pruned,
    * code-scored, exactly-reranked top-5 is right. */
  private[queries] val ivfSq8Oracle: String = embCtes + ", " + imiAssignProbeCtes(12) +
      """ccand AS (
        |  SELECT DISTINCT p.query_id, a.neighbor_id
        |  FROM probes p JOIN assigned a ON a.cell = p.cell
        |  WHERE a.neighbor_id <> p.query_id),
        |dim AS (SELECT i, min(v) AS mn, max(v) - min(v) AS r
        |        FROM ev GROUP BY 1),
        |code AS (
        |  SELECT e.vec_id, e.i,
        |    CASE WHEN d.r = 0 THEN 255 * d.mn
        |         ELSE 255 * d.mn + (((e.v - d.mn) * 510 + d.r) // (2 * d.r)) * d.r
        |    END AS vh
        |  FROM ev e JOIN dim d ON d.i = e.i),
        |csq AS (SELECT vec_id, CAST(SUM(vh * vh) AS BIGINT) AS ss
        |        FROM code GROUP BY 1),
        |qdots AS (
        |  SELECT c.query_id, c.neighbor_id, CAST(SUM(a.vh * b.vh) AS BIGINT) AS adot
        |  FROM ccand c
        |  JOIN code a ON a.vec_id = c.query_id
        |  JOIN code b ON b.vec_id = c.neighbor_id AND b.i = a.i
        |  GROUP BY 1, 2),
        |qscored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.adot / (sqrt(x.ss) * sqrt(y.ss)) * 1000000 + 0.5) AS BIGINT) AS acos
        |  FROM qdots d
        |  JOIN csq x ON x.vec_id = d.query_id
        |  JOIN csq y ON y.vec_id = d.neighbor_id),
        |cand AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |                ORDER BY acos DESC, neighbor_id) AS arn
        |    FROM qscored) t WHERE arn <= 100),
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
        |WHERE rank <= 5""".stripMargin

  private[queries] val semdedupOracleSql: String = embCtes + ", " + imiAssign4Ctes +
    """cand AS (
      |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
      |  FROM assigned x
      |  JOIN assigned y ON y.cell = x.cell AND x.vec_id < y.vec_id),
      |pdots AS (
      |  SELECT c.vec_a, c.vec_b, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
      |  FROM cand c
      |  JOIN ev a ON a.vec_id = c.vec_a
      |  JOIN ev b ON b.vec_id = c.vec_b AND b.i = a.i
      |  GROUP BY 1, 2)
      |SELECT vec_a, vec_b, cos_ppm FROM (
      |  SELECT p.vec_a, p.vec_b,
      |         CAST(floor(p.dot / (sqrt(sx.s2) * sqrt(sy.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
      |  FROM pdots p
      |  JOIN sq sx ON sx.vec_id = p.vec_a
      |  JOIN sq sy ON sy.vec_id = p.vec_b) t
      |WHERE cos_ppm >= 350000""".stripMargin

  // t26's oracle = s05's cell-blocked scoring chain with the OPPOSITE
  // threshold filter (the hard-negative band sits below the near-dup
  // cut), symmetrized, top-3 per doc. MATERIALIZED where referenced
  // twice (assigned; the scored pair frame feeds both directions).
  // Shared verbatim by the indexed twin (the s05/s09 pattern): the two
  // Spark forms are semantically identical by contract, so they check
  // against identical SQL.
  private[queries] val hardNegativesOracleSql: String =
    Seq("ev", "sq").foldLeft(embCtes)((acc, c) =>
      acc.replace(c + " AS (", c + " AS MATERIALIZED (")) + ", " + imiAssign4Ctes +
    """cand AS MATERIALIZED (
      |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
      |  FROM assigned x
      |  JOIN assigned y ON y.cell = x.cell AND x.vec_id < y.vec_id),
      |pdots AS MATERIALIZED (
      |  SELECT c.vec_a, c.vec_b, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
      |  FROM cand c
      |  JOIN ev a ON a.vec_id = c.vec_a
      |  JOIN ev b ON b.vec_id = c.vec_b AND b.i = a.i
      |  GROUP BY 1, 2),
      |neg AS MATERIALIZED (
      |  SELECT vec_a, vec_b, cos_ppm FROM (
      |    SELECT p.vec_a, p.vec_b,
      |           CAST(floor(p.dot / (sqrt(sx.s2) * sqrt(sy.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
      |    FROM pdots p
      |    JOIN sq sx ON sx.vec_id = p.vec_a
      |    JOIN sq sy ON sy.vec_id = p.vec_b) t
      |  WHERE cos_ppm < 350000),
      |sym AS (
      |  SELECT vec_a AS doc_id, vec_b AS negative_id, cos_ppm FROM neg
      |  UNION ALL
      |  SELECT vec_b AS doc_id, vec_a AS negative_id, cos_ppm FROM neg)
      |SELECT doc_id, negative_id, cos_ppm, rank FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
      |              ORDER BY cos_ppm DESC, negative_id) AS INTEGER) AS rank
      |  FROM sym) t
      |WHERE rank <= 3""".stripMargin

  /** Unrolled DuckDB twin of bpeTrain: w0 is the word-frequency table
    * with char+`</w>` symbol sequences; each round k derives pair counts
    * (p_k), the deterministic argmax (b_k), and the merged word table
    * (w_k) via the SAME leftmost non-overlapping greedy fold —
    * list_reduce over single-element lists so the accumulator type
    * unifies. A string-replace formulation would diverge on runs ≥ 5 of
    * a self-pair (consecutive occurrences share their separator), which
    * is why both engines fold. Multi-referenced CTEs are MATERIALIZED
    * (each w_k feeds p_{k+1} and w_{k+1}; inlining re-runs the whole
    * chain multiplicatively — the d13 lesson). */
  private[queries] def bpeCtes(rounds: Int): String = {
    val w0 =
      """WITH w0 AS MATERIALIZED (
        |  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
        |         string_split(word, '') || ['</w>'] AS seq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE word <> '' GROUP BY word)""".stripMargin
    val roundCtes = (1 to rounds).map { k =>
      s"""p$k AS (
         |  SELECT z[1] AS l, z[2] AS r, CAST(sum(cnt) AS BIGINT) AS c
         |  FROM (SELECT cnt, unnest(list_zip(seq, seq[2:])) AS z FROM w${k - 1})
         |  WHERE z[2] IS NOT NULL GROUP BY 1, 2),
         |b$k AS MATERIALIZED (SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1),
         |w$k AS MATERIALIZED (
         |  SELECT word, cnt,
         |    CASE WHEN len(seq) < 2 THEN seq ELSE
         |      list_reduce(list_transform(seq, x -> [x]),
         |        (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b$k.l AND x[1] = b$k.r
         |                         THEN acc[1:len(acc)-1] || [b$k.l || b$k.r]
         |                         ELSE acc || x END) END AS seq
         |  FROM w${k - 1}, b$k)""".stripMargin
    }
    (w0 +: roundCtes).mkString(",\n")
  }

  private[queries] val bpeVocabOracle: String = {
    val unions = (1 to BpeRounds).map { k =>
      s"  SELECT CAST($k AS INTEGER) AS rank, l AS lhs, r AS rhs, l || r AS merged, c AS pair_count FROM b$k"
    }.mkString("\n  UNION ALL\n")
    bpeCtes(BpeRounds) +
      s"\nSELECT rank, lhs, rhs, merged, pair_count FROM (\n$unions) ORDER BY rank"
  }

  private[queries] val bpeTokensOracle: String =
    bpeCtes(BpeRounds) +
      s""",
         |docw AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         |SELECT d.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_ws_tokens,
         |  CAST(sum(len(ww.seq)) AS BIGINT) AS n_bpe_tokens,
         |  (CAST(sum(len(ww.seq)) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT) AS bpe_per_word_ppm
         |FROM docw d JOIN w$BpeRounds ww ON ww.word = d.word
         |WHERE d.word <> ''
         |GROUP BY d.doc_id""".stripMargin

  private[queries] val bpePacksOracle: String =
    bpeCtes(BpeRounds) +
      s""",
         |docw AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         |pd AS (
         |  SELECT d.doc_id, CAST(sum(len(ww.seq)) AS BIGINT) AS n_toks
         |  FROM docw d JOIN w$BpeRounds ww ON ww.word = d.word
         |  WHERE d.word <> '' GROUP BY d.doc_id),
         |""".stripMargin + packSqlTail

  private[queries] val bpeFertilityOracle: String =
    bpeCtes(BpeRounds) +
      s""",
         |docw AS (
         |  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
         |SELECT lang,
         |  CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(len(ww.seq)) AS BIGINT) AS n_subwords,
         |  (CAST(sum(len(ww.seq)) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT) AS fertility_ppm
         |FROM docw d JOIN w$BpeRounds ww ON ww.word = d.word
         |WHERE d.word <> ''
         |GROUP BY lang""".stripMargin

  private[queries] val cmsOracle: String =
    """WITH occ AS (
      |  SELECT tok FROM (SELECT unnest(string_split(text, ' ')) AS tok
      |                   FROM documents) WHERE tok <> ''),
      |rb AS (
      |  SELECT tok, j,
      |         ('0x' || substr(md5(j || ':' || tok), 1, 8))::BIGINT % 256 AS b
      |  FROM occ, UNNEST(range(0, 4)) u(j)),
      |sketch AS (SELECT j, b, CAST(count(*) AS BIGINT) AS c FROM rb GROUP BY 1, 2),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM occ),
      |cand AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_count
      |         FROM occ GROUP BY 1),
      |probes AS (
      |  SELECT tok, exact_count, j,
      |         ('0x' || substr(md5(j || ':' || tok), 1, 8))::BIGINT % 256 AS b
      |  FROM cand, UNNEST(range(0, 4)) u(j)),
      |est AS (
      |  SELECT p.tok, p.exact_count, min(s.c) AS est_count
      |  FROM probes p JOIN sketch s ON s.j = p.j AND s.b = p.b
      |  GROUP BY 1, 2)
      |SELECT tok, est_count, exact_count,
      |       est_count - exact_count AS overcount
      |FROM est, tot WHERE est_count >= t // 50""".stripMargin

}
