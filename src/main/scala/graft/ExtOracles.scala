package graft

import org.apache.spark.sql.functions._

import graft.ext.TextOps

/**
 * Oracle-side SQL for the extension surface: the DuckDB replay texts
 * (`oracleSqlBase`, loaded from `src/main/resources/oracles/` —
 * one reviewable `<query>.sql` file each) plus the parameterized SQL fragment
 * builders that assemble the iterative replays (BPE merge chains,
 * MinHash band CTEs, pointer-jumping rounds) the flat resource files
 * cannot express. Split from ExtQueries so the QUERY surface (what the
 * engine runs) and the ORACLE surface (how the driver checks it) read
 * independently; the five shared-bytes gates whose statement text IS
 * both query and oracle stay in ExtQueries and are referenced here.
 */
object ExtOracles {
  // SQL fragments shared by the oracles -------------------------------

  /**
   * The unrolled BPE training chain shared by the bpe_train and
   * bpe_vocab oracles: CTEs w0 (spaced word dict), then per round r —
   * p{r} adjacent-pair explode, b{r} argmax pair (count desc, pair
   * ascending binary — DuckDB and Spark both compare UTF-8 bytes), and
   * w{r} the 4-pass literal-replace merge application (Bpe.applyMerge
   * verbatim: " a b " → " ab ", re-scanned to fixpoint). Every
   * constant (word regex, length cap 32, pass count 4) mirrors
   * `Bpe`'s; the whole learning algorithm is replayed, so a drift in
   * ANY round's pair statistics or tie-break flips the hash.
   */
  /** Bpe.WordPattern as a SQL literal body (plain triple quote: the \s
    * must reach the SQL literally). */
  private val bpeWordRe = """[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"""

  private def bpeChainSql(numMerges: Int): String =
    bpeChainSql(numMerges, eow = false)

  private def bpeChainSql(numMerges: Int, eow: Boolean): String = {
    // AS MATERIALIZED on every w{r}: each round's dict is referenced
    // TWICE (next round's pair explode AND next round's replace), so
    // default CTE inlining would re-derive it at both sites — 2^rounds
    // scans of `documents` by round 20. Materializing pins the chain
    // to one evaluation per round, the same shape as the Spark side's
    // per-round localCheckpoint.
    // plain (non-interpolated) triple quote: the regex's \s and the
    // replacement's \1 must reach the SQL literally
    val head =
      """WITH wf AS (
         |  SELECT w, count(*) AS freq
         |  FROM (SELECT unnest(regexp_extract_all(text,
         |          '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS w FROM documents)
         |  WHERE length(w) <= 32 GROUP BY w),
         |w0 AS MATERIALIZED (
         |  SELECT w, ' ' || regexp_replace(w, '(.)', '\1 ', 'g')EOWSLOT AS sp,
         |         freq FROM wf)""".stripMargin
        .replace("EOWSLOT", if (eow) " || '</w> '" else "")
    val rounds = (1 to numMerges).map { r =>
      val prev = s"w${r - 1}"
      val rep4 = (1 to 4).foldLeft("sp")((acc, _) =>
        s"replace($acc, ' '||a||' '||b||' ', ' '||a||b||' ')")
      s"""p$r AS (SELECT unnest(s[1:len(s)-1]) AS a, unnest(s[2:len(s)]) AS b,
         |            freq
         |     FROM (SELECT string_split(trim(sp), ' ') AS s, freq FROM $prev)
         |     WHERE len(s) >= 2),
         |b$r AS (SELECT a, b FROM (SELECT a, b, sum(freq) AS cnt FROM p$r
         |                          GROUP BY a, b)
         |        ORDER BY cnt DESC, a, b LIMIT 1),
         |w$r AS MATERIALIZED (
         |  SELECT w, freq,
         |         CASE WHEN a IS NULL THEN sp ELSE $rep4 END AS sp
         |  FROM $prev LEFT JOIN b$r ON TRUE)""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  private val bpeMerges = 20

  private lazy val bpeTrainSql = {
    val union = (1 to bpeMerges).map(r =>
      s"SELECT CAST($r AS INTEGER) AS rank, a AS lhs, b AS rhs, a||b AS merged FROM b$r")
      .mkString("\nUNION ALL ")
    s"""${bpeChainSql(bpeMerges)}
       |SELECT * FROM (
       |$union
       |) ORDER BY rank""".stripMargin
  }

  private lazy val bpeVocabSql =
    s"""${bpeChainSql(bpeMerges)}
       |SELECT token, CAST(sum(freq) AS BIGINT) AS freq
       |FROM (SELECT unnest(string_split(trim(sp), ' ')) AS token, freq
       |      FROM w$bpeMerges)
       |GROUP BY token ORDER BY token""".stripMargin

  private lazy val bpeTrainEowSql = {
    val union = (1 to bpeMerges).map(r =>
      s"SELECT CAST($r AS INTEGER) AS rank, a AS lhs, b AS rhs, a||b AS merged FROM b$r")
      .mkString("\nUNION ALL ")
    s"""${bpeChainSql(bpeMerges, eow = true)}
       |SELECT * FROM (
       |$union
       |) ORDER BY rank""".stripMargin
  }

  private lazy val bpeSegmentSql =
    s"""${bpeChainSql(bpeMerges)},
       |occ AS (SELECT doc_id, unnest(regexp_extract_all(text,
       |          '$bpeWordRe')) AS w FROM documents),
       |seg AS (SELECT w, len(string_split(trim(sp), ' ')) AS n_sub
       |        FROM w$bpeMerges)
       |SELECT doc_id, count(*) AS n_words,
       |       CAST(sum(coalesce(n_sub, 1)) AS BIGINT) AS n_subwords
       |FROM occ LEFT JOIN seg USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Tokenization identical to TextNorm.tokens. */
  private val toksSql =
    """list_filter(string_split(lower(regexp_replace(text, '[^\p{L}\p{N}]+', ' ', 'g')), ' '), x -> x != '')"""

  /** The markup-strip chain identical to TextOps.stripHtml — comments,
    * script/style blocks with contents, all tags, six named entities
    * (&amp; last), horizontal-whitespace squeeze, line trim + blank
    * drop (array_to_string of an empty list is NULL in DuckDB where
    * Spark's array_join gives '' — hence the COALESCE). */
  private def stripHtmlSql(c: String): String =
    s"""COALESCE(array_to_string(list_filter(list_transform(
       |  string_split(regexp_replace(
       |    replace(replace(replace(replace(replace(replace(replace(
       |      regexp_replace(regexp_replace(regexp_replace(regexp_replace($c,
       |        '<!--.*?-->', ' ', 'gs'),
       |        '<script\\b[^>]*>.*?</script\\s*>', ' ', 'gis'),
       |        '<style\\b[^>]*>.*?</style\\s*>', ' ', 'gis'),
       |        '<[^>]*>', ' ', 'gs'),
       |      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
       |      '&#39;', ''''), '&apos;', ''''), '&amp;', '&'),
       |    '[ ' || chr(9) || chr(13) || ']+', ' ', 'g'), chr(10)),
       |  l -> trim(l)), l -> l != ''), chr(10)), '')""".stripMargin

  /** The English stopword profile as a SQL IN-list (quality_filter's
    * stop_raw must be the same h_en / n_tokens division text_stats uses). */
  private val enStopSql = TextOps.enStopwords.map(w => s"'$w'").mkString(", ")

  /** Distinct k-shingles identical to TextNorm.shingles(toks, k). */
  private def shinglesSqlK(k: Int): String =
    s"""list_distinct([array_to_string(toks[i:i+${k - 1}], ' ')
       |               for i in range(1, greatest(len(toks) - ${k - 1}, 1) + 1)])""".stripMargin

  /** Distinct 3-shingles identical to TextNorm.shingles(toks, 3). */
  private val shinglesSql = shinglesSqlK(3)

  /** The incremental admit rule, stated over exact Jaccard: a batch doc
    * (doc_id % 10 = 0) is dropped iff it pairs with a corpus doc, or
    * with ANY lower batch id (p already has id_a < id_b, so id_b =
    * doc_id covers both corpus and lower-batch partners on that side).
    * Shared verbatim by dedup_incremental and dedup_incremental_indexed. */
  private lazy val incrementalAdmitSql =
    s"""$pairsCte
       |SELECT doc_id FROM documents
       |WHERE doc_id % 10 = 0
       |  AND NOT EXISTS (
       |    SELECT 1 FROM p
       |    WHERE j >= 0.5 AND ((id_a = doc_id AND id_b % 10 != 0)
       |                        OR id_b = doc_id))
       |ORDER BY doc_id""".stripMargin

  /** Exact-Jaccard-pairs CTE body over 3-shingle sets of relation
    * `src` (must expose doc_id, text) — no leading WITH, so it composes
    * inside larger CTE chains (curate_corpus filters first). */
  private def pairsCteFrom(src: String): String =
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM $src),
       |d AS (SELECT doc_id, $shinglesSql AS sh FROM t),
       |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |             len(list_intersect(a.sh, b.sh))::DOUBLE
       |               / len(list_distinct(a.sh || b.sh)) AS j
       |      FROM d a, d b WHERE a.doc_id < b.doc_id)""".stripMargin

  /** Shared CTE prefix: exact Jaccard pairs over 3-shingle sets. */
  private val pairsCte =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |d AS (SELECT doc_id, $shinglesSql AS sh FROM t),
       |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |             len(list_intersect(a.sh, b.sh))::DOUBLE
       |               / len(list_distinct(a.sh || b.sh)) AS j
       |      FROM d a, d b WHERE a.doc_id < b.doc_id)""".stripMargin

  /** Exact Jaccard ≥ 0.5 pairs — the ground truth the minhash / simhash /
    * ngram variants must each recover. */
  private def jaccardPairsSql(selectCols: String): String =
    s"""$pairsCte
       |SELECT $selectCols FROM p WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin

  /** Shared WITH-body for the fixed-depth min-label propagation over the
    * exact-pair graph (rounds ≥ true diameter on this corpus — the Spark
    * side iterates to FIXPOINT, so equality additionally proves the
    * corpus components converged within `rounds`). */
  /** Undirected edges + seed labels from a pair CTE `p` filtered by
    * `pred`, followed by `rounds` min-label propagation steps — the SQL
    * replay of `Dedup.components`, reusable over any pair source. */
  private def edgesAndSteps(pred: String, rounds: Int): String = {
    val edges =
      s"""e AS (SELECT id_a AS src, id_b AS dst FROM p WHERE $pred
         |      UNION ALL
         |      SELECT id_b, id_a FROM p WHERE $pred),
         |nodes AS (SELECT DISTINCT src AS id FROM e),
         |l0 AS (SELECT id, id AS label FROM nodes)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""l$i AS (SELECT nodes.id,
         |  least(l.label, coalesce(m.minl, l.label)) AS label
         |  FROM nodes JOIN l${i - 1} l ON nodes.id = l.id
         |  LEFT JOIN (SELECT e.dst AS id, min(l2.label) AS minl
         |             FROM e JOIN l${i - 1} l2 ON e.src = l2.id
         |             GROUP BY e.dst) m ON m.id = nodes.id)""".stripMargin
    }
    s"""$edges,
       |${steps.mkString(",\n")}""".stripMargin
  }

  private def componentsCtesFrom(rounds: Int, src: String): String =
    s"""${pairsCteFrom(src)},
       |${edgesAndSteps("j >= 0.5", rounds)}""".stripMargin

  private def componentsCtes(rounds: Int): String =
    "WITH " + componentsCtesFrom(rounds, "documents")

  private def componentsSql(rounds: Int): String =
    s"""${componentsCtes(rounds)}
       |SELECT id, label AS component FROM l$rounds ORDER BY id""".stripMargin

  /** Corpus minus every non-representative (label != id) member. */
  /** DuckDB replay of Graph.pageRank over the co-purchase graph: the
    * identical fixed-point integer recurrence unrolled `iters` rounds
    * (`//` = the same truncating division as Spark's DIV on the
    * nonnegative ranks; every intermediate re-cast to BIGINT).
    * `weighted` splits mass by co-purchase count exactly like
    * `weightCol = n_baskets`. */
  private def pagerankSql(iters: Int, weighted: Boolean = false): String = {
    val base =
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |ok AS (SELECT o FROM b GROUP BY o HAVING count(*) <= 1000),
         |bb AS (SELECT b.o, b.p FROM b JOIN ok USING (o)),
         |pp AS (SELECT a.p AS src, b2.p AS dst, CAST(count(*) AS BIGINT) AS w
         |       FROM bb a JOIN bb b2 USING (o) WHERE a.p < b2.p
         |       GROUP BY 1, 2 HAVING count(*) >= 2),
         |edges AS (SELECT src, dst, ${if (weighted) "w" else "CAST(1 AS BIGINT) AS w"} FROM pp
         |          UNION ALL SELECT dst AS src, src AS dst, ${if (weighted) "w" else "CAST(1 AS BIGINT) AS w"} FROM pp),
         |deg AS (SELECT src, CAST(sum(w) AS BIGINT) AS wsum FROM edges GROUP BY src),
         |nodes AS (SELECT DISTINCT src AS id FROM edges
         |          UNION SELECT DISTINCT dst FROM edges),
         |r0 AS (SELECT id, CAST(1000000000000 AS BIGINT) AS pr FROM nodes)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""c$k AS (SELECT e.dst, CAST(sum((r.pr * e.w) // d.wsum) AS BIGINT) AS s
         |        FROM edges e JOIN r${k - 1} r ON e.src = r.id
         |        JOIN deg d ON e.src = d.src
         |        GROUP BY e.dst),
         |r$k AS (SELECT n.id,
         |               CAST(150000000000 + (85 * coalesce(c.s, 0)) // 100
         |                    AS BIGINT) AS pr
         |        FROM nodes n LEFT JOIN c$k c ON n.id = c.dst)""".stripMargin
    }
    (base +: rounds).mkString(",\n") +
      s"\nSELECT id, pr AS rank_fp FROM r$iters ORDER BY id"
  }

  private def dedupCorpusSql(rounds: Int): String =
    s"""${componentsCtes(rounds)}
       |SELECT d.doc_id FROM documents d
       |WHERE NOT EXISTS (SELECT 1 FROM l$rounds l
       |                  WHERE l.id = d.doc_id AND l.label <> l.id)
       |ORDER BY d.doc_id""".stripMargin

  /** Best-survivor corpus dedup: rank clusters (singletons = own label)
    * by n_chars desc, doc_id asc; keep rank 1. */
  private def dedupCorpusBestSql(rounds: Int): String =
    s"""${componentsCtes(rounds)},
       |lab AS (SELECT d.doc_id, d.n_chars, coalesce(l.label, d.doc_id) AS comp
       |        FROM documents d LEFT JOIN l$rounds l ON l.id = d.doc_id),
       |r AS (SELECT doc_id, row_number() OVER (PARTITION BY comp
       |        ORDER BY n_chars DESC, doc_id) AS rk FROM lab)
       |SELECT doc_id FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin

  /** Shared WITH-body replaying the deterministic 2-round k-means
    * (init stride 25, dim 64 — mirrors `Clustering.kmeans` params in
    * `kmeansClusters`/`clusterPurity`); final assignment is `a2`. */
  private val kmeansCtes =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings),
      |c0 AS (SELECT vec_id AS cent_id, dv AS cv FROM v WHERE vec_id % 25 = 0),
      |a1 AS (
      |  SELECT vec_id, dv, cent_id FROM (
      |    SELECT v.vec_id, v.dv, c.cent_id,
      |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
      |             list_dot_product(v.dv, v.dv)
      |             - 2.0 * list_dot_product(v.dv, c.cv)
      |             + list_dot_product(c.cv, c.cv) ASC, c.cent_id) AS rn
      |    FROM v, c0 c) WHERE rn = 1),
      |e1 AS (
      |  SELECT cent_id, i AS pos,
      |         CAST(sum(CAST(dv[i] AS DECIMAL(38,20))) AS DOUBLE)
      |           / count(*) AS m
      |  FROM a1, range(1, 65) t(i)
      |  GROUP BY cent_id, i),
      |c1 AS (SELECT cent_id, list(m ORDER BY pos) AS cv FROM e1 GROUP BY cent_id),
      |a2 AS (
      |  SELECT vec_id, cent_id FROM (
      |    SELECT v.vec_id, c.cent_id,
      |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
      |             list_dot_product(v.dv, v.dv)
      |             - 2.0 * list_dot_product(v.dv, c.cv)
      |             + list_dot_product(c.cv, c.cv) ASC, c.cent_id) AS rn
      |    FROM v, c1 c) WHERE rn = 1)""".stripMargin

  private val langHitsSql = TextOps.langProfiles.map { case (lang, words) =>
    val list = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(toks, x -> x IN ($list))) AS h_$lang"
  }.mkString(",\n         ")

  /** CASE chain mirroring TextOps.langId (first global argmax in
    * profile-priority order). */
  private val langCaseSql = {
    val langs = TextOps.langProfiles.map(_._1)
    val branches = langs.init.zipWithIndex.map { case (lang, i) =>
      val later = langs.drop(i + 1)
      val cond = later.map(l => s"h_$lang >= h_$l").mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }
    s"CASE ${branches.mkString(" ")} ELSE '${langs.last}' END"
  }

  private val statsSql =
    s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |s AS (
       |  SELECT doc_id, text, toks, len(toks) AS n_tokens,
       |         length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g'))::DOUBLE
       |           / length(text) AS punct_raw,
       |         $langHitsSql
       |  FROM t
       |),
       |x AS (
       |  SELECT doc_id, text, toks, n_tokens, punct_raw,
       |         CASE WHEN n_tokens > 0 THEN h_en::DOUBLE / n_tokens ELSE 0.0 END AS stop_raw,
       |         $langCaseSql AS lang_guess
       |  FROM s
       |)
       |SELECT doc_id,
       |       length(text) AS n_chars,
       |       n_tokens,
       |       len(list_distinct(toks)) AS n_distinct_tokens,
       |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpeish,
       |       round(CASE WHEN n_tokens > 0
       |             THEN list_sum(list_transform(toks, x -> length(x)))::DOUBLE / n_tokens
       |             ELSE 0.0 END, 4) AS avg_token_len,
       |       round(stop_raw, 4) AS stopword_ratio,
       |       round(punct_raw, 4) AS punct_ratio,
       |       round(0.4 * least(stop_raw / 0.4, 1.0)
       |           + 0.3 * (1.0 - least(punct_raw / 0.2, 1.0))
       |           + 0.3 * least(n_tokens::DOUBLE / 100.0, 1.0), 4) AS quality_score,
       |       lang_guess
       |FROM x""".stripMargin

  /** pack_shards and pack_shards_dist are the SAME layout computed two
    * ways (sequential window vs two-pass distributed prefix sum), so
    * they share one oracle — the strongest possible check that the
    * distributed formulation is exact. */
  private val packShardsSql =
    s"""WITH t AS (SELECT doc_id, lang, len($toksSql) AS n_tokens
       |           FROM documents),
       |c AS (SELECT doc_id, lang, n_tokens,
       |             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |      FROM t)
       |SELECT lang, CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS shard,
       |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
       |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY lang, shard ORDER BY lang, shard""".stripMargin

  /** Greedy longest-match wordpiece tokenization as DuckDB CTEs (vocab
    * VALUES → per-word piece walk → per-doc counts `ag(doc_id, n_words,
    * n_pieces, n_unk_words)`), shared by the tokenize_subword and
    * pack_shards_subword oracles so both gates replay the SAME vocab.
    * Callers prepend `WITH RECURSIVE ` (the walk is recursive). */
  private val subwordCtesSql =
    s"""vocab(piece) AS (VALUES
       |  ${graft.functions.Subword.defaultVocab
             .map(p => s"('$p')").mkString(", ")}),
       |vs AS (SELECT piece,
       |              CASE WHEN starts_with(piece, '##')
       |                   THEN substr(piece, 3) ELSE piece END AS stem,
       |              starts_with(piece, '##') AS cont
       |       FROM vocab),
       |vl AS (SELECT piece, stem, cont, len(stem) AS slen FROM vs),
       |t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |words AS (SELECT DISTINCT unnest(toks) AS w FROM t),
       |wpos AS (SELECT w, unnest(range(0, len(w))) AS pos FROM words),
       |best AS (SELECT w, pos, max_by(piece, slen) AS piece,
       |                max(slen) AS slen
       |         FROM wpos JOIN vl ON vl.cont = (wpos.pos > 0)
       |              AND substr(wpos.w, wpos.pos + 1, vl.slen) = vl.stem
       |         GROUP BY w, pos),
       |walk AS (
       |  SELECT w, 0 AS pos, CAST([] AS VARCHAR[]) AS pieces FROM words
       |  UNION ALL
       |  SELECT s.w,
       |         CASE WHEN b.piece IS NULL THEN len(s.w)
       |              ELSE s.pos + b.slen END,
       |         CASE WHEN b.piece IS NULL THEN ['${graft.functions.Subword.Unk}']
       |              ELSE list_append(s.pieces, b.piece) END
       |  FROM walk s LEFT JOIN best b ON b.w = s.w AND b.pos = s.pos
       |  WHERE s.pos < len(s.w)),
       |wt AS (SELECT w, pieces FROM walk WHERE pos >= len(w)),
       |dp AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |ag AS (SELECT dp.doc_id, count(*) AS n_words,
       |              CAST(sum(len(wt.pieces)) AS BIGINT) AS n_pieces,
       |              CAST(sum(CASE WHEN wt.pieces =
       |                  ['${graft.functions.Subword.Unk}']
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_unk_words
       |       FROM dp JOIN wt ON dp.tok = wt.w GROUP BY dp.doc_id)""".stripMargin

  /** The LSH bucket pipeline (md5 hyperplanes → sign bits → band
    * buckets → exploded bucket keys) shared by the similarity_ann and
    * dedup_embedding_ann oracles. Params fixed at nBits=64, dim=64,
    * bands=16 (4 bits/band), matching the registered queries. */
  private val annCtesSql =
    """v AS (SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings),
      |n AS (SELECT vec_id, dv, sqrt(list_dot_product(dv, dv)) AS nm FROM v),
      |planes AS (
      |  SELECT j, list(CASE WHEN substr(md5(j || ':' || i), 1, 1) < '8'
      |                      THEN 1.0 ELSE -1.0 END ORDER BY i) AS p
      |  FROM range(64) t1(j), range(64) t2(i) GROUP BY j),
      |bits AS (
      |  SELECT n.vec_id,
      |         list(CASE WHEN list_dot_product(pl.p, n.dv) > 0 THEN 1 ELSE 0 END
      |              ORDER BY pl.j) AS b
      |  FROM n, planes pl GROUP BY n.vec_id),
      |buckets AS (
      |  SELECT vec_id,
      |         [CAST(k*16 + b[k*4+1]*8 + b[k*4+2]*4 + b[k*4+3]*2 + b[k*4+4] AS BIGINT)
      |          for k in range(0, 16)] AS bk
      |  FROM bits),
      |cb AS (SELECT vec_id, unnest(bk) AS bucket FROM buckets)""".stripMargin

  def oracleSql: Map[String, String] = {
    val base = oracleSqlBase
    // timestamp-resolved time travel must agree with version-resolved:
    // both read the same pinned v1, so they share one oracle
    base + ("versioned_timetravel_ts" -> base("versioned_timetravel")) +
      // the SQL sugar (`VERSION AS OF` / `TIMESTAMP AS OF`) resolves
      // through the same readAt machinery — one oracle for all doors
      ("sql_timetravel" -> base("versioned_timetravel")) +
      // WAP through statement texts stages the same Feb-reprice/April-
      // append and publishes the same metadata-only fast-forward as
      // the Scala-API gate — one oracle for both doors
      ("sql_wap_branch" -> base("wap_publish_partitioned")) +
      // transform-partition DDL loads the same events slice under the
      // same days×bucket spec as the Scala-API gate — one oracle for
      // the DDL door and the HiddenPartition door
      ("sql_hidden_ddl" -> base("versioned_hidden_multi")) +
      ("sql_hidden_rowverbs" -> oracle("sql_hidden_rowverbs")) +
      // the WITH-prologue MERGE is syntax over the same upsert — the
      // two statement doors must land on one oracle
      ("sql_merge_cte" -> base("sql_merge_upsert")) +
      // TIFF round-trips losslessly over the SAME 4x4 RGB source as
      // BMP — the container must be invisible in the numbers, so the
      // stats/resize gates share BMP's oracles
      ("image_tiff_stats" -> base("image_bmp_stats")) +
      ("image_tiff_resize" -> base("image_bmp_resize")) +
      ("sql_changelog_view" -> oracle("sql_changelog_view")) +
      // a routed range statement over the z-ordered table must skip
      // files AND still answer exactly like the Scala readPruned gate —
      // one oracle for both doors
      ("sql_zorder_range" -> base("versioned_zorder_optimized")) +
      ("sql_dpp_join" -> oracle("sql_dpp_join")) +
      ("sql_point_lookup" -> oracle("sql_point_lookup")) +
      ("sql_agg_meta" -> oracle("sql_agg_meta")) +
      ("sql_agg_meta_trunc" -> oracle("sql_agg_meta_trunc")) +
      ("sql_agg_meta_hidden" -> oracle("sql_agg_meta_hidden")) +
      ("sql_tag_read" -> oracle("sql_tag_read")) +
      ("sql_mview_refresh" -> oracle("sql_mview_refresh")) +
      ("sql_mview_minmax" -> oracle("sql_mview_minmax")) +
      ("sql_mview_avg" -> oracle("sql_mview_avg")) +
      ("sql_write_order_range" -> oracle("sql_write_order_range")) +
      ("txn_pair" -> oracle("txn_pair")) +
      // the BEGIN…COMMIT door publishes the identical pair — one
      // oracle (the txn_pair file) for the Scala Txn API and the
      // statement door
      ("sql_txn_pair" -> oracle("txn_pair")) +
      ("sql_txn_merge" -> oracle("sql_txn_merge")) +
      ("sql_mview_join_minmax" -> oracle("sql_mview_join_minmax")) +
      ("versioned_upsert" -> oracle("versioned_upsert")) +
      ("sql_cache_table" -> oracle("sql_cache_table")) +
      ("changefeed_incremental" -> oracle("changefeed_incremental")) +
      ("changefeed_incremental_minmax" ->
        oracle("changefeed_incremental_minmax")) +
      ("changefeed_incremental_distinct" ->
        oracle("changefeed_incremental_distinct")) +
      ("changefeed_incremental_join" ->
        oracle("changefeed_incremental_join")) +
      ("changefeed_incremental_topk" ->
        oracle("changefeed_incremental_topk")) +
      // the feed-maintained quantile view replayed from scratch — same
      // JVM-literal lnGamma contract as incremental_quantile, over the
      // post-change months (01 untouched, 02 repriced x2, 03 appended)
      ("changefeed_incremental_quantile" -> {
        val lnGamma = math.log((1 + 0.01) / (1 - 0.01))
        s"""WITH m AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
          |                  CAST(o_totalprice AS DOUBLE) AS v
          |           FROM orders),
          |fin AS (
          |  SELECT month, v FROM m WHERE month = '1995-01'
          |  UNION ALL
          |  SELECT month, v * 2 AS v FROM m WHERE month = '1995-02'
          |  UNION ALL
          |  SELECT month, v FROM m WHERE month = '1995-03'
          |),
          |b AS (SELECT month,
          |             CAST(ceil(ln(v) / $lnGamma) AS INT) AS bucket,
          |             count(*) AS n
          |      FROM fin GROUP BY 1, 2),
          |c AS (SELECT month, bucket, n,
          |             sum(n) OVER (PARTITION BY month
          |                          ORDER BY bucket) AS cum,
          |             sum(n) OVER (PARTITION BY month) AS total
          |      FROM b),
          |qs AS (SELECT CAST(q AS DOUBLE) AS q
          |       FROM (VALUES (0.25), (0.5), (0.95)) AS t(q)),
          |sel AS (SELECT c.month, qs.q, min(c.bucket) AS bucket
          |        FROM c CROSS JOIN qs
          |        WHERE c.cum >= floor(qs.q * (c.total - 1)) + 1
          |        GROUP BY 1, 2)
          |SELECT month, q, bucket FROM sel
          |ORDER BY 1, 2""".stripMargin
      }) +
      ("sql_merge_evolve" -> oracle("sql_merge_evolve")) +
      // COPY INTO's idempotent triple-load lands exactly months
      // 1995-01..03 — the plain aggregate the time-travel gate uses
      ("sql_copy_into" -> base("versioned_timetravel")) +
      ("gopher_rules" -> oracle("gopher_rules")) +
      ("c4_clean" -> oracle("c4_clean")) +
      ("html_strip" -> oracle("html_strip")) +
      ("warc_extract" -> oracle("warc_extract")) +
      ("wet_extract" -> oracle("wet_extract")) +
      ("dedup_url" -> oracle("dedup_url")) +
      ("blocklist_filter" -> oracle("blocklist_filter")) +
      ("nfkc_normalize" -> oracle("nfkc_normalize"))
  }

  /** Static oracle SQL texts live as classpath resources
    * (`src/main/resources/oracles/<query>.sql`) — one reviewable file
    * per query; only oracles built from shared SQL fragments or
    * Scala-side parameters stay inline below. Loaded once at class
    * init (oracleSqlBase is lazy) — bounded, driver-side, no I/O in
    * any query path. */
  private def oracle(name: String): String = {
    val in = getClass.getResourceAsStream(s"/oracles/$name.sql")
    require(in != null, s"missing oracle resource oracles/$name.sql")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  private lazy val oracleSqlBase: Map[String, String] = Map(
    "dedup_exact" -> oracle("dedup_exact"),
    "dedup_minhash" -> jaccardPairsSql("id_a, id_b, round(j, 6) AS jaccard"),
    "dedup_ngram" -> jaccardPairsSql("id_a, id_b, round(j, 6) AS jaccard"),
    "dedup_simhash" -> jaccardPairsSql("id_a, id_b, round(j, 6) AS jaccard"),
    // the doc-freq cap is encoded in the oracle (HAVING <= cap on the
    // postings) so Spark/oracle equivalence holds by CONSTRUCTION, not
    // just while no window exceeds the cap in the test corpus
    "dedup_substring" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |d AS (SELECT doc_id, ${shinglesSqlK(8)} AS sh FROM t),
         |p0 AS (SELECT doc_id, unnest(sh) AS w FROM d),
         |ok AS (SELECT w FROM p0 GROUP BY w
         |       HAVING count(*) <= ${graft.ext.Dedup.DefaultMaxDocFreq}),
         |p AS (SELECT doc_id, w FROM p0 JOIN ok USING (w))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
         |FROM p a JOIN p b USING (w) WHERE a.doc_id < b.doc_id
         |GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin,
    // the incremental admit rule, stated over exact Jaccard: a batch doc
    // (doc_id % 10 = 0) is dropped iff it pairs with a corpus doc, or
    // with ANY lower batch id (p already has id_a < id_b, so id_b =
    // doc_id covers both corpus and lower-batch partners on that side)
    "dedup_incremental" -> incrementalAdmitSql,
    // the indexed path must admit the SAME set — shared oracle
    "dedup_incremental_indexed" -> incrementalAdmitSql,
    "decontaminate" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |d AS (SELECT doc_id, ${shinglesSqlK(5)} AS sh FROM t),
         |e AS (SELECT doc_id AS eval_id, unnest(sh) AS s FROM d
         |      WHERE doc_id % 7 = 0),
         |c AS (SELECT doc_id, unnest(sh) AS s FROM d WHERE doc_id % 7 != 0)
         |SELECT c.doc_id, count(DISTINCT c.s) AS n_overlap_shingles,
         |       count(DISTINCT e.eval_id) AS n_eval_docs
         |FROM c JOIN e ON c.s = e.s
         |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    "contamination_score" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |d AS (SELECT doc_id, ${shinglesSqlK(5)} AS sh FROM t),
         |e AS (SELECT DISTINCT unnest(sh) AS s FROM d WHERE doc_id % 7 = 0),
         |c AS (SELECT doc_id, unnest(sh) AS s FROM d WHERE doc_id % 7 != 0),
         |agg AS (SELECT c.doc_id, count(*) AS n_shingles,
         |               count(e.s) AS n_overlap
         |        FROM c LEFT JOIN e ON c.s = e.s
         |        GROUP BY c.doc_id)
         |SELECT d.doc_id,
         |       coalesce(agg.n_shingles, 0) AS n_shingles,
         |       coalesce(agg.n_overlap, 0) AS n_overlap,
         |       coalesce(agg.n_overlap * 10000 // agg.n_shingles, 0)
         |         AS contamination_bps
         |FROM d LEFT JOIN agg ON d.doc_id = agg.doc_id
         |WHERE d.doc_id % 7 != 0
         |ORDER BY d.doc_id""".stripMargin,
    "repetition_stats" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |d AS (SELECT doc_id, len(toks) AS n_tokens,
         |             len(${shinglesSqlK(2)}) AS d2,
         |             len(${shinglesSqlK(3)}) AS d3
         |      FROM t),
         |n AS (SELECT doc_id, n_tokens,
         |             greatest(n_tokens - 1, 1) AS n2,
         |             greatest(n_tokens - 2, 1) AS n3, d2, d3
         |      FROM d)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |       CAST((n2 - d2) * 10000 // n2 AS BIGINT) AS rep2_bps,
         |       CAST((n3 - d3) * 10000 // n3 AS BIGINT) AS rep3_bps
         |FROM n ORDER BY doc_id""".stripMargin,
    "sample_stratified" -> oracle("sample_stratified"),
    "domain_mix" -> oracle("domain_mix"),
    "dedup_clusters" -> componentsSql(4),
    "versioned_hidden_days" -> oracle("versioned_hidden_days"),
    "versioned_hidden_bucket" -> oracle("versioned_hidden_bucket"),
    "versioned_hidden_multi" -> oracle("versioned_hidden_multi"),
    "small_quantity_revenue" -> oracle("small_quantity_revenue"),
    "suppliers_kept_waiting" -> ExtQueries.suppliersWaitingSql,
    "sql_correlated_exists" -> ExtQueries.suppliersWaitingSql,
    "split_leakage_safe" ->
      s"""${componentsCtes(4)}
         |SELECT d.doc_id, coalesce(l.label, d.doc_id) AS group_key,
         |       CASE WHEN coalesce(l.label, d.doc_id) % 10 < 8 THEN 'train'
         |            WHEN coalesce(l.label, d.doc_id) % 10 = 8
         |              THEN 'validation'
         |            ELSE 'test' END AS split
         |FROM documents d LEFT JOIN l4 l ON l.id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "dedup_corpus" -> dedupCorpusSql(4),
    "dedup_corpus_best" -> dedupCorpusBestSql(4),
    // k-means replay: distances use the LITERAL expression
    // |p|^2 - 2 p.c + |c|^2 (same operation order as the Spark side →
    // bit-identical doubles); centroid means sum in DECIMAL(38,20) and
    // divide in double, so the update is order-independent and exact
    "kmeans_clusters" ->
      s"""$kmeansCtes
         |SELECT vec_id, cent_id AS cluster FROM a2 ORDER BY vec_id""".stripMargin,
    "modality_join" ->
      s"""$kmeansCtes,
         |stats AS ($statsSql)
         |SELECT a2.cent_id AS cluster, count(*) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |       CAST(sum(CAST(quality_score AS DECIMAL(10,4))) AS DOUBLE)
         |         AS sum_quality,
         |       count(DISTINCT lang_guess) AS n_langs
         |FROM a2 JOIN stats ON a2.vec_id = stats.doc_id
         |GROUP BY a2.cent_id ORDER BY cluster""".stripMargin,
    "cluster_purity" ->
      s"""$kmeansCtes,
         |bl AS (
         |  SELECT a2.cent_id AS cluster, e.label, count(*) AS n
         |  FROM a2 JOIN embeddings e USING (vec_id)
         |  GROUP BY 1, 2),
         |r AS (
         |  SELECT cluster, label, n,
         |         row_number() OVER (PARTITION BY cluster
         |                            ORDER BY n DESC, label ASC) AS rnk,
         |         CAST(sum(n) OVER (PARTITION BY cluster) AS BIGINT) AS cluster_n
         |  FROM bl)
         |SELECT cluster, label AS majority_label, cluster_n AS n_vectors,
         |       CAST((n * 10000) // cluster_n AS BIGINT) AS purity_bps
         |FROM r WHERE rnk = 1 ORDER BY cluster""".stripMargin,
    "dedup_embedding" -> oracle("dedup_embedding"),
    "dedup_embedding_ann" ->
      s"""WITH $annCtesSql,
        |cands AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM cb a JOIN cb b ON a.bucket = b.bucket
        |  WHERE a.vec_id < b.vec_id),
        |p AS (
        |  SELECT id_a, id_b,
        |         list_dot_product(na.dv, nb.dv) / (na.nm * nb.nm) AS c
        |  FROM cands
        |  JOIN n na ON na.vec_id = id_a
        |  JOIN n nb ON nb.vec_id = id_b)
        |SELECT id_a, id_b, round(c, 4) AS cos
        |FROM p WHERE c >= 0.45 ORDER BY id_a, id_b""".stripMargin,
    "dedup_embedding_clusters" ->
      s"""WITH $annCtesSql,
        |cands AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM cb a JOIN cb b ON a.bucket = b.bucket
        |  WHERE a.vec_id < b.vec_id),
        |p AS (
        |  SELECT id_a, id_b,
        |         list_dot_product(na.dv, nb.dv) / (na.nm * nb.nm) AS c
        |  FROM cands
        |  JOIN n na ON na.vec_id = id_a
        |  JOIN n nb ON nb.vec_id = id_b),
        |${edgesAndSteps("c >= 0.45", 4)}
        |SELECT id, label AS component FROM l4 ORDER BY id""".stripMargin,
    "similarity_topk" -> oracle("similarity_topk"),
    "text_stats" -> (statsSql + "\nORDER BY doc_id"),
    "text_lang_profile" ->
      s"""WITH stats AS ($statsSql)
         |SELECT lang_guess, count(*) AS n_docs,
         |       round(avg(n_tokens), 4) AS avg_tokens,
         |       round(avg(quality_score), 4) AS avg_quality
         |FROM stats GROUP BY lang_guess ORDER BY lang_guess""".stripMargin,
    "text_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |h AS (SELECT doc_id,
         |             [substr(md5(array_to_string(toks[i:i+2], ' ')), 1, 8)
         |              for i in range(1, greatest(len(toks) - 2, 1) + 1)] AS hs
         |      FROM t)
         |SELECT doc_id,
         |       array_to_string(
         |         list_sort(list_distinct([list_aggregate(hs[i:i+3], 'min')
         |                   for i in range(1, greatest(len(hs) - 3, 1) + 1)])),
         |         ',') AS fingerprint
         |FROM h ORDER BY doc_id""".stripMargin,
    "multimodal_features" -> oracle("multimodal_features"),
    // expected stats straight from the source values — the engine side
    // must reproduce them THROUGH encode→parse of the actual WAV bytes
    "audio_wav_stats" -> oracle("audio_wav_stats"),
    // the 8×8→4×4 nearest resize = the row-major positions with even
    // row and column index (1-based: r·8+c+1 for r,c ∈ {0,2,4,6})
    "image_pgm_resize" -> oracle("image_pgm_resize"),
    // expected stats straight from the source values — the engine side
    // must reproduce them THROUGH encode→parse of the actual PGM bytes
    "image_bmp_stats" -> oracle("image_bmp_stats"),
    "image_bmp_resize" -> oracle("image_bmp_resize"),
    // expected stats straight from the source values — the engine side
    // must reproduce them THROUGH the stateful QOI chunk stream (encode
    // → decode); the doubled pixel at source pos p (row p//4, col p%4)
    // lands at output positions 8r+2c and 8r+2c+1 → weight 16r+4c+1
    "image_qoi_stats" -> oracle("image_qoi_stats"),
    // 8×5 layout: base pixel p (row p//4, col p%4) doubled horizontally;
    // row 4 repeats base row 0 → base row 0 pixels appear 4× with
    // position weights (2c)+(2c+1)+(32+2c)+(32+2c+1) = 8c+66, rows 1-3
    // appear 2× with weights 16r+4c+1
    "image_png_stats" -> oracle("image_png_stats"),
    "image_jpeg_stats" -> oracle("image_jpeg_stats"),
    "image_jpeg_resize" -> oracle("image_jpeg_resize"),
    // the progressive stream decodes the identical constant-MCU
    // fixture — one analytic oracle for both encodings
    "image_jpeg_progressive" -> oracle("image_jpeg_stats"),
    // 8×5 → 4×2 nearest picks source rows 0,2 at even columns = base
    // pixels 0-3 and 8-11, same surviving set as the QOI resize gate
    "image_png_resize" -> oracle("image_png_resize"),
    // 8×4 → 4×2 nearest picks source (2i,2j) = base pixels 0-3 and 8-11
    // at output positions 0-7 (pos2 = pos - 4*(pos//8))
    "image_qoi_resize" -> oracle("image_qoi_resize"),
    // Animated-GIF compositing replayed positionally: frame 0 is the
    // base 8×4 layout; frame 1 overlays (4r+c-1)%16 on rows 1-2 cols
    // 2-5 then RESTORES that rect to background (disposal 2 → black,
    // since the hole slot guarantees palette[0]=0); frame 2 overlays
    // rows 2-3 with (2p+1)%16 except holes at p%3=0 (prior canvas shows
    // through); frame 3 overlays (3p+2)%16 on rows 0-1 cols 5-6.
    "video_gif_stats" -> oracle("video_gif_stats"),
    // Frame-sample stride 2 (composites 0 and 2) then 8×4→4×2 nearest
    // resize picks source (2i, 2j): from frame 0 that's base(8i+j);
    // from frame 2, row 0 is base(j) and row 1 hits two holes (source
    // cols 0,6 → prior canvas base(8), base(11)) and two overlay cells
    // (base(5), base(9)). The re-encode/decode round trip is identity.
    "video_gif_frames" -> oracle("video_gif_frames"),
    "image_pgm_stats" -> oracle("image_pgm_stats"),
    "sessionize" -> oracle("sessionize"),
    "scd2_history" -> oracle("scd2_history"),
    "stats_agg" -> oracle("stats_agg"),
    "regr_stats" -> oracle("regr_stats"),
    "misc_aggs" -> oracle("misc_aggs"),
    "profile_lineitem" -> Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |       count(*) FILTER (WHERE $c IS NULL) AS n_nulls,
           |       count(DISTINCT $c) AS n_distinct,
           |       round(min($c)::DOUBLE, 4) AS min_value,
           |       round(max($c)::DOUBLE, 4) AS max_value,
           |       round(avg($c), 4) AS avg_value
           |FROM lineitem""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    "asof_ref" -> oracle("asof_ref"),
    // forward as-of: DuckDB's ASOF infers direction from the inequality
    "asof_forward" -> oracle("asof_forward"),
    // nearest = the closer of the backward and forward matches, ties to
    // backward (pandas merge_asof tie rule) — two ASOF joins + a pick
    "asof_nearest" -> oracle("asof_nearest"),
    "pack_shards" -> packShardsSql,
    "pack_shards_dist" -> packShardsSql,
    "dominant_source" -> oracle("dominant_source"),
    "pack_length_buckets" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens
         |           FROM documents),
         |b AS (SELECT doc_id, n_tokens, n_tokens // 64 AS len_bucket FROM t),
         |c AS (SELECT doc_id, len_bucket, n_tokens,
         |             sum(n_tokens) OVER (PARTITION BY len_bucket ORDER BY doc_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM b)
         |SELECT len_bucket, CAST(floor((cum - n_tokens) / 2048) AS BIGINT) AS shard,
         |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY len_bucket, shard ORDER BY len_bucket, shard""".stripMargin,
    "revenue_share" -> oracle("revenue_share"),
    "join_region" -> oracle("join_region"),
    "join_semi_anti" -> oracle("join_semi_anti"),
    "set_ops" -> oracle("set_ops"),
    "json_props" -> oracle("json_props"),
    "events_variant" -> oracle("events_variant"),
    "versioned_shred" -> oracle("versioned_shred"),
    "docs_pivot" -> oracle("docs_pivot"),
    "quantiles_lineitem" -> oracle("quantiles_lineitem"),
    "range_bands" -> oracle("range_bands"),
    "docs_rollup" -> oracle("docs_rollup"),
    "join_revenue" -> oracle("join_revenue"),
    "shipping_priority" -> oracle("shipping_priority"),
    "events_lead_lag" -> oracle("events_lead_lag"),
    "docs_cube" -> oracle("docs_cube"),
    "top_parts_per_brand" -> oracle("top_parts_per_brand"),
    "sample_hash" -> oracle("sample_hash"),
    "tfidf_topterms" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |p AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM p GROUP BY 1, 2),
         |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_total FROM documents),
         |scored AS (
         |  SELECT doc_id, tok, tf.tf * ln(n_total::DOUBLE / df) AS score
         |  FROM tf JOIN dfreq USING (tok), n),
         |r AS (SELECT doc_id, tok, score,
         |             row_number() OVER (PARTITION BY doc_id
         |                                ORDER BY score DESC, tok) AS rank
         |      FROM scored)
         |SELECT doc_id, tok, rank, round(score, 4) AS score
         |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "join_skew_salted" -> oracle("join_skew_salted"),
    "price_metrics" -> oracle("price_metrics"),
    "bars_weekly" -> oracle("bars_weekly"),
    // OBV is pure integer arithmetic; ATR replays the exact-decimal
    // window sum + one fixed-order double division
    "indicators_obv_atr" -> oracle("indicators_obv_atr"),
    // integer-exact Bollinger: same unit scaling, same decimal sums,
    // same single double division + sqrt — bit-identical pre-round
    "bollinger_bands" -> oracle("bollinger_bands"),
    "rsi_close" -> oracle("rsi_close"),
    // exact-decimal channel extremes; one IEEE division per ratio with
    // explicit parens so both engines associate identically
    "stochastic_k" -> oracle("stochastic_k"),
    // decimal price×volume numerator, integer denominator, one final
    // division — partial windows are exact weighted means, no NULL gate
    "vwap_rolling" -> oracle("vwap_rolling"),
    // 1e-6 integer units throughout; sample variance via the HUGEINT
    // identity, downside is the population RMS of the negative deltas
    "risk_metrics" -> oracle("risk_metrics"),
    // five exact-decimal sums per pair; the coefficient is one final
    // double expression over the HUGEINT identities
    "returns_correlation" -> oracle("returns_correlation"),
    // conditional aggregation replays the explicit-values pivot
    "pivot_volume" -> oracle("pivot_volume"),
    // UNION ALL of the four projections replays the melt
    "bars_unpivot" -> oracle("bars_unpivot"),
    // integer-derived ranks; percent_rank/cume_dist are the standard
    // rational forms on identical operands. The DataFrame gate and the
    // shared-text SQL gate both verify against the SAME string that
    // sql_window_ranks executes on Spark — one text, two engines.
    "window_ranks" -> ExtQueries.windowRanksSql,
    "sql_window_ranks" -> ExtQueries.windowRanksSql,
    "sql_grouping_sets" -> ExtQueries.groupingSetsSql,
    "sql_interval_range" -> ExtQueries.intervalRangeSql,
    "sql_percentile_cont" -> ExtQueries.percentileContSql,
    // pure integer sums per grouping set; gid tags the level
    "volume_rollup" -> oracle("volume_rollup"),
    // the two dyadic left-folds replayed with DuckDB list comprehensions
    // (the ewma_close technique); macd is their raw-double difference
    "macd_dyadic" -> oracle("macd_dyadic"),
    // running-peak date by double equality on the row that set it,
    // then pure integer date arithmetic
    "underwater_days" -> oracle("underwater_days"),
    // market composite = exact decimal sum of all keys' deltas per date;
    // β via the HUGEINT identities, one final double division
    "beta_market" -> oracle("beta_market"),
    // integer tick sums per ISO weekday; raw-double fixed-order shares
    "volume_seasonality" -> oracle("volume_seasonality"),
    // pure integer date arithmetic
    "trading_gaps" -> oracle("trading_gaps"),
    "event_bursts" -> oracle("event_bursts"),
    "cluster_sizes" ->
      s"""${componentsCtes(4)},
         |lab AS (SELECT label, count(*) AS sz FROM l4 GROUP BY 1)
         |SELECT sz AS cluster_size, count(*) AS n_clusters
         |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin,
    "collocations" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |n AS (SELECT count(*) AS nd FROM documents),
         |uni AS (SELECT tok, count(*) AS dft
         |        FROM (SELECT doc_id, unnest(list_distinct(toks)) AS tok FROM t)
         |        WHERE len(tok) > 0 GROUP BY 1),
         |bi AS (SELECT bigram, count(*) AS df_pair
         |       FROM (SELECT doc_id, unnest(${shinglesSqlK(2)}) AS bigram FROM t)
         |       WHERE len(string_split(bigram, ' ')) = 2
         |       GROUP BY 1 HAVING count(*) >= 5)
         |SELECT bigram, df_pair,
         |       round(ln((CAST(df_pair AS DOUBLE) / nd)
         |                / ((CAST(a.dft AS DOUBLE) / nd)
         |                   * (CAST(b.dft AS DOUBLE) / nd))), 4) AS pmi
         |FROM bi CROSS JOIN n
         |JOIN uni a ON a.tok = string_split(bigram, ' ')[1]
         |JOIN uni b ON b.tok = string_split(bigram, ' ')[2]
         |ORDER BY bigram""".stripMargin,
    "doc_logprob" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |occ AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |f AS (SELECT tok, count(*) AS c FROM occ GROUP BY 1),
         |tot AS (SELECT sum(c) AS n FROM f),
         |j AS (SELECT doc_id, tok,
         |             ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) AS lp
         |      FROM occ JOIN f USING (tok) CROSS JOIN tot)
         |SELECT doc_id, count(*) AS n_tokens,
         |       round(list_reduce(list(lp ORDER BY tok), (a, v) -> a + v)
         |             / count(*), 4) AS avg_logprob
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "perplexity_buckets" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |occ AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |f AS (SELECT tok, count(*) AS c FROM occ GROUP BY 1),
         |tot AS (SELECT sum(c) AS n FROM f),
         |j AS (SELECT doc_id, tok,
         |             ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) AS lp
         |      FROM occ JOIN f USING (tok) CROSS JOIN tot),
         |lp AS (SELECT doc_id, count(*) AS n_tokens,
         |              round(list_reduce(list(lp ORDER BY tok),
         |                                (a, v) -> a + v)
         |                    / count(*), 4) AS avg_logprob
         |       FROM j GROUP BY doc_id),
         |z AS (SELECT lang, n_tokens, avg_logprob,
         |             CAST(ntile(3) OVER (PARTITION BY lang
         |               ORDER BY avg_logprob DESC, doc_id) AS INTEGER)
         |               AS bucket
         |      FROM lp JOIN documents USING (doc_id))
         |SELECT lang, bucket, count(*) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
         |       min(avg_logprob) AS min_lp, max(avg_logprob) AS max_lp
         |FROM z GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin,
    "bpe_train" -> bpeTrainSql,
    "bpe_train_eow" -> bpeTrainEowSql,
    "bpe_vocab" -> bpeVocabSql,
    "bpe_segment" -> bpeSegmentSql,
    "bpe_tokens" ->
      s"""${bpeChainSql(bpeMerges)},
         |occ AS (SELECT doc_id,
         |               unnest(regexp_extract_all(text, '$bpeWordRe')) AS w,
         |               unnest(generate_series(1,
         |                 len(regexp_extract_all(text, '$bpeWordRe')))) AS pos
         |        FROM documents),
         |seg AS (SELECT w, trim(sp) AS s FROM w$bpeMerges)
         |SELECT doc_id, count(*) AS n_words,
         |       string_agg(coalesce(s, w), ' ' ORDER BY pos) AS tokens
         |FROM occ LEFT JOIN seg USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "pack_shards_bpe" ->
      s"""${bpeChainSql(bpeMerges)},
         |occ AS (SELECT doc_id, unnest(regexp_extract_all(text,
         |          '$bpeWordRe')) AS w FROM documents),
         |seg AS (SELECT w, len(string_split(trim(sp), ' ')) AS n_sub
         |        FROM w$bpeMerges),
         |ns AS (SELECT doc_id, CAST(sum(coalesce(n_sub, 1)) AS BIGINT)
         |              AS n_tokens
         |       FROM occ LEFT JOIN seg USING (w) GROUP BY doc_id),
         |dc AS (SELECT d.doc_id, d.lang, coalesce(ns.n_tokens, 0) AS n_tokens
         |       FROM documents d LEFT JOIN ns USING (doc_id)),
         |c AS (SELECT doc_id, lang, n_tokens,
         |             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |               AS cum
         |      FROM dc)
         |SELECT lang, CAST(floor((cum - n_tokens) / 1024) AS BIGINT) AS shard,
         |       count(*) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY lang, shard ORDER BY lang, shard""".stripMargin,
    "importance_sample" ->
      s"""WITH t AS (SELECT doc_id, lang = 'en' AS tgt, $toksSql AS toks
         |           FROM documents),
         |occ AS (SELECT doc_id, tgt, unnest(toks) AS tok FROM t),
         |fa AS (SELECT tok, count(*) AS ca FROM occ GROUP BY 1),
         |ft AS (SELECT tok, count(*) AS ct FROM occ WHERE tgt GROUP BY 1),
         |sc AS (SELECT count(*) AS v, sum(ca) AS ta,
         |              sum(coalesce(ct, 0)) AS tt
         |       FROM fa LEFT JOIN ft USING (tok)),
         |j AS (SELECT doc_id, tok,
         |        ln((CAST(coalesce(ct, 0) AS DOUBLE) + 1.0)
         |           / (CAST(tt AS DOUBLE) + 1.0 * CAST(v AS DOUBLE)))
         |      - ln((CAST(ca AS DOUBLE) + 1.0)
         |           / (CAST(ta AS DOUBLE) + 1.0 * CAST(v AS DOUBLE))) AS lp
         |      FROM occ JOIN fa USING (tok) LEFT JOIN ft USING (tok)
         |      CROSS JOIN sc)
         |SELECT doc_id, count(*) AS n_tokens,
         |       round(list_reduce(list(lp ORDER BY tok), (a, v) -> a + v)
         |             / count(*), 4) + 0.0 AS logratio,
         |       round(list_reduce(list(lp ORDER BY tok), (a, v) -> a + v)
         |             / count(*), 4) > 0 AS keep
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "doc_logprob_bigram" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |occ1 AS (SELECT doc_id, unnest(toks) AS cur FROM t),
         |uni AS (SELECT cur, count(*) AS c1 FROM occ1 GROUP BY 1),
         |tot AS (SELECT sum(c1) AS n FROM uni),
         |o2 AS (SELECT doc_id,
         |              string_split(bg, ' ')[1] AS prev,
         |              string_split(bg, ' ')[2] AS cur
         |       FROM (SELECT doc_id,
         |                    unnest([toks[i] || ' ' || toks[i + 1]
         |                            for i in range(1, len(toks))]) AS bg
         |             FROM t WHERE len(toks) >= 2)),
         |big AS (SELECT prev, cur, count(*) AS c2 FROM o2 GROUP BY 1, 2),
         |ctx AS (SELECT prev, count(*) AS cctx FROM o2 GROUP BY 1),
         |s2 AS (SELECT doc_id, prev, cur,
         |              ln(0.75 * CAST(c2 AS DOUBLE) / CAST(cctx AS DOUBLE)
         |                 + 0.25 * CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE)) AS lp
         |       FROM o2 JOIN big USING (prev, cur) JOIN ctx USING (prev)
         |       JOIN uni USING (cur) CROSS JOIN tot),
         |s1 AS (SELECT doc_id, '' AS prev, toks[1] AS cur,
         |              ln(CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE)) AS lp
         |       FROM t JOIN uni ON uni.cur = toks[1] CROSS JOIN tot
         |       WHERE len(toks) >= 1),
         |u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
         |SELECT doc_id, count(*) AS n_tokens,
         |       round(list_reduce(list(lp ORDER BY prev, cur), (a, v) -> a + v)
         |             / count(*), 4) AS avg_logprob
         |FROM u GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "ngram_novelty" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |d AS (SELECT doc_id, unnest($shinglesSql) AS sh FROM t),
         |f AS (SELECT sh, count(*) AS dfc FROM d GROUP BY 1)
         |SELECT doc_id, count(*) AS n_shingles,
         |       CAST(sum(CASE WHEN dfc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         |       (CAST(sum(CASE WHEN dfc = 1 THEN 1 ELSE 0 END) AS BIGINT) * 10000)
         |         // count(*) AS novelty_bps
         |FROM d JOIN f USING (sh)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_spans" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |c AS (SELECT doc_id,
         |             unnest(range(0, (len(toks) + 7) // 8)) AS span_idx,
         |             toks
         |      FROM t WHERE len(toks) >= 1),
         |s AS (SELECT doc_id, span_idx,
         |             array_to_string(toks[span_idx * 8 + 1 : span_idx * 8 + 8], ' ') AS sp
         |      FROM c),
         |r AS (SELECT doc_id, span_idx, sp,
         |             row_number() OVER (PARTITION BY sp ORDER BY doc_id, span_idx) AS rn
         |      FROM s),
         |g AS (SELECT doc_id, count(*) AS n_spans,
         |             CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |             coalesce(string_agg(CASE WHEN rn = 1 THEN sp END, ' '
         |                                 ORDER BY span_idx), '') AS cleaned_text
         |      FROM r GROUP BY doc_id)
         |SELECT d.doc_id,
         |       coalesce(g.n_spans, 0) AS n_spans,
         |       coalesce(g.n_removed, 0) AS n_removed,
         |       coalesce(g.cleaned_text, '') AS cleaned_text
         |FROM documents d LEFT JOIN g USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "dedup_containment" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |d AS (SELECT doc_id, $shinglesSql AS sh FROM t),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |             greatest(
         |               len(list_intersect(a.sh, b.sh))::DOUBLE / len(a.sh),
         |               len(list_intersect(a.sh, b.sh))::DOUBLE / len(b.sh)) AS c
         |      FROM d a, d b WHERE a.doc_id < b.doc_id)
         |SELECT id_a, id_b, round(c, 6) AS containment
         |FROM p WHERE c >= 0.8 ORDER BY id_a, id_b""".stripMargin,
    "similarity_quantized" -> oracle("similarity_quantized"),
    "dedup_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |h AS (SELECT doc_id,
         |             [substr(md5(array_to_string(toks[i:i+2], ' ')), 1, 8)
         |              for i in range(1, greatest(len(toks) - 2, 1) + 1)] AS hs
         |      FROM t),
         |f AS (SELECT doc_id,
         |             unnest(list_distinct([list_aggregate(hs[i:i+3], 'min')
         |                     for i in range(1, greatest(len(hs) - 3, 1) + 1)])) AS fp
         |      FROM h),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
         |      FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2)
         |SELECT id_a, id_b, n_shared FROM p
         |WHERE n_shared >= 2 ORDER BY id_a, id_b""".stripMargin,
    "temperature_mix" -> oracle("temperature_mix"),
    "quality_score_lr" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, len(toks) AS n_tokens,
         |             CASE WHEN len(toks) > 0 THEN
         |               len(list_distinct(toks))::DOUBLE / len(toks)
         |             ELSE 0.0 END AS r_distinct,
         |             CASE WHEN len(toks) > 0 THEN
         |               list_sum(list_transform(toks, x -> length(x)))::DOUBLE
         |                 / len(toks)
         |             ELSE 0.0 END AS r_meanlen,
         |             CASE WHEN len(toks) > 0 THEN
         |               len(list_filter(toks, x -> x IN ($enStopSql)))::DOUBLE
         |                 / len(toks)
         |             ELSE 0.0 END AS r_stop
         |      FROM t),
         |z AS (SELECT doc_id, n_tokens,
         |             -3.0 + 1.0 * (CAST(n_tokens AS DOUBLE) / 100.0)
         |                  + 1.5 * r_distinct
         |                  + 0.1 * r_meanlen
         |                  + 8.0 * r_stop AS zv
         |      FROM s)
         |SELECT doc_id, n_tokens,
         |       round(1.0 / (1.0 + exp(-zv)), 4) AS lr_score,
         |       zv >= 0 AS keep
         |FROM z ORDER BY doc_id""".stripMargin,
    "embed_quantize" -> oracle("embed_quantize"),
    "doc_chunks" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |c AS (SELECT doc_id,
         |             unnest(range(0, (greatest(len(toks) - 8, 1) + 23) // 24)) AS chunk_id,
         |             toks
         |      FROM t)
         |SELECT doc_id, chunk_id,
         |       array_to_string(toks[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ') AS chunk_text,
         |       len(toks[chunk_id * 24 + 1 : chunk_id * 24 + 32]) AS n_tokens
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "price_histogram" -> oracle("price_histogram"),
    "snapshot_diff" -> oracle("snapshot_diff"),
    "rolling_wau" -> oracle("rolling_wau"),
    "ewma_close" -> oracle("ewma_close"),
    "events_outliers" -> oracle("events_outliers"),
    // maxBasketSize=1000 encoded in the oracle (HAVING <= cap) so the
    // oversized-basket exclusion is equivalent by construction
    "pagerank_parts" -> pagerankSql(3),
    "pagerank_weighted" -> pagerankSql(3, weighted = true),
    "triangle_counts" -> oracle("triangle_counts"),
    "basket_pairs" -> oracle("basket_pairs"),
    "fuzzy_join" -> oracle("fuzzy_join"),
    "zorder_layout" ->
      s"""SELECT p_partkey, p_size,
         |       ${graft.ops.ZOrder.zkeySql(Seq("p_size", "p_partkey % 64"), 6)} AS zkey
         |FROM part ORDER BY zkey, p_partkey""".stripMargin,
    "bloom_semi_join" -> oracle("bloom_semi_join"),
    "orders_by_month" -> oracle("orders_by_month"),
    "join_bucketed" -> oracle("join_bucketed"),
    // The three versioned_* gates replay the table-format outcome in
    // plain SQL over the raw parquet: changed-partition set for the
    // incremental scan, full-upsert state for the partition-grain
    // merge, plain range filter for the stats-pruned read.
    "versioned_changes" -> oracle("versioned_changes"),
    "versioned_merge" -> oracle("versioned_merge"),
    "versioned_pruned" -> oracle("versioned_pruned"),
    "versioned_zorder_optimized" -> oracle("versioned_zorder_optimized"),
    // Compaction is content-preserving: 12 single-month promotes under
    // the fan-in policy read back as the plain per-month aggregate.
    "versioned_compacted" -> oracle("versioned_compacted"),
    // Time travel: the pinned v1 read ignores the later 1995-02
    // rewrite, so the oracle is the UNMODIFIED three months.
    // same direct Jan–Mar aggregation as versioned_timetravel: the WAP
    // publish must land main on exactly the staged branch state
    "wap_publish" -> oracle("wap_publish"),
    // Feb repriced on the branch, April appended, Jan/Mar inherited —
    // the published state aggregated directly
    "wap_publish_partitioned" -> oracle("wap_publish_partitioned"),
    // post-rollback main serves the original Jan–Mar state
    "versioned_rollback" -> oracle("versioned_rollback"),
    "versioned_timetravel" -> oracle("versioned_timetravel"),
    "versioned_evolve" -> oracle("versioned_evolve"),
    // Delta maintenance must equal recompute: the oracle aggregates the
    // post-change table built from scratch.
    "incremental_agg" -> oracle("incremental_agg"),
    // Maintained min/max and top-k views vs from-scratch recomputes of
    // the post-change table (the same fin CTE as incremental_agg).
    "incremental_minmax" -> oracle("incremental_minmax"),
    "incremental_topk" -> oracle("incremental_topk"),
    // The row-level-verb gates share one fixture (the %4<2 slice of
    // three months, DECIMAL(18,2) prices) and restate each verb's
    // outcome as a direct CASE over the same slice — the engine runs
    // the statement text, the oracle runs the semantics.
    "sql_merge_upsert" -> oracle("sql_merge_upsert"),
    "sql_merge_prune" -> oracle("sql_merge_prune"),
    "sql_update_where" -> oracle("sql_update_where"),
    "sql_delete_rows" -> oracle("sql_delete_rows"),
    "sql_alter_add" -> oracle("sql_alter_add"),
    // three-way classification: matched+high → t+s sum with 'merged';
    // matched+low → UNTOUCHED target row; source-only (%4=2) → insert
    "sql_merge_conditional" -> oracle("sql_merge_conditional"),
    // drop-then-re-add: every row answers the new default — the old
    // physical 'base' values must NOT resurrect
    "sql_alter_drop" -> oracle("sql_alter_drop"),
    "sql_alter_rename" -> oracle("sql_alter_rename"),
    // the widened column absorbs a 23-digit value; sums exact in
    // DECIMAL until the final DOUBLE cast
    "sql_alter_widen" -> oracle("sql_alter_widen"),
    // February replaced wholesale by the overwrite slice (note: keyed
    // %2, NOT the fixture's %4<2 — vanished rows must stay vanished),
    // January/March inherited.
    "sql_insert_overwrite" -> oracle("sql_insert_overwrite"),
    "sql_truncate_reload" -> oracle("sql_truncate_reload"),
    "sql_ctas_view" -> oracle("sql_ctas_view"),
    // OPTIMIZE + VACUUM are pure relayout/reclamation: content must be
    // row-identical to the untouched fixture slice.
    "sql_optimize_vacuum" -> oracle("sql_optimize_vacuum"),
    // The commit log's shape is fully determined by the scripted
    // statements: v1 = base insert (3 months), v2 = one-month CoW
    // UPDATE (partition count unchanged), v3 = April insert (4).
    "sql_history_meta" -> oracle("sql_history_meta"),
    // partitions.n_rows ≡ sum(files.record_count) ≡ the raw recount;
    // no MoR deletes in the script, so n_delete_files = 0 everywhere.
    "sql_partitions_meta" -> oracle("sql_partitions_meta"),
    "sql_show_partitions" -> oracle("sql_show_partitions"),
    // Every ANALYZE statistic recomputed from the raw fixture slice;
    // the version stamps are the fixture's single INSERT commit (v1),
    // analyzed and current alike.
    "sql_analyze_stats" -> oracle("sql_analyze_stats"),
    // rollback + rewrite + expire must be a content no-op: the bad
    // repricing commit is fully undone, so the oracle is the untouched
    // base fixture slice (same contract as sql_optimize_vacuum).
    "sql_call_rollback" -> oracle("sql_call_rollback"),
    // HLL estimates at coupon-mode cardinality are exact, so the
    // maintained sketch view is recomputed as plain COUNT DISTINCT
    // over the post-change composition.
    "incremental_distinct" -> oracle("incremental_distinct"),
    // The maintained log-bucket quantile view replayed from scratch:
    // bucket = ceil(ln(v)/ln γ) with ln γ embedded as the JVM-computed
    // literal (Double.toString round-trips bit-exactly through DuckDB's
    // parser, so both engines divide by the same double; ln(v) is the
    // one remaining cross-engine libm call — boundary-flip risk ~2⁻⁵²
    // relative per value). Rank walk and bucket selection are integer-
    // exact.
    "incremental_quantile" -> {
      val lnGamma = math.log((1 + 0.01) / (1 - 0.01))
      s"""WITH m AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
        |                  o_orderstatus, CAST(o_totalprice AS DOUBLE) AS v
        |           FROM orders),
        |fin AS (
        |  SELECT o_orderstatus, v FROM m
        |  WHERE month IN ('1995-01', '1995-03', '1995-04')
        |  UNION ALL
        |  SELECT o_orderstatus, v * 2 AS v FROM m WHERE month = '1995-02'
        |),
        |b AS (SELECT o_orderstatus,
        |             CAST(ceil(ln(v) / $lnGamma) AS INT) AS bucket,
        |             count(*) AS n
        |      FROM fin GROUP BY 1, 2),
        |c AS (SELECT o_orderstatus, bucket, n,
        |             sum(n) OVER (PARTITION BY o_orderstatus
        |                          ORDER BY bucket) AS cum,
        |             sum(n) OVER (PARTITION BY o_orderstatus) AS total
        |      FROM b),
        |qs AS (SELECT CAST(q AS DOUBLE) AS q
        |       FROM (VALUES (0.25), (0.5), (0.95)) AS t(q)),
        |sel AS (SELECT c.o_orderstatus, qs.q, min(c.bucket) AS bucket
        |        FROM c CROSS JOIN qs
        |        WHERE c.cum >= floor(qs.q * (c.total - 1)) + 1
        |        GROUP BY 1, 2)
        |SELECT o_orderstatus, q, bucket FROM sel
        |ORDER BY 1, 2""".stripMargin
    },
    // The join view maintained by the two-relation delta rule must
    // equal this from-scratch recompute of the post-change fact ⋈ the
    // post-change dim.
    "incremental_join" -> oracle("incremental_join"),
    // Partition-spec evolution must be a pure relayout: the aggregate
    // over the evolved table equals the same aggregate over the source.
    "versioned_repartition" -> oracle("versioned_repartition"),
    // Same oracle as versioned_evolve by design: rewrite evolution and
    // metadata-only evolution must be observationally equivalent.
    "versioned_evolve_meta" -> oracle("versioned_evolve_meta"),
    // same delete predicate as versioned_delete, served merge-on-read;
    // March stays live (no dropPartitions in this gate)
    "versioned_delete_mor" -> oracle("versioned_delete_mor"),
    "versioned_delete" -> oracle("versioned_delete"),
    // Final dest state after two propagation hops: original 1995-01,
    // uplifted 1995-02 (the rewrite that rode hop 2), new 1995-03.
    "versioned_propagate" -> oracle("versioned_propagate"),
    "versioned_changefeed" -> oracle("versioned_changefeed"),
    // CDC feed over the backfill window: 1995-02's dropped keys are
    // deletes, its genuinely-repriced keys are updates (unchanged keys
    // vanish), 1995-04 is all inserts; untouched 01/03 contribute
    // nothing because their partitions never enter the diff.
    "versioned_cdc" -> oracle("versioned_cdc"),
    // Per-month stats of the post-rewrite table state: 01/03 original,
    // 02 with every 10th key dropped — the engine answers from stats
    // sidecars, the oracle from the rows themselves.
    "versioned_stats" -> oracle("versioned_stats"),
    "merge_upsert" -> oracle("merge_upsert"),
    "resample_ffill" -> oracle("resample_ffill"),
    // resample_interp emits close UNROUNDED: the arithmetic below is the
    // exact IEEE operation order of Resample.dailyInterpolate
    // (vp + ((vn-vp) * num) / den with integer day distances), so the
    // doubles agree bit-for-bit; rounding would only add half-case risk.
    "resample_interp" -> oracle("resample_interp"),
    "rolling_range" -> oracle("rolling_range"),
    "rank_family" -> oracle("rank_family"),
    "join_outer" -> oracle("join_outer"),
    "above_brand_avg" -> oracle("above_brand_avg"),
    "map_functions" -> oracle("map_functions"),
    "topk_agg" -> oracle("topk_agg"),
    "unpivot_measures" -> oracle("unpivot_measures"),
    "embedding_norms" -> oracle("embedding_norms"),
    "strings_norm" -> oracle("strings_norm"),
    // similarity_ann / similarity_ivf: the ANN pipelines are approximate
    // vs brute force but DETERMINISTIC functions of the data (md5-derived
    // hyperplanes / stride-sampled centroids), so the oracles replay the
    // full algorithm — candidate generation included — in SQL. Params
    // mirror the queries above: nBits=64, dim=64, bands=16 (4 bits/band),
    // centroidStride=20, nProbe=8, k=5, queries = vec_id % 20 = 0.
    "similarity_ann" ->
      s"""WITH $annCtesSql,
        |cands AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM cb q JOIN cb c ON q.bucket = c.bucket
        |  WHERE q.vec_id % 20 = 0 AND c.vec_id <> q.vec_id),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         list_dot_product(cn.dv, qn.dv) / (cn.nm * qn.nm) AS sim
        |  FROM cands
        |  JOIN n cn ON cn.vec_id = neighbor_id
        |  JOIN n qn ON qn.vec_id = query_id),
        |r AS (SELECT query_id, neighbor_id, sim,
        |             row_number() OVER (PARTITION BY query_id
        |                                ORDER BY sim DESC, neighbor_id) AS rank
        |      FROM scored)
        |SELECT query_id, neighbor_id, rank, round(sim, 4) AS sim
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // replay BOTH top-5 pipelines (brute force, identical to the
    // similarity_topk oracle; ANN, identical to the similarity_ann
    // oracle) and intersect per query in integer counts
    "similarity_recall" ->
      s"""WITH $annCtesSql,
        |acands AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM cb q JOIN cb c ON q.bucket = c.bucket
        |  WHERE q.vec_id % 20 = 0 AND c.vec_id <> q.vec_id),
        |ascored AS (
        |  SELECT query_id, neighbor_id,
        |         list_dot_product(cn.dv, qn.dv) / (cn.nm * qn.nm) AS sim
        |  FROM acands
        |  JOIN n cn ON cn.vec_id = neighbor_id
        |  JOIN n qn ON qn.vec_id = query_id),
        |ar AS (SELECT query_id, neighbor_id,
        |              row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY sim DESC, neighbor_id) AS rank
        |       FROM ascored),
        |ann AS (SELECT query_id, neighbor_id FROM ar WHERE rank <= 5),
        |escored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         list_cosine_similarity(c.dv, q.dv) AS sim
        |  FROM v c, v q
        |  WHERE q.vec_id % 20 = 0 AND c.vec_id <> q.vec_id),
        |er AS (SELECT query_id, neighbor_id,
        |              row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY sim DESC, neighbor_id) AS rank
        |       FROM escored),
        |ex AS (SELECT query_id, neighbor_id FROM er WHERE rank <= 5)
        |SELECT ex.query_id AS query_id, count(ann.neighbor_id) AS n_overlap,
        |       count(*) AS k
        |FROM ex LEFT JOIN ann ON ex.query_id = ann.query_id
        |                     AND ex.neighbor_id = ann.neighbor_id
        |GROUP BY ex.query_id ORDER BY ex.query_id""".stripMargin,
    "similarity_ivf" -> oracle("similarity_ivf"),
    // the persisted-index serving path answers EXACTLY the one-shot
    // IVF query — one oracle file for all three spellings (one-shot,
    // build-then-query, build-append-query)
    "similarity_indexed" -> oracle("similarity_ivf"),
    "similarity_indexed_incremental" -> oracle("similarity_ivf"),
    "similarity_ivfpq" -> oracle("similarity_ivfpq"),

    // Funnel replay: the same chained conditional cumulative mins — step
    // i's earliest in-order completion as of each row, reduced per user,
    // then counted per step.
    "event_funnel" -> oracle("event_funnel"),

    "retention_cohorts" -> oracle("retention_cohorts"),

    // The naive global row_number the two-pass bucketed rank must equal.
    "shuffle_order" -> oracle("shuffle_order"),

    "quality_filter" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, len(toks) AS n_tokens,
         |             CASE WHEN len(toks) > 0 THEN
         |               len(list_filter(toks, x -> x IN ($enStopSql)))::DOUBLE
         |                 / len(toks)
         |             ELSE 0.0 END AS stop_raw
         |      FROM t)
         |SELECT doc_id, n_tokens,
         |       n_tokens < 25 AS too_short,
         |       n_tokens > 90 AS too_long,
         |       stop_raw < 0.02 AS low_stopword,
         |       NOT (n_tokens < 25 OR n_tokens > 90 OR stop_raw < 0.02) AS keep
         |FROM s ORDER BY doc_id""".stripMargin,

    "pii_scrub" -> oracle("pii_scrub"),

    // the full curation chain replayed in one CTE pipeline: quality
    // keep → digit-run scrub → exact-Jaccard pairs + 4-round components
    // over the SCRUBBED text → longest-survivor per cluster → binding-
    // constraint domain mix → serial running-sum pack (the distributed
    // pack is pinned equal to the serial form by pack_shards_dist)
    "curate_corpus" ->
      s"""WITH w(g, wt) AS (VALUES
         |       ('src0', CAST(0.5 AS DOUBLE)), ('src1', CAST(0.25 AS DOUBLE)),
         |       ('src2', CAST(0.125 AS DOUBLE)), ('src3', CAST(0.125 AS DOUBLE))),
         |strip AS (SELECT doc_id, lang, source, n_chars,
         |                 ${stripHtmlSql("text")} AS text
         |          FROM documents),
         |t0 AS (SELECT doc_id, lang, source, n_chars, text, $toksSql AS toks0
         |       FROM strip),
         |q AS (SELECT doc_id, lang, source, n_chars, text, len(toks0) AS nt,
         |             CASE WHEN len(toks0) > 0 THEN
         |               len(list_filter(toks0, x -> x IN ($enStopSql)))::DOUBLE
         |                 / len(toks0)
         |             ELSE 0.0 END AS stop_raw,
         |             len(list_filter(list_distinct(toks0),
         |               x -> list_contains(['spam', 'viagra', 'casino'], x)))
         |               AS block_hits
         |      FROM t0),
         |kept AS (SELECT doc_id, lang, source, n_chars,
         |                regexp_replace(text, '[0-9]+', '#', 'g') AS text
         |         FROM q
         |         WHERE NOT (nt < 25 OR nt > 90 OR stop_raw < 0.02)
         |           AND block_hits = 0),
         |${componentsCtesFrom(4, "kept")},
         |lab AS (SELECT k.doc_id, k.lang, k.source, k.n_chars, k.text,
         |               coalesce(l.label, k.doc_id) AS comp
         |        FROM kept k LEFT JOIN l4 l ON l.id = k.doc_id),
         |rnked AS (SELECT *, row_number() OVER (PARTITION BY comp
         |            ORDER BY n_chars DESC, doc_id) AS rnk FROM lab),
         |surv AS (SELECT doc_id, lang, source, text FROM rnked WHERE rnk = 1),
         |md AS (SELECT s.doc_id, s.lang, s.source, s.text, w.wt,
         |              md5(CAST(s.doc_id AS VARCHAR) || ':curate1') AS key
         |       FROM surv s JOIN w ON s.source = w.g),
         |tgt AS (SELECT source,
         |               CAST(floor(min(CAST(ng AS DOUBLE) / wt) OVER () * wt)
         |                 AS BIGINT) AS target
         |        FROM (SELECT source, wt, count(*) AS ng FROM md GROUP BY 1, 2)),
         |mr AS (SELECT doc_id, lang, source, text,
         |              row_number() OVER (PARTITION BY source
         |                                 ORDER BY key, doc_id) AS mix_rank
         |       FROM md),
         |mixed AS (SELECT mr.doc_id, mr.lang, mr.text FROM mr
         |          JOIN tgt USING (source) WHERE mix_rank <= target),
         |sized AS (SELECT doc_id, lang, len($toksSql) AS n_tokens FROM mixed),
         |cw AS (SELECT doc_id, lang, n_tokens,
         |              sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
         |       FROM sized)
         |SELECT lang, CAST(floor((c - n_tokens) / 512) AS BIGINT) AS shard,
         |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM cw GROUP BY lang, shard ORDER BY lang, shard""".stripMargin,

    // greedy longest-match wordpiece replayed as a bounded recursive
    // walk: best = the longest vocab piece per (word, position); walk
    // hops pos -> pos + len(best) collecting pieces, a dead position
    // voids the word to [UNK]; distinct words tokenize once
    "tokenize_subword" ->
      s"""WITH RECURSIVE $subwordCtesSql
         |SELECT d.doc_id AS doc_id, coalesce(ag.n_words, 0) AS n_words,
         |       coalesce(ag.n_pieces, 0) AS n_pieces,
         |       coalesce(ag.n_unk_words, 0) AS n_unk_words
         |FROM documents d LEFT JOIN ag ON ag.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // same greedy-wordpiece CTE block as tokenize_subword (shared vocab
    // VALUES), then packShardsSql's cumulative layout over the PIECE
    // counts at capacity 1024 — the subword-budget packing variant
    "pack_shards_subword" ->
      s"""WITH RECURSIVE $subwordCtesSql,
         |dc AS (SELECT d.doc_id, d.lang,
         |              coalesce(ag.n_pieces, 0) AS n_tokens
         |       FROM documents d LEFT JOIN ag ON ag.doc_id = d.doc_id),
         |c AS (SELECT doc_id, lang, n_tokens,
         |             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM dc)
         |SELECT lang, CAST(floor((cum - n_tokens) / 1024) AS BIGINT) AS shard,
         |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY lang, shard ORDER BY lang, shard""".stripMargin,

    "vocab_stats" ->
      s"""WITH t AS (SELECT lang, $toksSql AS toks FROM documents),
         |o AS (SELECT lang, unnest(toks) AS tok FROM t),
         |c AS (SELECT lang, tok, count(*) AS occ FROM o GROUP BY 1, 2)
         |SELECT lang, CAST(sum(occ) AS BIGINT) AS n_tokens,
         |       count(*) AS n_types,
         |       count(*) FILTER (WHERE occ = 1) AS n_hapax,
         |       round(count(*)::DOUBLE / sum(occ), 4) AS type_token_ratio
         |FROM c GROUP BY lang ORDER BY lang""".stripMargin
  )
}
