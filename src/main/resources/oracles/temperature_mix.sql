WITH c AS (SELECT lang AS g, count(*) AS ng FROM documents GROUP BY 1),
w AS (SELECT g, ng, sqrt(CAST(ng AS DOUBLE)) AS wt FROM c),
d AS (SELECT doc_id, lang,
             md5(CAST(doc_id AS VARCHAR) || ':temp1') AS key
      FROM documents),
t AS (SELECT g AS lang,
             CAST(floor(min(CAST(ng AS DOUBLE) / wt) OVER () * wt) AS BIGINT) AS target
      FROM w),
r AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY key, doc_id) AS mix_rank
      FROM d)
SELECT r.doc_id, r.lang, mix_rank FROM r JOIN t USING (lang)
WHERE mix_rank <= target ORDER BY doc_id