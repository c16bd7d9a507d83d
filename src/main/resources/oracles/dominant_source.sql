WITH c AS (SELECT lang, source, count(*) AS n_docs
           FROM documents GROUP BY 1, 2),
r AS (SELECT lang, source, n_docs,
             sum(n_docs) OVER (PARTITION BY lang) AS lang_total,
             row_number() OVER (PARTITION BY lang
               ORDER BY n_docs DESC, source) AS rn
      FROM c)
SELECT lang, source AS top_source, n_docs,
       CAST(n_docs * 10000 // lang_total AS BIGINT) AS share_bps
FROM r WHERE rn = 1 ORDER BY lang