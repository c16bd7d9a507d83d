SELECT lang, source,
       CAST(GROUPING(lang, source) AS BIGINT) AS gid,
       count(*) AS n_docs,
       round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY CUBE(lang, source)
ORDER BY lang NULLS FIRST, source NULLS FIRST, gid