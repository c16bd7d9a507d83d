SELECT lang, source, count(*) AS n_docs,
       round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY ROLLUP(lang, source)
ORDER BY lang NULLS FIRST, source NULLS FIRST