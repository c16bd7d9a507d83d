SELECT source, round(de, 4) AS de, round(en, 4) AS en,
       round(es, 4) AS es, round(fr, 4) AS fr, round(zh, 4) AS zh
FROM (PIVOT (SELECT source, lang, n_chars FROM documents)
      ON lang IN ('de', 'en', 'es', 'fr', 'zh')
      USING avg(n_chars) GROUP BY source)
ORDER BY source