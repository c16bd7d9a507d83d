SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM documents
WHERE substr(md5(doc_id::VARCHAR), 1, 4) <
      (CASE WHEN lang = 'en' THEN '4000' ELSE 'g' END)
GROUP BY lang ORDER BY lang