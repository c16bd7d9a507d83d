SELECT min(doc_id) AS doc_id, text FROM documents
GROUP BY text ORDER BY doc_id