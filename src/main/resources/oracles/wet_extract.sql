-- oracle for wet_extract: the WET (extracted-text conversion records)
-- read-back must round-trip the documents table byte-exactly — text
-- byte length and md5 straight off the source rows.
SELECT 'https://example.org/' || source || '/' || doc_id AS target_uri,
       octet_length(encode(text)) AS text_bytes,
       md5(text) AS text_md5
FROM documents
ORDER BY target_uri
