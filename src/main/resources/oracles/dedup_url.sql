-- oracle for dedup_url: the synthetic crawl writes each document
-- 1 + doc_id % 3 times under variant spellings of ONE logical URL
-- (http/https in mixed case, host case permuted, query parameters
-- reordered, a fragment appended). URL-level dedup must collapse the
-- variants to the canonical form — scheme stripped, fragment dropped,
-- host lowercased, query sorted — keep the FIRST capture (the ' v0'
-- payload: variants are written in order within one gzip member
-- sequence), and count the copies.
WITH d AS (
  SELECT doc_id, source, text,
         doc_id % 5 AS qa,
         1 + doc_id % 3 AS copies
  FROM documents)
SELECT 'example.org/' || source || '/' || doc_id
         || '?a=' || qa || '&b=2' AS canonical_url,
       copies AS url_copies,
       octet_length(encode(text || ' v0')) AS content_length,
       md5(text || ' v0') AS body_md5
FROM d
ORDER BY canonical_url
