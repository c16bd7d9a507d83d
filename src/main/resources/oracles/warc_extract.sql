-- oracle for warc_extract: the WARC reader streams a synthetic crawl
-- built from the documents table (one HTTP response record per doc,
-- one gzip member per record) and must recover every record's exact
-- bytes — Content-Length equals the reconstructed HTTP payload's
-- byte length and the md5 of the HTTP-split body equals the md5 of
-- the original HTML string. Any lost/altered byte in container
-- parsing, member splitting, or the HTTP split fails the hash.
WITH r AS (
  SELECT 'https://example.org/' || source || '/' || doc_id AS target_uri,
         '<html><head><title>doc-' || doc_id || '</title></head>' ||
         '<body><p>' || text || '</p></body></html>' AS html
  FROM documents)
SELECT target_uri,
       octet_length(encode(
         e'HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n'
         || html)) AS content_length,
       md5(html) AS body_md5
FROM r
ORDER BY target_uri
