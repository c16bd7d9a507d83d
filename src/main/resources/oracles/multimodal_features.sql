SELECT doc_id, 'text' AS modality,
       octet_length(encode(text)) AS byte_len,
       md5(text) AS content_hash
FROM documents ORDER BY doc_id