SELECT doc_id,
       row_number() OVER (ORDER BY md5(doc_id::VARCHAR || ':r6'),
                          doc_id) AS pos
FROM documents ORDER BY doc_id