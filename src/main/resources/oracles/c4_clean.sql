-- oracle for c4_clean: C4's line-level cleaning replayed with DuckDB
-- list functions over the same trimmed non-blank lines — a kept line
-- ends in terminal punctuation, carries >= 3 whitespace words and
-- does not mention javascript; the doc drops on lorem ipsum, a curly
-- brace, or < 5 sentences (terminal marks) in the cleaned text.
WITH t AS (
  SELECT doc_id, text,
         list_filter(list_transform(string_split(text, chr(10)),
                                    l -> trim(l)),
                     l -> l <> '') AS lines
  FROM documents),
k AS (
  SELECT doc_id, text, lines,
         list_filter(lines, l ->
           (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?')
              OR ends_with(l, '"'))
           AND len(list_filter(regexp_split_to_array(l, '\s+'),
                               w -> w <> '')) >= 3
           AND NOT contains(lower(l), 'javascript')) AS kept_lines
  FROM t),
m AS (
  SELECT doc_id,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(kept_lines) AS BIGINT) AS n_kept_lines,
         COALESCE(array_to_string(kept_lines, chr(10)), '') AS cleaned,
         CAST(CASE WHEN contains(lower(text), 'lorem ipsum')
                   THEN 1 ELSE 0 END AS BIGINT) AS has_lorem,
         CAST(CASE WHEN contains(text, '{') THEN 1 ELSE 0 END AS BIGINT)
           AS has_brace
  FROM k)
SELECT doc_id, n_lines, n_kept_lines,
       CAST(length(cleaned) -
            length(replace(replace(replace(cleaned, '.', ''),
                                   '!', ''), '?', '')) AS BIGINT)
         AS n_sentences,
       has_lorem, has_brace,
       CAST(length(cleaned) AS BIGINT) AS cleaned_chars,
       CAST(CASE WHEN has_lorem = 0 AND has_brace = 0
                  AND length(cleaned) -
                      length(replace(replace(replace(cleaned, '.', ''),
                                             '!', ''), '?', '')) >= 5
             THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM m ORDER BY doc_id
