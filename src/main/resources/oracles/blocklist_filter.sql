-- oracle for blocklist_filter: the C4-style any-hit-drops blocklist
-- gate replayed on the SAME normalized tokens (lower, non-letter/digit
-- runs to single spaces, split, non-empty) with the same 3-word list.
WITH t AS (
  SELECT doc_id,
         list_filter(
           string_split(lower(regexp_replace(text,
             '[^\p{L}\p{N}]+', ' ', 'g')), ' '),
           x -> x <> '') AS toks
  FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_words,
       CAST(len(list_filter(toks,
         x -> list_contains(['slow', 'crash', 'spam'], x))) AS BIGINT)
         AS n_bad,
       CAST(len(list_intersect(list_distinct(toks),
         ['slow', 'crash', 'spam'])) AS BIGINT) AS n_bad_distinct,
       CAST(CASE WHEN len(list_filter(toks,
         x -> list_contains(['slow', 'crash', 'spam'], x))) = 0
         THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM t ORDER BY doc_id
