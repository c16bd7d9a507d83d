-- oracle for gopher_rules: every Gopher A1.1 measure replayed with
-- DuckDB list functions on the same whitespace tokens and trimmed
-- non-blank lines; all measures exact integers so no float division
-- can flip the keep bit between engines.
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\s+'),
                     x -> x <> '') AS toks,
         list_filter(list_transform(string_split(text, chr(10)),
                                    l -> trim(l)),
                     l -> l <> '') AS lines
  FROM documents),
m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         COALESCE(list_sum(list_transform(toks, x -> length(x))), 0)
           AS sum_len,
         length(text) -
           length(replace(replace(text, '#', ''), '…', '')) AS n_sym,
         len(lines) AS n_lines,
         len(list_filter(lines, l -> starts_with(l, '•')
               OR starts_with(l, '- ') OR starts_with(l, '* ')))
           AS n_bullet,
         len(list_filter(lines, l -> ends_with(l, '…')
               OR ends_with(l, '...'))) AS n_ell,
         len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
           AS n_alpha,
         len(list_intersect(
               list_distinct(list_transform(toks, x -> lower(x))),
               ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']))
           AS stop_hits
  FROM t),
r AS (
  SELECT doc_id,
         CAST(n_words AS BIGINT) AS n_words,
         CAST((100 * sum_len) // greatest(n_words, 1) AS BIGINT)
           AS mean_len_centi,
         CAST((10000 * n_sym) // greatest(n_words, 1) AS BIGINT)
           AS symbol_bps,
         CAST((10000 * n_bullet) // greatest(n_lines, 1) AS BIGINT)
           AS bullet_bps,
         CAST((10000 * n_ell) // greatest(n_lines, 1) AS BIGINT)
           AS ellipsis_bps,
         CAST((10000 * n_alpha) // greatest(n_words, 1) AS BIGINT)
           AS alpha_bps,
         CAST(stop_hits AS BIGINT) AS stop_hits
  FROM m)
SELECT doc_id, n_words, mean_len_centi, symbol_bps, bullet_bps,
       ellipsis_bps, alpha_bps, stop_hits,
       CAST((CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END) +
            (CASE WHEN mean_len_centi BETWEEN 300 AND 1000 THEN 1 ELSE 0 END) +
            (CASE WHEN symbol_bps <= 1000 THEN 1 ELSE 0 END) +
            (CASE WHEN bullet_bps <= 9000 THEN 1 ELSE 0 END) +
            (CASE WHEN ellipsis_bps <= 3000 THEN 1 ELSE 0 END) +
            (CASE WHEN alpha_bps >= 8000 THEN 1 ELSE 0 END) +
            (CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS rules_passed,
       CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                  AND mean_len_centi BETWEEN 300 AND 1000
                  AND symbol_bps <= 1000
                  AND bullet_bps <= 9000
                  AND ellipsis_bps <= 3000
                  AND alpha_bps >= 8000
                  AND stop_hits >= 2
             THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM r ORDER BY doc_id
