WITH v AS (SELECT DISTINCT p_name AS s FROM part),
k AS (SELECT DISTINCT s,
             unnest([string_split(s, ' ')[1], string_split(s, ' ')[-1]]) AS bk
      FROM v),
p AS (SELECT DISTINCT a.s AS s_a, b.s AS s_b
      FROM k a JOIN k b USING (bk) WHERE a.s < b.s)
SELECT s_a, s_b, CAST(levenshtein(s_a, s_b) AS INT) AS dist
FROM p WHERE levenshtein(s_a, s_b) <= 4
ORDER BY s_a, s_b