-- oracle for versioned_shred: the shredded-column range read (file-
-- skipped on props_k's _stats sidecars, VersionedSpec pins the skip)
-- must equal this from-scratch JSON recompute of the same range.
-- Sums cast back from DuckDB's HUGEINT.
WITH e AS (
  SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k
  FROM events)
SELECT event_type, count(*) AS n_rows,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM e
WHERE k BETWEEN 10 AND 39
GROUP BY event_type
ORDER BY event_type
