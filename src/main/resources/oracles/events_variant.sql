-- oracle for events_variant: the variant path extraction
-- (parse_json -> variant_get '$.k' as BIGINT) must agree with a plain
-- JSON extraction recompute. Sums cast back from DuckDB's HUGEINT.
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
       max(CAST(props->>'$.k' AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
