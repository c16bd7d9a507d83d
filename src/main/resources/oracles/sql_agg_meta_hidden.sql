-- oracle for sql_agg_meta_hidden: the statement door folds this from
-- the hidden-partitioned table's _stats sidecars (the day-aligned
-- bounds decide every days(ts) partition exactly; StatsAggSpec pins
-- the zero-data-files plan); DuckDB recomputes it from the raw rows.
-- sum(BIGINT) is HUGEINT in DuckDB: cast back to BIGINT so the
-- pandas-rendered cell matches Spark's int64 (the r3 float-render trap)
SELECT count(*) AS n_rows, count(event_id) AS n_ids,
       min(event_id) AS min_id, max(event_id) AS max_id,
       CAST(sum(event_id) AS BIGINT) AS sum_id
FROM events
WHERE ts >= TIMESTAMP '2024-01-04 00:00:00'
  AND ts < TIMESTAMP '2024-01-09 00:00:00'
