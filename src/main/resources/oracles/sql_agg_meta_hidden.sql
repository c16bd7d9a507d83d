-- oracle for sql_agg_meta_hidden: the statement door folds this from
-- the hidden-partitioned table's _stats sidecars (the day-aligned
-- bounds decide every days(ts) partition exactly; StatsAggSpec pins
-- the zero-data-files plan); DuckDB recomputes it from the raw rows.
SELECT count(*) AS n_rows, count(event_id) AS n_ids,
       min(event_id) AS min_id, max(event_id) AS max_id,
       sum(event_id) AS sum_id
FROM events
WHERE ts >= TIMESTAMP '2024-01-04 00:00:00'
  AND ts < TIMESTAMP '2024-01-09 00:00:00'
