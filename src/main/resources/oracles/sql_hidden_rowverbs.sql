-- oracle for sql_hidden_rowverbs: replay the routed row-verb sequence
-- over the hidden-partitioned table in set SQL — load days 01..14,
-- DELETE the 'error' rows, UPDATE user_id (+1) for rows before
-- 2024-01-04, then the range aggregate the routed SELECT computes.
WITH base AS (
  SELECT event_id, ts, user_id, event_type
  FROM events
  WHERE ts < TIMESTAMP '2024-01-15 00:00:00'),
after_del AS (
  SELECT * FROM base WHERE event_type <> 'error'),
after_upd AS (
  SELECT event_id, ts,
         CASE WHEN ts < TIMESTAMP '2024-01-04 00:00:00'
              THEN user_id + 1 ELSE user_id END AS user_id,
         event_type
  FROM after_del)
SELECT event_type, count(*) AS n_events,
       CAST(SUM(user_id) AS BIGINT) AS user_sum
FROM after_upd
WHERE ts BETWEEN TIMESTAMP '2024-01-02 00:00:00'
          AND TIMESTAMP '2024-01-08 23:59:59.999999'
GROUP BY event_type ORDER BY event_type
