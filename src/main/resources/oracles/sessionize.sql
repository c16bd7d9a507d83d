WITH e AS (
  SELECT user_id, ts, event_id, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
b AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN prev_ts IS NULL THEN 0
              WHEN epoch_ms(ts) - epoch_ms(prev_ts) >= 1800000 THEN 1
              ELSE 0 END AS boundary
  FROM e),
s AS (
  SELECT user_id, ts, value,
         CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM b)
SELECT user_id, session_id, count(*) AS n_events,
       epoch_ms(max(ts)) - epoch_ms(min(ts)) AS span_ms,
       CAST(round(sum(CAST(value AS DECIMAL(24,6))), 4) AS DOUBLE) AS value_sum
FROM s GROUP BY user_id, session_id
ORDER BY user_id, session_id