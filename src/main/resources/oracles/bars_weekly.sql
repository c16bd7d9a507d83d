WITH bars AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS date,
         arg_min(value, event_id) AS open, max(value) AS high,
         min(value) AS low, arg_max(value, event_id) AS close,
         count(*) AS volume
  FROM events GROUP BY 1, 2, 3)
SELECT user_id, event_type,
       CAST(date_trunc('week', date) AS DATE) AS week,
       arg_min(open, date) AS open, max(high) AS high,
       min(low) AS low, arg_max(close, date) AS close,
       CAST(sum(volume) AS BIGINT) AS volume
FROM bars GROUP BY 1, 2, 3
ORDER BY user_id, event_type, week