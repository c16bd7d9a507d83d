WITH bars AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS date,
         arg_min(value, event_id) AS open, max(value) AS high,
         min(value) AS low, arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2, 3)
SELECT user_id, event_type, date, field, price FROM (
  SELECT user_id, event_type, date, 'open' AS field, open AS price
  FROM bars
  UNION ALL
  SELECT user_id, event_type, date, 'high', high FROM bars
  UNION ALL
  SELECT user_id, event_type, date, 'low', low FROM bars
  UNION ALL
  SELECT user_id, event_type, date, 'close', close FROM bars)
ORDER BY user_id, event_type, date, field