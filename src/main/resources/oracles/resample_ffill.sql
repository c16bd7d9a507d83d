WITH b AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS date,
         arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2, 3),
r AS (SELECT user_id, event_type, min(date) AS d0, max(date) AS d1
      FROM b GROUP BY 1, 2),
spine AS (
  SELECT user_id, event_type,
         unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS date
  FROM r),
j AS (
  SELECT s.user_id, s.event_type, s.date, b.close,
         b.close IS NOT NULL AS observed
  FROM spine s LEFT JOIN b
    ON s.user_id = b.user_id AND s.event_type = b.event_type
   AND s.date = b.date)
SELECT user_id, event_type, date,
       round(last_value(close IGNORE NULLS) OVER (
         PARTITION BY user_id, event_type ORDER BY date
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS close,
       observed
FROM j ORDER BY user_id, event_type, date