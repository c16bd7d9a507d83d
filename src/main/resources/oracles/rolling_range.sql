WITH b AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS date,
         arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2, 3)
SELECT user_id, event_type, date,
       count(*) OVER w AS n_in_range,
       round(avg(close) OVER w, 4) AS avg_in_range,
       round(max(close) OVER w, 4) AS max_in_range
FROM b
WINDOW w AS (PARTITION BY user_id, event_type ORDER BY date
             RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_type, date