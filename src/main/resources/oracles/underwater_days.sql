WITH bars AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS date,
         arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2, 3),
p AS (SELECT user_id, event_type, date, close,
             max(close) OVER cum AS peak
      FROM bars
      WINDOW cum AS (PARTITION BY user_id, event_type ORDER BY date
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
q AS (SELECT user_id, event_type, date, close,
             max(CASE WHEN close = peak THEN date END) OVER cum
               AS peak_date
      FROM p
      WINDOW cum AS (PARTITION BY user_id, event_type ORDER BY date
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT user_id, event_type, date, close,
       CAST(date_diff('day', peak_date, date) AS BIGINT)
         AS underwater_days
FROM q ORDER BY user_id, event_type, date