WITH bars AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS date
  FROM events GROUP BY 1, 2, 3),
g AS (SELECT user_id, event_type, date,
             lag(date) OVER (PARTITION BY user_id, event_type
                             ORDER BY date) AS prev_date
      FROM bars)
SELECT user_id, event_type, prev_date AS gap_start,
       date AS gap_end,
       CAST(date_diff('day', prev_date, date) - 1 AS BIGINT)
         AS gap_days
FROM g WHERE date_diff('day', prev_date, date) > 1
ORDER BY user_id, event_type, gap_start