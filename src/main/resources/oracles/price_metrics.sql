WITH bars AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS date,
         arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2, 3),
m AS (
  SELECT user_id, event_type, date, close,
         lag(close) OVER w AS prev_close,
         max(close) OVER (PARTITION BY user_id, event_type ORDER BY date
                          ROWS UNBOUNDED PRECEDING) AS peak
  FROM bars
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY date))
SELECT user_id, event_type, date, close,
       round((close / nullif(prev_close, 0) - 1) * 10000, 4) AS ret_bps,
       round((close / nullif(peak, 0) - 1) * 10000, 4) AS drawdown_bps
FROM m ORDER BY user_id, event_type, date