WITH bars AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS date,
         arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2, 3),
d AS (SELECT user_id, event_type, date, close,
             CAST(close AS DECIMAL(18,6))
               - lag(CAST(close AS DECIMAL(18,6))) OVER w AS delta
      FROM bars
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY date)),
r AS (SELECT user_id, event_type, date, close,
             sum(CASE WHEN delta > 0 THEN delta
                      ELSE CAST(0 AS DECIMAL(18,6)) END) OVER t AS gsum,
             sum(CASE WHEN delta < 0 THEN -delta
                      ELSE CAST(0 AS DECIMAL(18,6)) END) OVER t AS lsum,
             count(delta) OVER t AS nd
      FROM d
      WINDOW t AS (PARTITION BY user_id, event_type ORDER BY date
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
SELECT user_id, event_type, date, close,
       round(CASE WHEN nd = 14 AND gsum + lsum <> 0
                  THEN 100.0 * CAST(gsum AS DOUBLE)
                       / CAST(gsum + lsum AS DOUBLE) END, 4) AS rsi_14
FROM r ORDER BY user_id, event_type, date