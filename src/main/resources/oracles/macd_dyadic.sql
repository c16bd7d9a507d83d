WITH bars AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS date,
         arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2, 3),
wf AS (
  SELECT user_id, event_type, date, close,
         list(close) OVER (PARTITION BY user_id, event_type ORDER BY date
                           ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS cf,
         list(close) OVER (PARTITION BY user_id, event_type ORDER BY date
                           ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS cs
  FROM bars)
SELECT user_id, event_type, date, close,
       list_reduce([cf[i] * CAST((1::BIGINT << (i - 1)) AS DOUBLE)
                    for i in range(1, len(cf) + 1)],
                   (a, v) -> a + v)
         / CAST((1::BIGINT << len(cf)) - 1 AS DOUBLE)
       - list_reduce([cs[i] * CAST((1::BIGINT << (i - 1)) AS DOUBLE)
                      for i in range(1, len(cs) + 1)],
                     (a, v) -> a + v)
         / CAST((1::BIGINT << len(cs)) - 1 AS DOUBLE) AS macd
FROM wf ORDER BY user_id, event_type, date