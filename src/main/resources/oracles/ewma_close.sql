WITH bars AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS date,
         arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2, 3),
wf AS (
  SELECT user_id, event_type, date,
         list(close) OVER (PARTITION BY user_id, event_type ORDER BY date
                           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS c
  FROM bars)
SELECT user_id, event_type, date,
       round(list_reduce([c[i] * CAST((1::BIGINT << (i - 1)) AS DOUBLE)
                          for i in range(1, len(c) + 1)],
                         (a, v) -> a + v)
             / CAST((1::BIGINT << len(c)) - 1 AS DOUBLE), 4) AS ewma_close
FROM wf ORDER BY user_id, event_type, date