WITH bars AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS date,
         max(value) AS high, min(value) AS low,
         arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2, 3),
c AS (SELECT user_id, event_type, date, close,
             CAST(close AS DECIMAL(18,6)) AS cu,
             max(CAST(high AS DECIMAL(18,6))) OVER t AS h14,
             min(CAST(low AS DECIMAL(18,6))) OVER t AS l14,
             count(*) OVER t AS n
      FROM bars
      WINDOW t AS (PARTITION BY user_id, event_type ORDER BY date
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
SELECT user_id, event_type, date, close,
       CASE WHEN n = 14 AND h14 <> l14
            THEN 100.0 * (CAST(cu - l14 AS DOUBLE)
                          / CAST(h14 - l14 AS DOUBLE))
       END AS stoch_k,
       CASE WHEN n = 14 AND h14 <> l14
            THEN -100.0 * (CAST(h14 - cu AS DOUBLE)
                           / CAST(h14 - l14 AS DOUBLE))
       END AS williams_r
FROM c ORDER BY user_id, event_type, date