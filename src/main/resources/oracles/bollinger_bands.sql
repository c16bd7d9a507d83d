WITH bars AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS date,
         arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2, 3),
c AS (SELECT user_id, event_type, date, close,
             CAST(CAST(close AS DECIMAL(18,6)) * 1000000
                  AS DECIMAL(13,0)) AS cu
      FROM bars),
s AS (SELECT user_id, event_type, date, close,
             count(*) OVER t AS n,
             sum(cu) OVER t AS sc,
             sum(CAST(cu * cu AS DECIMAL(30,0))) OVER t AS sc2
      FROM c
      WINDOW t AS (PARTITION BY user_id, event_type ORDER BY date
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
SELECT user_id, event_type, date, close,
       round(CASE WHEN n = 20
                  THEN CAST(sc AS DOUBLE) / n / 1e6 END, 4) AS bb_mid,
       round(CASE WHEN n = 20
                  THEN CAST(sc AS DOUBLE) / n / 1e6
                       + 2 * (sqrt(CAST(CAST(n AS HUGEINT) * CAST(sc2 AS HUGEINT)
                                        - CAST(sc AS HUGEINT) * CAST(sc AS HUGEINT) AS DOUBLE)
                                   / CAST(n * (n - 1) AS DOUBLE)) / 1e6)
                  END, 4) AS bb_upper,
       round(CASE WHEN n = 20
                  THEN CAST(sc AS DOUBLE) / n / 1e6
                       - 2 * (sqrt(CAST(CAST(n AS HUGEINT) * CAST(sc2 AS HUGEINT)
                                        - CAST(sc AS HUGEINT) * CAST(sc AS HUGEINT) AS DOUBLE)
                                   / CAST(n * (n - 1) AS DOUBLE)) / 1e6)
                  END, 4) AS bb_lower
FROM s ORDER BY user_id, event_type, date