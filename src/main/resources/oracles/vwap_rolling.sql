WITH bars AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS date,
         arg_max(value, event_id) AS close, count(*) AS volume
  FROM events GROUP BY 1, 2, 3),
v AS (SELECT user_id, event_type, date, close,
             sum(CAST(CAST(CAST(close AS DECIMAL(18,6)) * 1000000
                           AS DECIMAL(13,0)) * volume
                      AS DECIMAL(30,0))) OVER t AS pvs,
             sum(volume) OVER t AS vs
      FROM bars
      WINDOW t AS (PARTITION BY user_id, event_type ORDER BY date
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
SELECT user_id, event_type, date, close,
       CAST(pvs AS DOUBLE) / CAST(vs AS DOUBLE) / 1e6 AS vwap_20
FROM v ORDER BY user_id, event_type, date