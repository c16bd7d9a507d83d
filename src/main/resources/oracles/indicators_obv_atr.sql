WITH bars AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS date,
         max(value) AS high, min(value) AS low,
         arg_max(value, event_id) AS close,
         count(*) AS volume
  FROM events GROUP BY 1, 2, 3),
d AS (SELECT user_id, event_type, date, close, volume,
             CAST(close AS DECIMAL(18,6)) AS c,
             CAST(high AS DECIMAL(18,6)) AS h,
             CAST(low AS DECIMAL(18,6)) AS l,
             lag(CAST(close AS DECIMAL(18,6))) OVER w AS pc
      FROM bars
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY date)),
e AS (SELECT *,
             CASE WHEN pc IS NULL THEN CAST(0 AS BIGINT)
                  WHEN c > pc THEN CAST(1 AS BIGINT)
                  WHEN c < pc THEN CAST(-1 AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS sgn,
             CASE WHEN pc IS NULL THEN h - l
                  ELSE greatest(h - l, abs(h - pc), abs(l - pc))
                  END AS tr
      FROM d),
f AS (SELECT user_id, event_type, date, close,
             CAST(sum(sgn * volume) OVER cum AS BIGINT) AS obv,
             count(tr) OVER t AS n,
             sum(tr) OVER t AS trs
      FROM e
      WINDOW cum AS (PARTITION BY user_id, event_type ORDER BY date
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             t AS (PARTITION BY user_id, event_type ORDER BY date
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
SELECT user_id, event_type, date, close, obv,
       round(CASE WHEN n = 14
                  THEN CAST(trs AS DOUBLE) / n END, 4) AS atr_14
FROM f ORDER BY user_id, event_type, date