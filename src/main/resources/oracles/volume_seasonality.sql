WITH bars AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS date,
         count(*) AS volume
  FROM events GROUP BY 1, 2, 3),
g AS (SELECT event_type, CAST(isodow(date) AS INT) AS isodow,
             count(*) AS n_days,
             CAST(sum(volume) AS BIGINT) AS total_vol
      FROM bars GROUP BY 1, 2),
w AS (SELECT *, sum(total_vol) OVER (PARTITION BY event_type)
               AS wk_vol
      FROM g)
SELECT event_type, isodow, n_days, total_vol,
       CAST(total_vol AS DOUBLE) / CAST(n_days AS DOUBLE) AS avg_vol,
       CAST(total_vol AS DOUBLE) / CAST(wk_vol AS DOUBLE) AS vol_share
FROM w ORDER BY event_type, isodow