WITH bars AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS date,
         arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2, 3),
c AS (SELECT user_id, event_type, date,
             CAST(CAST(close AS DECIMAL(18,6)) * 1000000
                  AS DECIMAL(13,0)) AS cu
      FROM bars),
d AS (SELECT user_id, event_type, date,
             CAST(cu - lag(cu) OVER (PARTITION BY user_id, event_type
                                     ORDER BY date)
                  AS DECIMAL(14,0)) AS dd
      FROM c),
e AS (SELECT * FROM d WHERE dd IS NOT NULL),
p AS (SELECT a.user_id, a.event_type AS et_a, b.event_type AS et_b,
             count(*) AS np,
             CAST(sum(a.dd) AS DECIMAL(25,0)) AS sx,
             CAST(sum(b.dd) AS DECIMAL(25,0)) AS sy,
             CAST(sum(CAST(a.dd * a.dd AS DECIMAL(30,0)))
                  AS DECIMAL(30,0)) AS sxx,
             CAST(sum(CAST(b.dd * b.dd AS DECIMAL(30,0)))
                  AS DECIMAL(30,0)) AS syy,
             CAST(sum(CAST(a.dd * b.dd AS DECIMAL(30,0)))
                  AS DECIMAL(30,0)) AS sxy
      FROM e a JOIN e b
        ON a.user_id = b.user_id AND a.date = b.date
       AND a.event_type < b.event_type
      GROUP BY 1, 2, 3),
q AS (SELECT user_id, et_a, et_b, np,
             CAST(CAST(np AS HUGEINT) * CAST(sxy AS HUGEINT)
                  - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT)
                  AS DOUBLE) AS cov,
             CAST(CAST(np AS HUGEINT) * CAST(sxx AS HUGEINT)
                  - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)
                  AS DOUBLE) AS vx,
             CAST(CAST(np AS HUGEINT) * CAST(syy AS HUGEINT)
                  - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT)
                  AS DOUBLE) AS vy
      FROM p)
SELECT user_id, et_a, et_b, np AS n_days,
       round(cov / (sqrt(vx) * sqrt(vy)), 6) AS chg_corr
FROM q WHERE np >= 10 AND vx <> 0 AND vy <> 0
ORDER BY user_id, et_a, et_b