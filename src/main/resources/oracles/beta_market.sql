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
m AS (SELECT date, CAST(sum(dd) AS DECIMAL(25,0)) AS mm
      FROM e GROUP BY 1),
p AS (SELECT e.user_id, e.event_type,
             count(*) AS np,
             CAST(sum(e.dd) AS DECIMAL(25,0)) AS sx,
             CAST(sum(m.mm) AS DECIMAL(30,0)) AS sm,
             CAST(sum(CAST(e.dd * m.mm AS DECIMAL(30,0)))
                  AS DECIMAL(38,0)) AS sxm,
             CAST(sum(CAST(m.mm * m.mm AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS smm
      FROM e JOIN m ON e.date = m.date
      GROUP BY 1, 2),
q AS (SELECT user_id, event_type, np,
             CAST(CAST(np AS HUGEINT) * CAST(sxm AS HUGEINT)
                  - CAST(sx AS HUGEINT) * CAST(sm AS HUGEINT)
                  AS DOUBLE) AS cov,
             CAST(CAST(np AS HUGEINT) * CAST(smm AS HUGEINT)
                  - CAST(sm AS HUGEINT) * CAST(sm AS HUGEINT)
                  AS DOUBLE) AS varm
      FROM p)
SELECT user_id, event_type, np AS n_days, cov / varm AS beta
FROM q WHERE np >= 10 AND varm <> 0
ORDER BY user_id, event_type