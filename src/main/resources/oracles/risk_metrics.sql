WITH bars AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS date,
         arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2, 3),
c AS (SELECT user_id, event_type, date,
             CAST(CAST(close AS DECIMAL(18,6)) * 1000000
                  AS DECIMAL(13,0)) AS cu
      FROM bars),
d AS (SELECT user_id, event_type,
             cu - lag(cu) OVER (PARTITION BY user_id, event_type
                                ORDER BY date) AS dd
      FROM c),
e AS (SELECT user_id, event_type, dd,
             CAST(dd * dd AS DECIMAL(30,0)) AS dd2
      FROM d WHERE dd IS NOT NULL),
g AS (SELECT user_id, event_type,
             count(*) AS n,
             CAST(sum(dd) AS DECIMAL(25,0)) AS s,
             CAST(sum(dd2) AS DECIMAL(30,0)) AS s2,
             CAST(sum(CASE WHEN dd < 0 THEN dd2
                           ELSE CAST(0 AS DECIMAL(30,0)) END)
                  AS DECIMAL(30,0)) AS sneg
      FROM e GROUP BY 1, 2),
f AS (SELECT user_id, event_type, n, s, sneg,
             CAST(s AS DOUBLE) / n / 1e6 AS mean_d,
             CAST(CAST(n AS HUGEINT) * CAST(s2 AS HUGEINT)
                  - CAST(s AS HUGEINT) * CAST(s AS HUGEINT)
                  AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) AS var_d
      FROM g)
SELECT user_id, event_type, n AS n_changes,
       mean_d AS mean_chg,
       CASE WHEN n >= 10 THEN sqrt(var_d) / 1e6 END AS vol_chg,
       CASE WHEN n >= 10
            THEN sqrt(CAST(sneg AS DOUBLE)
                      / CAST(n AS DOUBLE)) / 1e6 END
         AS downside_chg,
       CASE WHEN n >= 10 AND var_d <> 0
            THEN mean_d / (sqrt(var_d) / 1e6) END AS drift_ratio
FROM f ORDER BY user_id, event_type