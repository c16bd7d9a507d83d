WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      count(*) AS n_events
               FROM events GROUP BY 1, 2),
w AS (SELECT event_type, day, n_events,
             sum(n_events) OVER tw AS ps,
             count(n_events) OVER tw AS pn
      FROM daily
      WINDOW tw AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
SELECT event_type, day, n_events,
       n_events * pn * 10000 // ps AS ratio_bps,
       coalesce((n_events * pn * 10000 // ps) > 20000, FALSE) AS burst
FROM w ORDER BY event_type, day