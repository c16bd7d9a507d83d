WITH e AS (
  SELECT event_type,
         CAST(isodow(CAST(ts AS DATE)) AS INT) AS isodow
  FROM events)
SELECT event_type, isodow, count(*) AS n_events,
       CAST(GROUPING(event_type, isodow) AS BIGINT) AS gid
FROM e GROUP BY ROLLUP (event_type, isodow)
ORDER BY gid, event_type, isodow