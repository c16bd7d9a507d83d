WITH c0 AS (
  SELECT user_id, ts, event_id, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS f0
  FROM events),
c1 AS (
  SELECT *, min(CASE WHEN event_type = 'click'
                      AND f0 IS NOT NULL AND ts > f0 THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS f1
  FROM c0),
c2 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase'
                      AND f1 IS NOT NULL AND ts > f1 THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS f2
  FROM c1),
u AS (SELECT user_id, min(f0) AS f0, min(f1) AS f1, min(f2) AS f2
      FROM c2 GROUP BY user_id)
SELECT 1 AS step, 'view' AS step_type,
       count(*) FILTER (WHERE f0 IS NOT NULL) AS n_users FROM u
UNION ALL
SELECT 2, 'click', count(*) FILTER (WHERE f1 IS NOT NULL) FROM u
UNION ALL
SELECT 3, 'purchase', count(*) FILTER (WHERE f2 IS NOT NULL) FROM u
ORDER BY step