WITH refs AS (
  SELECT user_id, ts, event_id AS rid, value AS rvalue
  FROM (SELECT user_id, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts, event_id) AS rn
        FROM events)
  WHERE rn = 1)
SELECT l.event_id, l.user_id,
       r.rid AS ref_rid, round(r.rvalue, 4) AS ref_rvalue
FROM events l
ASOF LEFT JOIN refs r ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id