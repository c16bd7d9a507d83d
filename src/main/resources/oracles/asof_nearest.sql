WITH refs AS (
  SELECT user_id, ts, event_id AS rid, value AS rvalue
  FROM (SELECT user_id, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts, event_id) AS rn
        FROM events)
  WHERE rn = 1),
b AS (SELECT l.event_id, l.user_id, l.ts,
             r.ts AS bts, r.rid AS brid, r.rvalue AS brvalue
      FROM events l
      ASOF LEFT JOIN refs r ON l.user_id = r.user_id AND l.ts >= r.ts),
f AS (SELECT l.event_id,
             r.ts AS fts, r.rid AS frid, r.rvalue AS frvalue
      FROM events l
      ASOF LEFT JOIN refs r ON l.user_id = r.user_id AND l.ts <= r.ts)
SELECT b.event_id, b.user_id,
       CASE WHEN b.bts IS NULL THEN f.frid
            WHEN f.fts IS NULL THEN b.brid
            WHEN epoch_ms(b.ts) - epoch_ms(b.bts)
                 <= epoch_ms(f.fts) - epoch_ms(b.ts) THEN b.brid
            ELSE f.frid END AS ref_rid,
       round(CASE WHEN b.bts IS NULL THEN f.frvalue
                  WHEN f.fts IS NULL THEN b.brvalue
                  WHEN epoch_ms(b.ts) - epoch_ms(b.bts)
                       <= epoch_ms(f.fts) - epoch_ms(b.ts) THEN b.brvalue
                  ELSE f.frvalue END, 4) AS ref_rvalue
FROM b JOIN f USING (event_id)
ORDER BY b.event_id