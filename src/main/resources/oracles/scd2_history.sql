WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events),
chg AS (
  SELECT user_id, ts, event_id, event_type
  FROM marked WHERE prev IS NULL OR prev <> event_type)
SELECT user_id,
       row_number() OVER w AS version,
       event_type,
       epoch_ms(ts) AS effective_from_ms,
       epoch_ms(lead(ts) OVER w) AS effective_to_ms
FROM chg
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, version