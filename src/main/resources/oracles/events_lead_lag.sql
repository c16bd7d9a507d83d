SELECT event_id, user_id,
       round(value - lag(value) OVER w, 4) AS delta_prev,
       epoch_ms(ts) - epoch_ms(lag(ts) OVER w) AS gap_ms,
       lead(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id