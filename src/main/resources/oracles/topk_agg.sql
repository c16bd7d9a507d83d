SELECT event_type, rank, event_id FROM (
  SELECT event_type, event_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rank
  FROM events)
WHERE rank <= 5 ORDER BY event_type, rank