SELECT event_type, count(*) AS n_events,
       CAST(sum(event_id) AS BIGINT) AS id_sum
FROM events WHERE user_id = 42
GROUP BY event_type ORDER BY event_type