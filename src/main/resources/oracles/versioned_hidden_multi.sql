SELECT event_type, count(*) AS n_events,
       CAST(sum(event_id) AS BIGINT) AS id_sum
FROM events
WHERE ts BETWEEN TIMESTAMP '2024-01-08 00:00:00'
          AND TIMESTAMP '2024-01-21 23:59:59.999999'
  AND user_id = 42
GROUP BY event_type ORDER BY event_type