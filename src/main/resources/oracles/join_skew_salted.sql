WITH dim AS (SELECT event_type, count(*) AS type_count
             FROM events GROUP BY event_type)
SELECT e.event_type, max(d.type_count) AS type_count,
       count(*) AS n_events,
       CAST(round(sum(CAST(e.value AS DECIMAL(24,6))), 2) AS DOUBLE) AS value_sum
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY e.event_type ORDER BY e.event_type