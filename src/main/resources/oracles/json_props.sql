SELECT event_type, count(*) AS n_events,
       round(avg(json_extract_string(props, '$.k')::BIGINT), 4) AS avg_k,
       max(json_extract_string(props, '$.k')::BIGINT) AS max_k
FROM events GROUP BY event_type ORDER BY event_type