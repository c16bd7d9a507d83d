SELECT event_type, k, count(*) AS n,
       round(avg(json_extract_string(props, '$.' || k)::DOUBLE), 4)
         AS avg_v
FROM (SELECT event_type, props, unnest(json_keys(props)) AS k
      FROM events)
GROUP BY event_type, k ORDER BY event_type, k