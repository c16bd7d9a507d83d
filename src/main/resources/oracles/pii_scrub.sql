SELECT event_id,
       regexp_replace(props, '[0-9]+', '#', 'g') AS scrubbed,
       len(regexp_extract_all(props, '[0-9]+')) AS n_masked
FROM events ORDER BY event_id