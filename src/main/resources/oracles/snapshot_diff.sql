WITH o AS (SELECT user_id, event_type, value, TRUE AS op FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-15')
      WHERE rn = 1),
n AS (SELECT user_id, event_type, value, TRUE AS np FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1),
d AS (SELECT user_id, event_type,
             CASE WHEN op IS NULL THEN 'insert'
                  WHEN np IS NULL THEN 'delete'
                  WHEN o.value IS NOT DISTINCT FROM n.value THEN 'unchanged'
                  ELSE 'update' END AS change_type
      FROM o FULL OUTER JOIN n USING (user_id, event_type))
SELECT user_id, event_type, change_type FROM d
WHERE change_type <> 'unchanged'
ORDER BY user_id, event_type