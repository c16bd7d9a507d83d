WITH b AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS date,
         arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2, 3),
r AS (SELECT user_id, event_type, min(date) AS d0, max(date) AS d1
      FROM b GROUP BY 1, 2),
spine AS (
  SELECT user_id, event_type,
         unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS date
  FROM r),
j AS (
  SELECT s.user_id, s.event_type, s.date, b.close,
         b.close IS NOT NULL AS observed
  FROM spine s LEFT JOIN b
    ON s.user_id = b.user_id AND s.event_type = b.event_type
   AND s.date = b.date),
a AS (
  SELECT user_id, event_type, date, close, observed,
         last_value(CASE WHEN observed AND close IS NOT NULL
                         THEN date END IGNORE NULLS) OVER fwd AS d_prev,
         last_value(CASE WHEN observed AND close IS NOT NULL
                         THEN close END IGNORE NULLS) OVER fwd AS v_prev,
         first_value(CASE WHEN observed AND close IS NOT NULL
                          THEN date END IGNORE NULLS) OVER bwd AS d_next,
         first_value(CASE WHEN observed AND close IS NOT NULL
                          THEN close END IGNORE NULLS) OVER bwd AS v_next
  FROM j
  WINDOW fwd AS (PARTITION BY user_id, event_type ORDER BY date
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         bwd AS (PARTITION BY user_id, event_type ORDER BY date
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT user_id, event_type, date,
       CASE WHEN observed THEN close
            WHEN d_next IS NULL THEN v_prev
            ELSE v_prev + (v_next - v_prev) * (date - d_prev)
                          / (d_next - d_prev) END AS close,
       observed
FROM a ORDER BY user_id, event_type, date