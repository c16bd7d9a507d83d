WITH f AS (SELECT user_id, min(ts::DATE) AS cohort_day
           FROM events GROUP BY user_id),
a AS (SELECT DISTINCT user_id, ts::DATE AS active_day FROM events),
g AS (SELECT cohort_day, active_day - cohort_day AS day_offset,
             count(*) AS n_users
      FROM a JOIN f USING (user_id) GROUP BY 1, 2),
z AS (SELECT cohort_day, day_offset, n_users,
             max(CASE WHEN day_offset = 0 THEN n_users END)
               OVER (PARTITION BY cohort_day) AS cohort_size
      FROM g)
SELECT cohort_day, day_offset, n_users, cohort_size,
       round(n_users::DOUBLE / cohort_size, 4) AS retention
FROM z ORDER BY cohort_day, day_offset