WITH p AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events),
d AS (SELECT DISTINCT day FROM p)
SELECT d.day AS report_day, count(DISTINCT u) AS active_users
FROM d JOIN p ON p.day BETWEEN d.day - 6 AND d.day
GROUP BY 1 ORDER BY 1