WITH x AS (SELECT event_id, event_type, value,
                  CAST(round(value * 100) AS HUGEINT) AS xv
           FROM events),
s AS (SELECT event_type, count(*)::HUGEINT AS n,
             sum(xv) AS sv, sum(xv * xv) AS q
      FROM x GROUP BY 1)
SELECT event_id, event_type, value,
       round(CAST(xv * n - sv AS DOUBLE)
             / sqrt(CAST(n * (n * q - sv * sv) AS DOUBLE) / (n - 1)), 4) AS z
FROM x JOIN s USING (event_type)
WHERE n >= 2 AND
      (xv * n - sv) * (xv * n - sv) * (n - 1) > 9 * n * (n * q - sv * sv)
ORDER BY event_id