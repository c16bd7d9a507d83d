SELECT l_returnflag,
       round(q[1], 4) AS p25, round(q[2], 4) AS p50,
       round(q[3], 4) AS p75, round(q[4], 4) AS p95
FROM (SELECT l_returnflag,
             quantile_cont(l_extendedprice, [0.25, 0.5, 0.75, 0.95]) AS q
      FROM lineitem GROUP BY l_returnflag)
ORDER BY l_returnflag