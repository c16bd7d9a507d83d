WITH m AS (SELECT o_orderkey,
                  strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
                  CAST(o_totalprice AS DECIMAL(28,2)) AS p
           FROM orders
           WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
                   BETWEEN '1995-01' AND '1995-03'
             AND o_orderkey % 4 < 2),
u AS (SELECT month, p FROM m
      UNION ALL
      SELECT '1995-02',
             CAST(100000000000000000000.00 AS DECIMAL(28,2)))
SELECT month, count(*) AS n_rows,
       CAST(sum(p) AS DOUBLE) AS sum_total
FROM u GROUP BY month ORDER BY month