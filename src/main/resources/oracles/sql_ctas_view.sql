WITH m AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
                  CAST(o_totalprice AS DECIMAL(18,2)) AS p
           FROM orders
           WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
                   BETWEEN '1995-01' AND '1995-03'
             AND o_orderkey % 4 < 2)
SELECT month, count(*) AS n_rows, CAST(sum(p) AS DOUBLE) AS sum_total
FROM m WHERE p >= 100000
GROUP BY month ORDER BY month