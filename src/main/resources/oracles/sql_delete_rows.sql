WITH m AS (SELECT o_orderkey, o_custkey,
                  strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
                  CAST(o_totalprice AS DECIMAL(18,2)) AS p
           FROM orders
           WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
                   BETWEEN '1995-01' AND '1995-03'
             AND o_orderkey % 4 < 2)
SELECT o_orderkey, o_custkey, month, CAST(p AS DOUBLE) AS total,
       'base' AS src
FROM m
WHERE NOT (p > 150000 AND o_custkey % 2 = 0)
ORDER BY o_orderkey