WITH m AS (SELECT o_orderkey, o_custkey,
                  strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
                  CAST(o_totalprice AS DECIMAL(18,2)) AS p
           FROM orders
           WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
                   BETWEEN '1995-01' AND '1995-03')
SELECT o_orderkey, o_custkey, month,
       CAST(CASE WHEN o_orderkey % 4 IN (1, 2) THEN p * 2 ELSE p END
            AS DOUBLE) AS total,
       CASE WHEN o_orderkey % 4 IN (1, 2) THEN 'merged' ELSE 'base' END
         AS src
FROM m
WHERE o_orderkey % 4 < 2 OR o_orderkey % 4 = 2
ORDER BY o_orderkey