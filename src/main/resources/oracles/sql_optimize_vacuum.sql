SELECT o_orderkey, o_custkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total,
       'base' AS src
FROM orders
WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
        BETWEEN '1995-01' AND '1995-03'
  AND o_orderkey % 4 < 2
ORDER BY o_orderkey