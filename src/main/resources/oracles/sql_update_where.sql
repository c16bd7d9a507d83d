WITH m AS (SELECT o_orderkey, o_custkey,
                  strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
                  CAST(o_totalprice AS DECIMAL(18,2)) AS p
           FROM orders
           WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
                   BETWEEN '1995-01' AND '1995-03'
             AND o_orderkey % 4 < 2)
SELECT o_orderkey, o_custkey, month,
       CAST(CASE WHEN o_custkey % 10 = 3 THEN p * 3 ELSE p END
            AS DOUBLE) AS total,
       CASE WHEN o_custkey % 10 = 3 THEN 'boosted' ELSE 'base' END
         AS src
FROM m ORDER BY o_orderkey