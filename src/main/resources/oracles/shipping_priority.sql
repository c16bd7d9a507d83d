SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
       o_orderpriority,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2))
                         - CAST(l_discount AS DECIMAL(18,2)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '1998-06-01'
  AND CAST(l_shipdate AS DATE) > DATE '1998-06-01'
GROUP BY 1, 2, 3 ORDER BY o_orderkey