WITH m AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
                  o_orderstatus, o_orderpriority
           FROM orders),
fin AS (
  SELECT month, o_orderstatus, o_orderpriority FROM m
  WHERE month IN ('1995-01', '1995-03', '1995-04')
  UNION ALL
  SELECT month, o_orderstatus, '1-URGENT' AS o_orderpriority FROM m
  WHERE month = '1995-02'
)
SELECT o_orderstatus,
       CAST(count(DISTINCT o_orderpriority) AS BIGINT)
         AS approx_distinct_o_orderpriority,
       CAST(count(DISTINCT month) AS BIGINT) AS approx_distinct_month
FROM fin GROUP BY 1 ORDER BY 1