WITH m AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
                  o_orderstatus,
                  CAST(o_totalprice AS DECIMAL(18,2)) AS p
           FROM orders),
fin AS (
  SELECT o_orderstatus, p FROM m
  WHERE month IN ('1995-01', '1995-03', '1995-04')
  UNION ALL
  SELECT o_orderstatus, CAST(p * 2 AS DECIMAL(18,2)) AS p FROM m
  WHERE month = '1995-02'
)
SELECT o_orderstatus, CAST(min(p) AS DOUBLE) AS min_price,
       CAST(max(p) AS DOUBLE) AS max_price
FROM fin GROUP BY 1 ORDER BY 1