WITH m AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
                  CAST(o_totalprice AS DECIMAL(18,2)) AS p
           FROM orders),
fin AS (
  SELECT month, p FROM m WHERE month IN ('1995-01', '1995-03', '1995-04')
  UNION ALL
  SELECT month, CAST(p * 2 AS DECIMAL(18,2)) AS p FROM m
  WHERE month = '1995-02'
)
SELECT month, count(*) AS n_rows, CAST(sum(p) AS DOUBLE) AS total_price
FROM fin GROUP BY 1 ORDER BY 1