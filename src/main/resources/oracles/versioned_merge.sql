WITH b AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders),
m AS (
  SELECT month, o_orderkey,
         CASE WHEN month = '1995-02' AND o_orderkey % 2 = 0
              THEN CAST(round(p * CAST(1.1 AS DECIMAL(3,1)), 2)
                        AS DECIMAL(18,2))
              ELSE p END AS p
  FROM b WHERE month BETWEEN '1995-01' AND '1995-03'
  UNION ALL
  SELECT month, o_orderkey, p FROM b WHERE month = '1995-04')
SELECT month, count(*) AS n_rows,
       CAST(sum(p) AS DOUBLE) AS total_price
FROM m GROUP BY 1 ORDER BY 1