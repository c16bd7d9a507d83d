WITH b AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders),
m AS (
  SELECT month, p FROM b WHERE month IN ('1995-01', '1995-03')
  UNION ALL
  SELECT month, p FROM b
  WHERE month = '1995-02' AND o_orderkey % 10 <> 0)
SELECT month, count(*) AS n_rows,
       CAST(min(p) AS DOUBLE) AS min_price,
       CAST(max(p) AS DOUBLE) AS max_price
FROM m GROUP BY 1 ORDER BY 1