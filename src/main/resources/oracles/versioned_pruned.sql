SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
       count(*) AS n_rows,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM orders
WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
        BETWEEN '1995-01' AND '1995-06'
  AND o_orderkey BETWEEN 10000 AND 30000
GROUP BY 1 ORDER BY 1