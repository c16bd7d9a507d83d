SELECT 'Q2' AS quarter,
       count(*) AS n_rows,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM orders
WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
        IN ('1995-04', '1995-05', '1995-06')
GROUP BY 1 ORDER BY 1
