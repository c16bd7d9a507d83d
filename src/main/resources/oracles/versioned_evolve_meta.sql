SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
       CASE WHEN CAST(o_totalprice AS DECIMAL(18,2)) >= 150000
            THEN 'H' ELSE 'L' END AS price_band,
       count(*) AS n_rows,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM orders
WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
        BETWEEN '1995-01' AND '1995-02'
GROUP BY 1, 2 ORDER BY 1, 2