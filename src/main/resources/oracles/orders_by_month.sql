SELECT date_trunc('month', CAST(o_orderdate AS DATE))::DATE AS month_start,
       EXTRACT(quarter FROM CAST(o_orderdate AS DATE)) AS qtr,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(24,6))), 2) AS DOUBLE) AS total_price
FROM orders
GROUP BY 1, 2 ORDER BY month_start