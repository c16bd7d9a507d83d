SELECT date_trunc('month', CAST(o_orderdate AS DATE))::DATE AS month_start,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(24,6))), 2) AS DOUBLE) AS total_price
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING')
GROUP BY 1 ORDER BY month_start