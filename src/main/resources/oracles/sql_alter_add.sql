WITH m AS (SELECT o_orderkey,
                  strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
                  CAST(o_totalprice AS DECIMAL(18,2)) AS p
           FROM orders
           WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
                   BETWEEN '1995-01' AND '1995-03'
             AND o_orderkey % 4 < 2)
SELECT CASE WHEN p >= 150000 THEN 'H' ELSE 'L' END AS band, month,
       count(*) AS n_rows, CAST(sum(p) AS DOUBLE) AS sum_total
FROM m GROUP BY 1, 2 ORDER BY 1, 2