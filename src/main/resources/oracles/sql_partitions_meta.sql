WITH m AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month
           FROM orders WHERE o_orderkey % 4 < 2),
g AS (SELECT month, count(*) AS n FROM m
      WHERE month BETWEEN '1995-01' AND '1995-04' GROUP BY month)
SELECT month, n AS n_rows, n AS n_rows_files,
       CAST(0 AS BIGINT) AS n_delete_files
FROM g ORDER BY month