-- oracle for sql_cache_table: the post-invalidation routed aggregate
-- must reflect ALL three months — a cache served past the version bump
-- would miss 1995-03 and hash-fail.
WITH b AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders
  WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
        BETWEEN '1995-01' AND '1995-03')
SELECT month, count(*) AS n_rows,
       CAST(sum(p) AS DOUBLE) AS total_price
FROM b GROUP BY month ORDER BY month
