-- oracle for changefeed_incremental_minmax: the CDC-maintained
-- per-month (count, min, max) view after a window that DELETES month
-- 1995-02's price extremum (orders >= 250000 drop) and appends
-- 1995-03 must equal this from-scratch recompute of the post-change
-- table. The Spark side folds inserts by least/greatest and rescans
-- only the delete-affected groups from the source at the window's
-- version.
WITH b AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders),
fin AS (
  SELECT month, p FROM b WHERE month = '1995-01'
  UNION ALL
  SELECT month, p FROM b
  WHERE month = '1995-02' AND p < CAST(250000 AS DECIMAL(18,2))
  UNION ALL
  SELECT month, p FROM b WHERE month = '1995-03')
SELECT month, count(*) AS n_rows,
       CAST(min(p) AS DOUBLE) AS min_price,
       CAST(max(p) AS DOUBLE) AS max_price
FROM fin GROUP BY 1 ORDER BY 1
