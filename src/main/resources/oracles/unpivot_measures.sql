WITH u AS (
  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
SELECT l_returnflag, measure, count(*) AS n_rows,
       CAST(round(sum(CAST(val AS DECIMAL(24,6))), 2) AS DOUBLE) AS val_sum
FROM u GROUP BY l_returnflag, measure
ORDER BY l_returnflag, measure