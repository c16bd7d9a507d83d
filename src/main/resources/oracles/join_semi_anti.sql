WITH with_orders AS (
  SELECT c_mktsegment, count(*) AS n_with_orders
  FROM customer c
  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  GROUP BY c_mktsegment),
without_orders AS (
  SELECT c_mktsegment, count(*) AS n_without_orders
  FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  GROUP BY c_mktsegment)
SELECT c_mktsegment,
       coalesce(n_with_orders, 0) AS n_with_orders,
       coalesce(n_without_orders, 0) AS n_without_orders
FROM with_orders FULL OUTER JOIN without_orders USING (c_mktsegment)
ORDER BY c_mktsegment