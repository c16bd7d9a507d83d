WITH s AS (SELECT s_nationkey AS nk FROM supplier),
c AS (SELECT c_nationkey AS nk FROM customer)
SELECT 'intersect' AS op, nk FROM (SELECT nk FROM s INTERSECT SELECT nk FROM c)
UNION ALL
SELECT 'supplier_only', nk FROM (SELECT nk FROM s EXCEPT SELECT nk FROM c)
UNION ALL
SELECT 'customer_only', nk FROM (SELECT nk FROM c EXCEPT SELECT nk FROM s)
ORDER BY op, nk