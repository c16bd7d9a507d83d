-- oracle for versioned_upsert: the one-commit keyed upsert must equal
-- this from-scratch recompute — months 01-03 where month 01's keys
-- divisible by 10 carry the doubled price (their old rows retired by
-- the upsert), month 02 untouched, month 03 inserted whole. Sum cast
-- to DOUBLE on both sides.
WITH b AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
  FROM orders
  WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
        BETWEEN '1995-01' AND '1995-03'),
f AS (
  SELECT month, o_orderkey,
         CASE WHEN month = '1995-01' AND o_orderkey % 10 = 0
              THEN CAST(o_totalprice * 2 AS DECIMAL(18,2))
              ELSE o_totalprice END AS p
  FROM b)
SELECT month, count(*) AS n_rows, CAST(sum(p) AS DOUBLE) AS total
FROM f
GROUP BY month ORDER BY month
