-- oracle for sql_txn_merge: MERGE INTO + UPDATE riding BEGIN…COMMIT.
-- The final cross-table state after two transactions — (1) dimension
-- bootstrap-MERGE + month-01 fact promote, (2) every-tenth-customer
-- VIP re-segment MERGE + month-02 promote + a fact UPDATE doubling
-- orders above 300000.00 — must equal this from-scratch replay of the
-- fact ⋈ dim aggregate. Sum cast to DOUBLE.
WITH f0 AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         o_orderkey, o_custkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders
  WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
        BETWEEN '1995-01' AND '1995-02'),
f AS (
  SELECT o_custkey,
         CASE WHEN p > 300000.00 THEN CAST(p * 2 AS DECIMAL(18,2))
              ELSE p END AS p
  FROM f0),
d AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 10 = 0 THEN 'VIP'
              ELSE c_mktsegment END AS seg
  FROM customer)
SELECT seg, count(*) AS n_orders, CAST(sum(p) AS DOUBLE) AS total_price
FROM f JOIN d ON f.o_custkey = d.c_custkey
GROUP BY seg ORDER BY seg
