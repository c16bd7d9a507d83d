-- oracle for sql_mview_avg: the maintained AVG materialized view must
-- equal a from-scratch recompute of the FINAL source state — months
-- 01-03 with o_orderkey > 100, minus month 02's > 40000 keys. The
-- view's mean is the exact maintained (sum, non-null count) pair in
-- ONE double division; spelled the same way here (DuckDB's avg() on
-- BIGINT computes the identical exact-sum-then-divide at these
-- magnitudes, but the division spelling keeps the parity argument
-- arithmetic, not implementation-dependent). Sum cast to DOUBLE.
WITH b AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
  FROM orders
  WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
        BETWEEN '1995-01' AND '1995-03'),
f AS (
  SELECT * FROM b
  WHERE o_orderkey > 100
    AND NOT (month = '1995-02' AND o_orderkey > 40000))
SELECT month, count(*) AS n_rows,
       CAST(sum(o_orderkey) AS DOUBLE) / count(o_orderkey) AS mean_key,
       CAST(sum(o_totalprice) AS DOUBLE) AS total
FROM f
GROUP BY month ORDER BY month
