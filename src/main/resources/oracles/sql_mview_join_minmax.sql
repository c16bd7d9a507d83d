-- oracle for sql_mview_join_minmax: the maintained extended
-- (min/max/avg) JOIN materialized view must equal a from-scratch
-- recompute of the FINAL joined state — fact months 01-03 minus
-- month 02's > 150000.00 rows (the de-extreming delete), joined to
-- the dim minus every seventh customer (the dim-side row delete).
-- Extremes cast to DOUBLE; the mean is the maintained exact
-- (sum, non-null count) pair in ONE double division.
WITH f AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         o_orderkey, o_custkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders
  WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
        BETWEEN '1995-01' AND '1995-03'),
ff AS (
  SELECT * FROM f
  WHERE NOT (month = '1995-02' AND p > 150000.00)),
d AS (
  SELECT c_custkey, c_mktsegment AS seg FROM customer
  WHERE c_custkey % 7 <> 0)
SELECT seg, count(*) AS n,
       CAST(min(p) AS DOUBLE) AS lo,
       CAST(max(p) AS DOUBLE) AS hi,
       CAST(sum(o_orderkey) AS DOUBLE) / count(o_orderkey) AS mean
FROM ff JOIN d ON ff.o_custkey = d.c_custkey
GROUP BY seg ORDER BY seg
