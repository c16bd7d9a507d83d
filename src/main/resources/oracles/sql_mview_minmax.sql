-- oracle for sql_mview_minmax: the maintained MIN/MAX materialized
-- view must equal a from-scratch recompute of the FINAL source state —
-- months 01-03, minus month 02's > 150000.00 rows (the de-extreming
-- delete that forces the affected-group rescan) and month 01's
-- strictly-inside 10000..20000 band (no rescan). Extremes cast to
-- DOUBLE on both sides.
WITH b AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
  FROM orders
  WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
        BETWEEN '1995-01' AND '1995-03'),
f AS (
  SELECT * FROM b
  WHERE NOT (month = '1995-02' AND o_totalprice > 150000.00)
    AND NOT (month = '1995-01'
             AND o_totalprice BETWEEN 10000.00 AND 20000.00))
SELECT month, count(*) AS n_rows,
       CAST(min(o_totalprice) AS DOUBLE) AS lo,
       CAST(max(o_totalprice) AS DOUBLE) AS hi
FROM f
GROUP BY month ORDER BY month
