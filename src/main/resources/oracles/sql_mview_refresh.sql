-- oracle for sql_mview_refresh: the incrementally-refreshed
-- materialized view must equal a from-scratch recompute of the FINAL
-- source state — months 02 and 03 (01 inserted then retracted), rows
-- with o_orderkey > 100, grouped per month. Sum cast to DOUBLE on
-- both sides.
WITH b AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
  FROM orders
  WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
        BETWEEN '1995-02' AND '1995-03')
SELECT month, count(*) AS n_rows,
       CAST(sum(o_totalprice) AS DOUBLE) AS total
FROM b WHERE o_orderkey > 100
GROUP BY month ORDER BY month
