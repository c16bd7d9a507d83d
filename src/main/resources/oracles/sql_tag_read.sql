-- oracle for sql_tag_read: the tag pins the pre-March state, so the
-- routed VERSION AS OF 'before_march' read must equal a from-scratch
-- aggregate over ONLY the pre-tag months, computed here from the raw
-- rows. Sum cast to DOUBLE on both sides (decimal width parity).
WITH b AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
  FROM orders
  WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
        BETWEEN '1995-01' AND '1995-02')
SELECT month, count(*) AS n_rows,
       CAST(sum(o_totalprice) AS DOUBLE) AS total
FROM b GROUP BY month ORDER BY month
