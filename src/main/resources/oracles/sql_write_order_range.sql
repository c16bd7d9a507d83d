-- oracle for sql_write_order_range: the declared write order changes
-- the FILE LAYOUT (RefsOrderSpec pins the skipping), never the rows —
-- the routed range read must equal the plain filter over the raw rows.
SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
       o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
FROM orders
WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
      BETWEEN '1995-01' AND '1995-03'
  AND o_orderkey BETWEEN 1000 AND 3000
ORDER BY month, o_orderkey
