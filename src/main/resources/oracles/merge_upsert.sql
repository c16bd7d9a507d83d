WITH t AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
         o_orderpriority
  FROM orders WHERE o_orderkey % 3 <> 0),
s AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(round(CAST(o_totalprice AS DECIMAL(18,2))
              * CAST(1.1 AS DECIMAL(3,1)), 2) AS DECIMAL(18,2))
           AS o_totalprice,
         '0-MERGED' AS o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 0)
SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
       CASE WHEN s.o_orderkey IS NOT NULL
            THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
       CAST(CASE WHEN s.o_orderkey IS NOT NULL
            THEN s.o_totalprice ELSE t.o_totalprice END AS DOUBLE)
         AS o_totalprice,
       CASE WHEN s.o_orderkey IS NOT NULL
            THEN s.o_orderpriority ELSE t.o_orderpriority END AS o_orderpriority
FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
ORDER BY o_orderkey