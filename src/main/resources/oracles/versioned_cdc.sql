WITH b AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders),
new02 AS (
  SELECT month, o_orderkey,
         CASE WHEN o_orderkey % 3 = 0
              THEN CAST(round(p * CAST(1.1 AS DECIMAL(3,1)), 2)
                        AS DECIMAL(18,2))
              ELSE p END AS p
  FROM b WHERE month = '1995-02' AND o_orderkey % 10 <> 0),
changes AS (
  SELECT month, 'delete' AS change_type
  FROM b WHERE month = '1995-02' AND o_orderkey % 10 = 0
  UNION ALL
  SELECT n.month, 'update' AS change_type
  FROM new02 n JOIN b o
    ON o.month = '1995-02' AND o.o_orderkey = n.o_orderkey
  WHERE n.p <> o.p
  UNION ALL
  SELECT month, 'insert' AS change_type
  FROM b WHERE month = '1995-04')
SELECT month, change_type, count(*) AS n_changes
FROM changes GROUP BY 1, 2 ORDER BY 1, 2