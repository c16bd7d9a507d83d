WITH fbase AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m')
                        AS month,
                      o_custkey,
                      CAST(o_totalprice AS DECIMAL(18,2)) AS p
               FROM orders),
f AS (
  SELECT month, o_custkey, p FROM fbase
  WHERE month IN ('1995-01', '1995-03', '1995-04')
  UNION ALL
  SELECT month, o_custkey, CAST(p * 2 AS DECIMAL(18,2)) AS p
  FROM fbase WHERE month = '1995-02'
),
d AS (SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 3 THEN 'MOVED'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer)
SELECT f.month, d.c_mktsegment, count(*) AS n_rows,
       CAST(sum(f.p) AS DOUBLE) AS total_price
FROM f JOIN d ON f.o_custkey = d.c_custkey
GROUP BY 1, 2 ORDER BY 1, 2