WITH m AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
                  o_orderstatus, o_orderkey,
                  CAST(o_totalprice AS DECIMAL(18,2)) AS p
           FROM orders),
fin AS (
  SELECT o_orderstatus, o_orderkey, p FROM m
  WHERE month IN ('1995-01', '1995-03', '1995-04')
  UNION ALL
  SELECT o_orderstatus, o_orderkey,
         CAST(p * 2 AS DECIMAL(18,2)) AS p FROM m
  WHERE month = '1995-02'
),
r AS (
  SELECT o_orderstatus, o_orderkey, p,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY p DESC, o_orderkey ASC) AS rank
  FROM fin)
SELECT o_orderstatus, CAST(rank AS INT) AS rank, o_orderkey,
       CAST(p AS DOUBLE) AS total_price
FROM r WHERE rank <= 3 ORDER BY o_orderstatus, rank