-- oracle for changefeed_incremental_topk: the CDC-maintained
-- per-month top-3 orders by (price DESC, orderkey ASC) after a window
-- that DELETES month 1995-02's current winners (orders >= 250000
-- drop) and appends 1995-03 must equal this from-scratch re-ranking
-- of the post-change table. The Spark side refills the affected
-- groups from the source at the window's version.
WITH b AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders),
fin AS (
  SELECT month, o_orderkey, p FROM b WHERE month = '1995-01'
  UNION ALL
  SELECT month, o_orderkey, p FROM b
  WHERE month = '1995-02' AND p < CAST(250000 AS DECIMAL(18,2))
  UNION ALL
  SELECT month, o_orderkey, p FROM b WHERE month = '1995-03'),
ranked AS (
  SELECT month, o_orderkey, p,
         ROW_NUMBER() OVER (PARTITION BY month
                            ORDER BY p DESC, o_orderkey ASC) AS rank
  FROM fin)
SELECT month, rank, o_orderkey, CAST(p AS DOUBLE) AS price
FROM ranked WHERE rank <= 3 ORDER BY month, rank
