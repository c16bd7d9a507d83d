-- oracle for changefeed_incremental_distinct: the CDC-maintained
-- distinct-support state read as per-month COUNT DISTINCT must equal
-- this from-scratch recompute after the window drops every 10th
-- 1995-02 orderkey (custkeys whose orders all drop leave the support)
-- and appends 1995-03.
WITH b AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         o_orderkey, o_custkey
  FROM orders),
fin AS (
  SELECT month, o_custkey FROM b WHERE month = '1995-01'
  UNION ALL
  SELECT month, o_custkey FROM b
  WHERE month = '1995-02' AND o_orderkey % 10 <> 0
  UNION ALL
  SELECT month, o_custkey FROM b WHERE month = '1995-03')
SELECT month, count(DISTINCT o_custkey) AS distinct_o_custkey
FROM fin GROUP BY 1 ORDER BY 1
