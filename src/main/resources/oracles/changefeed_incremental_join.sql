-- oracle for changefeed_incremental_join: the two-feed-maintained
-- revenue-by-(month x segment) join view must equal this from-scratch
-- recompute of the post-change fact (every 10th 1995-02 order
-- dropped, 1995-03 appended) joined to the post-change dim (every 7th
-- customer moved to segment MOVED).
WITH f AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         o_orderkey, o_custkey AS c_custkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders),
ffin AS (
  SELECT month, c_custkey, p FROM f WHERE month = '1995-01'
  UNION ALL
  SELECT month, c_custkey, p FROM f
  WHERE month = '1995-02' AND o_orderkey % 10 <> 0
  UNION ALL
  SELECT month, c_custkey, p FROM f WHERE month = '1995-03'),
d AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN 'MOVED'
              ELSE c_mktsegment END AS c_mktsegment
  FROM customer)
SELECT month, c_mktsegment, count(*) AS n_rows,
       CAST(sum(p) AS DOUBLE) AS total_price
FROM ffin JOIN d USING (c_custkey)
GROUP BY 1, 2 ORDER BY 1, 2
