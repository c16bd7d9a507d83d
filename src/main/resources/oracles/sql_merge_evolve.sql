-- oracle for sql_merge_evolve: base = 1995-01..03 orders with
-- o_orderkey % 4 < 2 (src 'base', no region column); the evolving
-- MERGE upserts the % 4 IN (1, 2) slice carrying a NEW region column.
-- Matched rows (% 4 = 1) take the source's values; untouched rows
-- (% 4 = 0) keep src 'base' and a NULL region (the metadata-only
-- default); new rows (% 4 = 2) insert whole.
WITH b AS (
  SELECT o_orderkey, o_custkey,
         strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         CAST(o_totalprice AS DECIMAL(18,2)) AS total
  FROM orders
  WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
          BETWEEN '1995-01' AND '1995-03'),
base AS (
  SELECT o_orderkey, o_custkey, month, total, 'base' AS src
  FROM b WHERE o_orderkey % 4 < 2),
srcr AS (
  SELECT o_orderkey, o_custkey, month, total, 'merged' AS src,
         CASE WHEN o_custkey % 2 = 0 THEN 'east' ELSE 'west' END AS region
  FROM b WHERE o_orderkey % 4 IN (1, 2)),
merged AS (
  SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
         COALESCE(s.o_custkey, t.o_custkey) AS o_custkey,
         COALESCE(s.month, t.month) AS month,
         COALESCE(s.total, t.total) AS total,
         COALESCE(s.src, t.src) AS src,
         s.region AS region
  FROM base t FULL OUTER JOIN srcr s
    ON t.o_orderkey = s.o_orderkey AND t.month = s.month)
SELECT o_orderkey, o_custkey, month,
       CAST(total AS DOUBLE) AS total, src,
       COALESCE(region, '-') AS region
FROM merged ORDER BY o_orderkey
