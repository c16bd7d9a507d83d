-- oracle for sql_point_lookup: the bloom-indexed equality lookup
-- through the statement door must return exactly the row whose md5
-- doc id matches the target (the min 1995-02 orderkey's md5) — both
-- engines compute md5 over the same decimal string of the key, so the
-- lookup value is identical by construction. File skipping is plan
-- shape (HiddenPartitionSpec pins inputFiles); this gate pins the
-- answer.
WITH b AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         o_orderkey,
         md5(CAST(o_orderkey AS VARCHAR)) AS doc
  FROM orders
  WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
        BETWEEN '1995-01' AND '1995-03'),
t AS (
  SELECT md5(CAST(min(o_orderkey) AS VARCHAR)) AS v
  FROM b WHERE month = '1995-02')
SELECT b.month, b.o_orderkey, b.doc
FROM b, t WHERE b.doc = t.v
ORDER BY b.o_orderkey
