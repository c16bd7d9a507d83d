WITH m AS (SELECT DISTINCT strftime(CAST(o_orderdate AS DATE), '%Y-%m')
                    AS month
           FROM orders WHERE o_orderkey % 4 < 2),
c3 AS (SELECT count(*) AS n FROM m
       WHERE month BETWEEN '1995-01' AND '1995-03'),
c4 AS (SELECT count(*) AS n FROM m
       WHERE month BETWEEN '1995-01' AND '1995-04')
SELECT CAST(1 AS BIGINT) AS version, c3.n AS n_partitions,
       FALSE AS is_current FROM c3
UNION ALL SELECT CAST(2 AS BIGINT), c3.n, FALSE FROM c3
UNION ALL SELECT CAST(3 AS BIGINT), c4.n, TRUE FROM c4
ORDER BY version