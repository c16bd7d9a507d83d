WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
ok AS (SELECT o FROM b GROUP BY o HAVING count(*) <= 1000),
bb AS (SELECT b.o, b.p FROM b JOIN ok USING (o))
SELECT a.p AS item_a, b2.p AS item_b, count(*) AS n_baskets
FROM bb a JOIN bb b2 USING (o) WHERE a.p < b2.p
GROUP BY 1, 2 HAVING count(*) >= 3
ORDER BY item_a, item_b