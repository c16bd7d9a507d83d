WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
ok AS (SELECT o FROM b GROUP BY o HAVING count(*) <= 1000),
bb AS (SELECT b.o, b.p FROM b JOIN ok USING (o)),
pp AS (SELECT a.p AS pa, b2.p AS pb
       FROM bb a JOIN bb b2 USING (o) WHERE a.p < b2.p
       GROUP BY 1, 2 HAVING count(*) >= 3),
tri AS (SELECT p1.pa AS x, p1.pb AS y, p2.pb AS z
        FROM pp p1
        JOIN pp p2 ON p1.pb = p2.pa
        JOIN pp p3 ON p3.pa = p1.pa AND p3.pb = p2.pb),
nodes AS (SELECT DISTINCT pa AS id FROM pp
          UNION SELECT DISTINCT pb FROM pp),
cnt AS (SELECT id, CAST(count(*) AS BIGINT) AS t FROM (
          SELECT x AS id FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri) GROUP BY id)
SELECT n.id, coalesce(c.t, 0) AS n_triangles
FROM nodes n LEFT JOIN cnt c USING (id)
ORDER BY id