-- oracle for html_strip: both engines wrap each document's text in the
-- SAME markup shell, then replay the identical strip chain — comments,
-- script/style blocks (with contents), all tags, the six named
-- entities (&amp; LAST), horizontal-whitespace squeeze, line trim +
-- blank-line drop. Every pattern is RE2-compatible, so the cleaned
-- TEXT hash-compares byte for byte.
WITH h AS (
  SELECT doc_id,
         '<html><head><title>Doc</title><style type="text/css">' ||
         'body { color: red; }</style></head>' || chr(10) ||
         '<body class="main"><script type="text/javascript">' ||
         'if (x &lt; 2) { y = "a&quot;b"; }</script>' || chr(10) ||
         '<!-- boilerplate -->' || chr(10) || '<h1>Title</h1>' || chr(10) ||
         '<p>' || text || '</p>' || chr(10) ||
         '<div id="t">&amp;amp; tail &lt;here&gt;&nbsp;end</div>' ||
         '</body></html>' AS html
  FROM documents),
s1 AS (SELECT doc_id, html,
         regexp_replace(html, '<!--.*?-->', ' ', 'gs') AS t FROM h),
s2 AS (SELECT doc_id, html,
         regexp_replace(t, '<script\b[^>]*>.*?</script\s*>', ' ', 'gis')
           AS t FROM s1),
s3 AS (SELECT doc_id, html,
         regexp_replace(t, '<style\b[^>]*>.*?</style\s*>', ' ', 'gis')
           AS t FROM s2),
s4 AS (SELECT doc_id, html,
         regexp_replace(t, '<[^>]*>', ' ', 'gs') AS t FROM s3),
s5 AS (SELECT doc_id, html,
         replace(replace(replace(replace(replace(replace(replace(t,
           '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
           '&#39;', ''''), '&apos;', ''''), '&amp;', '&') AS t FROM s4),
s6 AS (SELECT doc_id, html,
         regexp_replace(t, '[ ' || chr(9) || chr(13) || ']+', ' ', 'g')
           AS t FROM s5),
fin AS (
  SELECT doc_id, html,
         COALESCE(array_to_string(
           list_filter(list_transform(string_split(t, chr(10)),
                                      l -> trim(l)),
                       l -> l <> ''), chr(10)), '') AS text
  FROM s6)
SELECT doc_id, text,
       CAST(length(html) AS BIGINT) AS raw_chars,
       CAST(length(text) AS BIGINT) AS clean_chars,
       CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                            x -> x <> '')) AS BIGINT) AS n_words
FROM fin ORDER BY doc_id
