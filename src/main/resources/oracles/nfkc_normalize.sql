-- oracle for nfkc_normalize: the NFKC kernel's outputs pinned as
-- hand-verified literals (DuckDB's nfc_normalize cannot produce
-- compatibility mappings like fullwidth->ASCII or ligature->letters,
-- so the expected strings are carried verbatim; verified against
-- Python unicodedata.normalize('NFKC', ...) and the Unicode UAX #15
-- tables). Targets: e+COMBINING ACUTE composes, fullwidth -> ASCII,
-- fi-ligature -> fi, circled digits -> digits, halfwidth katakana +
-- voiced marks -> composed katakana, superscripts -> digits,
-- ONE HALF -> 1 + FRACTION SLASH + 2.
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), 'Café au lait', CAST(0 AS BIGINT)),
  (2, 'ABC123', 0),
  (3, 'file system', 0),
  (4, '123', 0),
  (5, 'ガゴ', 0),
  (6, 'x2 + y3', 0),
  (7, '1⁄2 cup', 0),
  (8, 'plain ascii stays', 1)
) AS t(id, norm, unchanged)
ORDER BY id
