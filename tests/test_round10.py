"""Round-10 additions (ADVICE r9 closures).

1. Delimiter-sniffed feed: only the FINAL trailing newline is stripped —
   an interior blank line is a corruption signal and must surface as a
   visible all-null row, not vanish silently (ADVICE r9 item 4; the r9
   guard filtered every empty line).
2. A ``"\\n\\n"`` tail: the final newline is stripped, the now-final blank
   line stays visible (the ``\\z`` anchor vs the ``$``-eats-two hazard).
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_sniffer_interior_blank_line_stays_visible(spark):
    """An interior blank line — a corruption the consistent producer never
    emits — must parse into a visible all-null row, not disappear."""
    from gcp_cloudsql_to_bigquery_spark.sources.files import sniff_and_parse_feed

    content = "custkey,name,segment\n1,ALICE,AUTO\n\n2,BOB,MACHINERY\n"
    feeds = spark.createDataFrame([(0, content)], "shard int, content string")
    rows = sniff_and_parse_feed(feeds).collect()
    assert len(rows) == 3, rows  # 2 data rows + 1 visible junk row
    junk = [r for r in rows if r["custkey"] is None]
    assert len(junk) == 1
    assert junk[0]["name"] is None and junk[0]["segment"] is None
    keys = sorted(r["custkey"] for r in rows if r["custkey"] is not None)
    assert keys == [1, 2]


def test_sniffer_double_trailing_newline_keeps_one_blank(spark):
    """A feed ending in two newlines: exactly ONE is the delivery artifact;
    the blank line before it is data-side corruption and stays visible."""
    from gcp_cloudsql_to_bigquery_spark.sources.files import sniff_and_parse_feed

    content = "custkey,name,segment\n1,ALICE,AUTO\n\n"
    feeds = spark.createDataFrame([(0, content)], "shard int, content string")
    rows = sniff_and_parse_feed(feeds).collect()
    assert len(rows) == 2, rows  # 1 data row + 1 visible blank-line row
    assert sorted([r["custkey"] for r in rows], key=lambda x: (x is None, x)) == [1, None]
