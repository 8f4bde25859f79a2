"""EDGAR feed ingestion — the fetch layer of the reference's outermost
ETL loop (SURVEY §3.1: monthly EDGAR XBRL RSS -> filing archives ->
facts).  The environment is offline, so the layer is CAPABILITY-
DISPATCHED exactly like snk_sqlite's JDBC branch: the network fetch is
real code behind an explicit opt-in gate (unit-tested for clean offline
refusal), while the feed PARSER — the part with actual semantics — runs
against a repo-local fixture feed and is certified with a golden VALUES
oracle (the xbrl_q_* playbook).

Feed format: EDGAR's public monthly XBRL RSS (rss/channel/item with an
edgar:xbrlFiling block carrying cikNumber / accessionNumber / formType /
period / enclosureUrl).  fixtures/edgar_feed.xml is a hand-written
6-item instance of that shape.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from .sources_sinks import FIXTURES_DIR

EDGAR_NS = {"edgar": "https://www.sec.gov/Archives/edgar"}

FEED_COLS = ["cik", "accession", "form", "period_end", "company", "enclosure_url"]
FEED_SCHEMA = (
    "cik string, accession string, form string, period_end string, "
    "company string, enclosure_url string"
)

#: network fetches only run when the operator explicitly opts in — the
#: offline container must fail fast and obviously, never hang on DNS.
ALLOW_NETWORK_ENV = "SECDB_SPARK_ALLOW_NETWORK"


def network_allowed() -> bool:
    return os.environ.get(ALLOW_NETWORK_ENV, "") == "1"


def fetch_feed(url: str, dest_path: str, timeout_s: int = 30) -> str:
    """Download a feed (or filing archive) to dest_path.  Dormant branch:
    refuses unless SECDB_SPARK_ALLOW_NETWORK=1, so offline runs get a
    clear RuntimeError instead of a socket hang.  urllib is stdlib — no
    dependency risk; retry/backoff policy belongs to the caller's
    scheduler (the driver re-runs idempotent fetches)."""
    if not network_allowed():
        raise RuntimeError(
            f"network fetch disabled (set {ALLOW_NETWORK_ENV}=1 to enable): {url}"
        )
    import urllib.request

    with urllib.request.urlopen(url, timeout=timeout_s) as resp:  # noqa: S310
        data = resp.read()
    with open(dest_path, "wb") as f:
        f.write(data)
    return dest_path


def parse_feed(path: str) -> list[tuple]:
    """Parse one EDGAR-shaped RSS feed into manifest tuples (FEED_COLS
    order).  Namespace-aware ElementTree; items without an
    edgar:xbrlFiling block (non-XBRL filings appear in real feeds) are
    skipped rather than failing the batch."""

    def txt(el, tag):
        node = el.find(f"edgar:{tag}", EDGAR_NS)
        return node.text if node is not None else None

    out = []
    for item in ET.parse(path).getroot().findall("./channel/item"):
        filing = item.find("edgar:xbrlFiling", EDGAR_NS)
        if filing is None:
            continue
        out.append(
            (
                txt(filing, "cikNumber"),
                txt(filing, "accessionNumber"),
                txt(filing, "formType"),
                txt(filing, "period"),
                txt(filing, "companyName"),
                txt(filing, "enclosureUrl"),
            )
        )
    return out


def _fixture_feed_path() -> str:
    return os.path.abspath(os.path.join(FIXTURES_DIR, "edgar_feed.xml"))


def _feed_oracle() -> str:
    rows = parse_feed(_fixture_feed_path())

    def lit(v) -> str:
        return "NULL" if v is None else "'" + v.replace("'", "''") + "'"

    body = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    return f"SELECT * FROM (VALUES {body}) AS t({', '.join(FEED_COLS)})"


@register("src_edgar_feed", oracle=_feed_oracle())
def src_edgar_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed -> filing manifest: the entry point of the EDGAR ETL chain
    (feed XML -> manifest -> fetch archives -> _xbrl_facts parse).
    Distributed parse over a manifest of feed paths (one per month in
    production; the fixture feed here), mapInPandas + stdlib
    ElementTree — the identical plan shape to _xbrl_facts, so the real
    monthly loop is this op pointed at fetched feed files.  The golden
    oracle is the fixture's content as a VALUES literal computed by the
    SAME parser at registration: if the XML namespace handling, the
    xbrlFiling extraction, or the skip-non-XBRL rule drifts, the value
    hash flips.

    Scale: feeds are monthly (hundreds of rows each); the manifest
    partitions by feed file and each parses independently — the fetch
    layer (fetch_feed) is IO-bound and capability-gated."""
    paths = [_fixture_feed_path()]
    manifest = spark.createDataFrame([(p,) for p in paths], "path string")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for path in b["path"]:
                out.extend(parse_feed(path))
            yield pd.DataFrame(out, columns=FEED_COLS)

    return manifest.repartition(8).mapInPandas(parse, FEED_SCHEMA)
