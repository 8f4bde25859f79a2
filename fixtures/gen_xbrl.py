"""Deterministic XBRL fixture generator — 100 filings in fixtures/xbrl_gen/.

20 companies x 4 quarters of 2024 (80 base 10-Q filings) + one 10-Q/A
amendment of Q2 per company (20 files) = 100 instances. Every value is a
pure function of (company, quarter, concept, region), so tests recompute
ground truth from this module instead of golden files.

Each filing carries SIX contexts — the multi-context, dimensioned shape the
reference's EDGAR ETL handles (SURVEY §1.1/§3.1):
  cDur  duration, no dimensions (consolidated flow facts)
  cInst instant at period end, no dimensions (consolidated stock facts)
  cAMER/cEMEA/cAPAC duration + explicit dimension seg:Region
  cAO   duration + TWO dimensions (seg:Region=AMER, seg:Channel=ONLINE)

Amendments (form 10-Q/A, higher accession sequence) restate the same
contexts with Revenues/NetIncomeLoss corrected by +1_000_000 — the
supersedence rule is "latest accession per (cik, period_end, base form)
wins" (xbrl_supersede operator).

Run `python fixtures/gen_xbrl.py` to (re)write the files; output is
byte-deterministic.
"""

from __future__ import annotations

import os

N_COMPANIES = 20
QUARTERS = [
    ("2024-01-01", "2024-03-31"),
    ("2024-04-01", "2024-06-30"),
    ("2024-07-01", "2024-09-30"),
    ("2024-10-01", "2024-12-31"),
]
AMENDED_QUARTER = 1  # Q2 gets a 10-Q/A from every company
REGIONS = ["AMER", "EMEA", "APAC"]
AMEND_DELTA = 1_000_000

# concept -> (unit, decimals, period kind)
DUR_CONCEPTS = ["us-gaap:Revenues", "us-gaap:NetIncomeLoss", "us-gaap:OperatingIncomeLoss"]
INST_CONCEPTS = ["us-gaap:Assets", "us-gaap:Liabilities"]
AMENDED_CONCEPTS = {"us-gaap:Revenues", "us-gaap:NetIncomeLoss"}

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "xbrl_gen")


def cik(ci: int) -> str:
    return f"{1000 + ci:010d}"


def accession(ci: int, qi: int, amended: bool) -> str:
    seq = 500 + ci * 10 + qi + (5000 if amended else 0)
    return f"{1000 + ci:07d}-24-{seq:06d}"


def value(ci: int, qi: int, concept: str, region: str | None,
          amended: bool) -> int:
    """Ground-truth fact value — a pure function, recomputed by tests."""
    concepts = DUR_CONCEPTS + INST_CONCEPTS
    kidx = concepts.index(concept)
    ridx = 0 if region is None else 1 + REGIONS.index(region)
    v = (
        (ci + 1) * 1_000_000_000
        + (qi + 1) * 10_000_000
        + (kidx + 1) * 100_000
        + ridx * 1_000
    )
    if amended and concept in AMENDED_CONCEPTS:
        v += AMEND_DELTA
    return v


def filing_xml(ci: int, qi: int, amended: bool) -> str:
    start, end = QUARTERS[qi]
    form = "10-Q/A" if amended else "10-Q"
    ctxs = [
        f"""  <context id="cDur">
    <entity><identifier scheme="http://www.sec.gov/CIK">{cik(ci)}</identifier></entity>
    <period><startDate>{start}</startDate><endDate>{end}</endDate></period>
  </context>
  <context id="cInst">
    <entity><identifier scheme="http://www.sec.gov/CIK">{cik(ci)}</identifier></entity>
    <period><instant>{end}</instant></period>
  </context>"""
    ]
    for r in REGIONS:
        ctxs.append(
            f"""  <context id="c{r}">
    <entity><identifier scheme="http://www.sec.gov/CIK">{cik(ci)}</identifier></entity>
    <period><startDate>{start}</startDate><endDate>{end}</endDate></period>
    <segment><explicitMember dimension="seg:Region">{r}</explicitMember></segment>
  </context>"""
        )
    ctxs.append(
        f"""  <context id="cAO">
    <entity><identifier scheme="http://www.sec.gov/CIK">{cik(ci)}</identifier></entity>
    <period><startDate>{start}</startDate><endDate>{end}</endDate></period>
    <segment><explicitMember dimension="seg:Region">AMER</explicitMember><explicitMember dimension="seg:Channel">ONLINE</explicitMember></segment>
  </context>"""
    )
    facts = [
        f'  <fact name="dei:DocumentType" contextRef="cDur">{form}</fact>'
    ]
    for c in DUR_CONCEPTS:
        facts.append(
            f'  <fact name="{c}" contextRef="cDur" unitRef="usd" decimals="0">'
            f"{value(ci, qi, c, None, amended)}</fact>"
        )
    for c in INST_CONCEPTS:
        facts.append(
            f'  <fact name="{c}" contextRef="cInst" unitRef="usd" decimals="0">'
            f"{value(ci, qi, c, None, amended)}</fact>"
        )
    for r in REGIONS:
        facts.append(
            f'  <fact name="us-gaap:Revenues" contextRef="c{r}" unitRef="usd" decimals="0">'
            f"{value(ci, qi, 'us-gaap:Revenues', r, amended)}</fact>"
        )
    facts.append(
        f'  <fact name="us-gaap:Revenues" contextRef="cAO" unitRef="usd" decimals="0">'
        f"{value(ci, qi, 'us-gaap:Revenues', 'AMER', amended) // 10}</fact>"
    )
    return (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        '<xbrl xmlns="http://www.xbrl.org/2003/instance">\n'
        + "\n".join(ctxs)
        + '\n  <unit id="usd"><measure>iso4217:USD</measure></unit>\n'
        + "\n".join(facts)
        + "\n</xbrl>\n"
    )


def all_filings() -> list[tuple[str, int, int, bool]]:
    """(accession, company, quarter, amended) for every generated filing."""
    out = []
    for ci in range(N_COMPANIES):
        for qi in range(len(QUARTERS)):
            out.append((accession(ci, qi, False), ci, qi, False))
        out.append((accession(ci, AMENDED_QUARTER, True), ci, AMENDED_QUARTER, True))
    return out


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for acc, ci, qi, amended in all_filings():
        with open(os.path.join(OUT_DIR, f"{acc}.xml"), "w") as f:
            f.write(filing_xml(ci, qi, amended))
    print(f"wrote {len(all_filings())} filings to {OUT_DIR}")


if __name__ == "__main__":
    main()
