"""Window-coverage audit (round-12 verdict item 7): which registered
queries have NEVER had a driver-side correctness row, and what each
rotation claimed about them.

The driver checks only the first 50 registered queries per round
(plans/catalog.py DRIVER_WINDOW). Rotation discipline says a query may
leave the window only when a strictly-stronger in-window witness
subsumes its capability class — those claims live as ``Displaced:``
comments in catalog.py. This tool makes the whole argument checkable
in one shot:

    python tools/window_audit.py

prints (1) every query with at least one historical CORRECTNESS row
(union over CORRECTNESS_r*.json + the current window), (2) the
never-windowed set, annotated with the displacement claim naming its
in-window subsumer when one was ever recorded, and (3) sanity checks:
window size, window ⊆ registry, and displaced-but-still-in-window
contradictions.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def historical_rows() -> dict[str, list[str]]:
    """query name → rounds (r01, r02, ...) with a CORRECTNESS row."""
    out: dict[str, list[str]] = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(p).split("_")[-1].split(".")[0]
        try:
            with open(p) as f:
                rows = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for name in rows:
            out.setdefault(name, []).append(rnd)
    return out


def displacement_claims(catalog_src: str) -> dict[str, str]:
    """displaced query → the comment sentence claiming its subsumer.

    Parses the ``Displaced: <name> ...`` comment blocks in catalog.py;
    a claim runs to the end of its sentence group (the next
    ``Displaced:`` / ``Round N`` / list marker)."""
    text = re.sub(r"\n#\s?", " ", catalog_src)  # unwrap comment lines
    claims: dict[str, str] = {}
    for m in re.finditer(r"Displaced:\s+([a-z]\w+)", text):
        name = m.group(1)
        tail = text[m.start(): m.start() + 900]
        stop = re.search(r"(?<=.)\b(?:Displaced:|Round \d+)", tail[10:])
        claims.setdefault(
            name, tail[: 10 + (stop.start() if stop else 890)].strip()
        )
    return claims


def forecast_mentions(catalog_src: str) -> set[str]:
    """Query names named in a ``rotation candidates`` forecast comment
    — the documented why-not-yet-windowed form short of a full
    displacement claim (the gate accepts either for NEW
    registrations)."""
    text = re.sub(r"\n#\s?", " ", catalog_src)
    out: set[str] = set()
    for m in re.finditer(
        r"rotation candidates[^.]*\.", text, flags=re.IGNORECASE
    ):
        out.update(re.findall(r"\b([a-z]\d{2}\w*)", m.group(0)))
    return out


def audit() -> dict:
    """One-shot audit record: never-windowed queries, displacement
    claims, forecast mentions, and structural problems. Used by both
    the CLI report and the pytest gate (tests/test_window_audit.py)
    so rotation debt can't silently grow."""
    from onechronos_etl_takehome_spark.plans.catalog import (
        DRIVER_WINDOW,
        ORACLES,
        QUERIES,
    )

    cat_path = os.path.join(
        REPO, "onechronos_etl_takehome_spark", "plans", "catalog.py"
    )
    with open(cat_path) as f:
        src = f.read()
    claims = displacement_claims(src)
    hist = historical_rows()
    covered = set(hist) | set(DRIVER_WINDOW)
    never = [q for q in QUERIES if q not in covered]

    problems: list[str] = []
    if len(DRIVER_WINDOW) != 50:
        problems.append(f"window size {len(DRIVER_WINDOW)} != 50")
    unknown = [q for q in DRIVER_WINDOW if q not in QUERIES]
    if unknown:
        problems.append(f"window names not registered: {unknown}")
    contradictions = sorted(set(claims) & set(DRIVER_WINDOW))
    if contradictions:
        problems.append(
            f"displaced-but-still-in-window: {contradictions}"
        )
    # forecast comments name queries by their short prefix ("t28",
    # "x54") — expand each mention to the registered names it covers
    mentions = forecast_mentions(src)
    forecast = {
        q
        for q in QUERIES
        if q in mentions or q.split("_", 1)[0] in mentions
    }
    return {
        "queries": list(QUERIES),
        "oracled": list(ORACLES),
        "window": list(DRIVER_WINDOW),
        "historical": hist,
        "never": never,
        "claims": claims,
        "forecast": forecast,
        "problems": problems,
    }


def main() -> int:
    a = audit()
    hist, claims, never = a["historical"], a["claims"], a["never"]
    DRIVER_WINDOW, QUERIES, ORACLES = (
        a["window"], a["queries"], a["oracled"],
    )
    problems = a["problems"]

    n_hist_only = len(set(hist) - set(DRIVER_WINDOW))
    print(
        f"registry: {len(QUERIES)} queries ({len(ORACLES)} oracled) | "
        f"window: {len(DRIVER_WINDOW)} | driver rows ever: {len(hist)} "
        f"({n_hist_only} now rotated out) | never windowed: {len(never)}"
    )
    print()
    print("== never-windowed queries ==")
    for q in never:
        oracle = "oracled" if q in ORACLES else "rows-only"
        claim = claims.get(q)
        note = (
            f"displacement claim: {claim}"
            if claim
            else "no displacement claim (never rotated in)"
        )
        print(f"- {q} [{oracle}] — {note}")
    print()
    if problems:
        print("== PROBLEMS ==")
        for p in problems:
            print(f"! {p}")
        return 1
    print("checks: window=50, all names registered, no "
          "displaced-row still in window")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
