"""Source-level lints for the two round-6 audited bug classes, so new
code can't silently reintroduce them (VERDICT r6 item 6):

1. Data-scaled int64 products — two BIGINTs that each scale with data
   volume multiplied in int64 (count*sum variance numerators, cnt*cnt,
   cnt*1e6 shares). ANSI Spark errors past 2^63 while DuckDB silently
   widens to int128 and DIVERGES. Rule: promote to DECIMAL(38,0) /
   HUGEINT before the multiply (CLAUDE.md).

2. Pre-normalized cosine — sum((xi/na)*(yi/nb)) is a DIFFERENT IEEE
   tree from dot/(na*nb) (up to ~2e-15 apart, crosses floor/round grid
   cells); any oracled cosine must materialize norms and divide the
   raw dot (CLAUDE.md, cluster_medoids r6 / knn_bruteforce r7).

Both lints run over the query/operator sources as text; known-safe
sites are allowlisted by (path suffix, line-content marker) so a line
move doesn't break the pin but a NEW occurrence fails loudly.
"""

from __future__ import annotations

import pathlib
import re

import pytest

PKG = pathlib.Path(__file__).resolve().parents[1] / "glue_etl_pyspark_spark"

# The documented greps from CLAUDE.md, as real regexes.
_INT64_PRODUCT = re.compile(
    r"(\* F\.sum\b)|(count\(\*\) \* SUM)|(COUNT\(\*\) \* SUM)|(\bcnt \* cnt\b)"
)
# a match on a line that already promotes to a wide type is the fix, not the bug
_WIDE = re.compile(r"HUGEINT|DECIMAL\(38|decimal\(38", re.IGNORECASE)

# Known-safe multi-line sites: the DECIMAL(38,0)/HUGEINT promotion sits
# on a DIFFERENT line than the multiply, so the same-line _WIDE check
# can't see it. Pin by (path suffix, distinctive line fragment) — a
# line move doesn't break the pin, a NEW occurrence still fails.
# Empty today; the escape hatch the docstring promises.
_INT64_ALLOWLIST: tuple[tuple[str, str], ...] = ()


def _allowlisted(path: str, line: str) -> bool:
    return any(
        path.endswith(suffix) and marker in line
        for suffix, marker in _INT64_ALLOWLIST
    )


def _scan(pattern: re.Pattern, subdirs: tuple[str, ...]) -> list[tuple[str, int, str]]:
    hits = []
    for sub in subdirs:
        for p in sorted((PKG / sub).glob("*.py")):
            for i, line in enumerate(p.read_text().splitlines(), 1):
                if pattern.search(line):
                    hits.append((f"{sub}/{p.name}", i, line.strip()))
    return hits


def test_no_new_unpromoted_int64_data_products():
    hits = [
        h for h in _scan(_INT64_PRODUCT, ("queries", "operators", "functions"))
        if not _WIDE.search(h[2]) and not _allowlisted(h[0], h[2])
    ]
    assert not hits, (
        "data-scaled int64 product without DECIMAL(38,0)/HUGEINT promotion "
        f"(CLAUDE.md rule; ANSI overflow at scale): {hits}"
    )


def test_no_prenormalized_cosine_in_query_modules():
    """l2_normalize in a queries/ module means a query-local cosine is
    being built from unit vectors — the wrong IEEE tree for any
    floor/round-pinned oracle comparison. The legit uses (LSH
    bucketing, rows-only randomized paths) live in operators/
    similarity.py and are individually allowlisted there by the
    bit-exact knn_bruteforce pin in test_llm_ops."""
    hits = _scan(re.compile(r"\bl2_normalize\b"), ("queries",))
    assert not hits, (
        "pre-normalized cosine tree in a query module — use materialized "
        f"norms + dot/(na*nb) (CLAUDE.md rule): {hits}"
    )


def test_operator_prenormalized_dot_sites_are_frozen():
    """In operators/similarity.py, l2_normalize may feed ONLY the LSH
    bucketing paths (randomized, rows-only checked). A new use — e.g.
    reverting knn_bruteforce to the pre-r7 unit-vector dot — fails
    here before it can flake a driver hash."""
    src = (PKG / "operators" / "similarity.py").read_text()
    uses = [
        line.strip()
        for line in src.splitlines()
        if "l2_normalize" in line
        and "import" not in line
        and '"l2_normalize"' not in line
    ]
    assert len(uses) == 3 and all("array_to_vector" in u for u in uses), (
        "l2_normalize outside the three LSH array_to_vector sites in "
        f"similarity.py — oracled cosines must use dot/(na*nb): {uses}"
    )


@pytest.mark.parametrize(
    "bad",
    [
        "F.count(F.lit(1)) * F.sum('x')",  # matches '* F.sum'
        "SELECT COUNT(*) * SUM(v) FROM t",
        "sel = cnt * cnt DIV total",
    ],
)
def test_lint_catches_seeded_regressions(bad):
    assert _INT64_PRODUCT.search(bad) and not _WIDE.search(bad)
