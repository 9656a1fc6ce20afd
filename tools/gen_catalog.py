#!/usr/bin/env python
"""Generate OPERATORS.md — the user-facing catalog of the gated query/operator
surface, from the registry + docstrings. Run after adding/merging queries:
    python tools/gen_catalog.py > OPERATORS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def first_para(doc: str | None) -> str:
    if not doc:
        return "(no docstring)"
    para = doc.strip().split("\n\n")[0]
    return " ".join(line.strip() for line in para.splitlines())


def main() -> None:
    from score_spark.queries import _NO_MEMO, ORACLE, QUERIES
    from score_spark.queries.signal import HASH_PINS

    try:
        from bench import _BASELINE_SKIP
    except Exception:
        _BASELINE_SKIP = set()

    fams = {
        "q": "Relational (TPC-H-style + construct parity)",
        "d": "Deduplication",
        "s": "Similarity / ANN",
        "t": "Text analysis",
        "c": "Training-data pipeline",
        "a": "As-of join",
        "j": "Interval joins",
        "h": "Time rollup",
        "w": "Streaming (batch twins)",
        "m": "Multimodal",
        "p": "Schema-on-read prune loop",
        "k": "Sinks",
    }
    by_fam: dict[str, list[str]] = {}
    for name in sorted(QUERIES):
        by_fam.setdefault(name[0], []).append(name)

    print("# Operator catalog (generated — `python tools/gen_catalog.py`)")
    print()
    print(
        "Every entry is driver-gated: the Spark implementation and its DuckDB\n"
        "oracle run side-by-side at sf0.01 and must hash-match (rows, schema,\n"
        "values). Flags: `[no-memo]` = construction runs real actions\n"
        "(checkpointed/persisted intermediates, xcheck oracle writes, model\n"
        "fits, table writes), so the prepared-query catalog never memoizes it\n"
        "(review r8: this flag was previously labeled `xcheck`, which\n"
        "misdocumented opt-outs like s02/k01 that have no xcheck channel);\n"
        "`[no-baseline]` = excluded from the wall-clock ratio because\n"
        "the oracle does verification-shaped work, not equivalent-engine work."
    )
    for fam_key, names in sorted(by_fam.items()):
        print(f"\n## {fams.get(fam_key, fam_key)}\n")
        for name in names:
            fn = QUERIES[name]
            flags = []
            if name in _NO_MEMO:
                flags.append("no-memo")
            if name in _BASELINE_SKIP:
                flags.append("no-baseline")
            if name not in ORACLE:
                flags.append("rows-only")
            tag = f" `[{'; '.join(flags)}]`" if flags else ""
            print(f"- **{name}**{tag} — {first_para(fn.__doc__)}")
            pins = HASH_PINS.get(name)
            if pins:
                print(f"  - *Hash pins:* {pins}")


if __name__ == "__main__":
    main()
