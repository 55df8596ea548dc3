#!/usr/bin/env python
"""Regenerate ``spark_hive_streaming_sink_spark/_verified.py`` from the
driver's ``CORRECTNESS_r*.json`` record (VERDICT r9 item 9).

The ledger used to be maintained by hand each round; nine rounds in,
drift between the committed frozensets and the actual driver record is
a real risk. This generator makes the JSON files the single source of
truth:

- per-round green sets  = names with ``hash_match == true`` that round;
- ``ROWS_ONLY_JUDGED``  = names ever judged ``err == "no_oracle"``
  (rows-only by design — the verdict cannot improve);
- ``PRIORITY_RECHECK``  = names whose LATEST verdict is red
  (``hash_match`` false and not ``no_oracle``), sorted;
- ``GREEN``             = union of every green ever recorded;
- ``LAST_GREEN_ROUND``  = round of each name's most recent green.

Usage:
    python tools/gen_verified.py            # print to stdout
    python tools/gen_verified.py --write    # rewrite _verified.py
    python tools/gen_verified.py --check    # exit 1 if file is stale

``tests/test_properties.py::test_verified_ledger_matches_driver_record``
runs ``--check`` so the ledger can never drift from the driver record.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TARGET = os.path.join(
    REPO, "spark_hive_streaming_sink_spark", "_verified.py"
)

HEADER = '''"""Driver-verdict ledger, used only to ORDER query emission.

The round driver evaluates ``queries()`` in dict-iteration order and
stops when its time budget runs out (50 verdicts per round). To get
hard-signal coverage for the whole inventory, ``registry`` emits
queries in this priority order:

1. ``PRIORITY_RECHECK`` — previously judged WRONG, now fixed; a fresh
   verdict is the proof of the fix.
2. never-judged queries (registration order preserved);
3. judged rows-only queries (their verdict can't improve — ``no_oracle``
   is by design);
4. ``GREEN`` — queries with a green hash verdict in a previous round,
   stalest verdict first (re-judging fresher greens adds no
   information; regressions are guarded by the local pytest replica of
   the same comparison).

GENERATED FILE — do not edit by hand. Regenerate after each round's
``CORRECTNESS_r{N}.json`` lands:

    python tools/gen_verified.py --write

(``tests/test_properties.py`` fails if this file is stale.)
"""

from __future__ import annotations
'''


def _load_rounds() -> dict[int, dict]:
    rounds = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rounds[int(m.group(1))] = json.load(open(p))
    return rounds


def _fmt_set(name: str, items: set[str], comment: str) -> str:
    body = "".join(f'        "{n}",\n' for n in sorted(items))
    if not items:
        return f"{comment}\n{name}: frozenset[str] = frozenset()\n"
    return (
        f"{comment}\n{name}: frozenset[str] = frozenset(\n"
        f"    {{\n{body}    }}\n)\n"
    )


def generate(exclude_round: int | None = None) -> str:
    """Render the ledger. ``exclude_round`` drops that round's JSON
    before rendering — the staleness guard uses it to distinguish "the
    driver dropped a new CORRECTNESS file after the last commit" (warn,
    regenerate at round start) from a hand-edited ledger (hard fail)."""
    rounds = _load_rounds()
    if exclude_round is not None:
        rounds.pop(exclude_round, None)
    if not rounds:
        raise SystemExit("no CORRECTNESS_r*.json found")
    green_by_round: dict[int, set[str]] = {}
    rows_only: set[str] = set()
    latest: dict[str, tuple[int, dict]] = {}
    for rnd in sorted(rounds):
        for name, v in rounds[rnd].items():
            latest[name] = (rnd, v)
            if v.get("hash_match"):
                green_by_round.setdefault(rnd, set()).add(name)
            if v.get("err") == "no_oracle":
                rows_only.add(name)
    red = sorted(
        name
        for name, (_, v) in latest.items()
        if not v.get("hash_match") and v.get("err") != "no_oracle"
    )
    last_green: dict[str, int] = {}
    for rnd in sorted(green_by_round):
        for name in green_by_round[rnd]:
            last_green[name] = rnd

    out = [HEADER]
    round_vars = []
    for rnd in sorted(green_by_round):
        var = f"_GREEN_R{rnd}"
        round_vars.append(var)
        out.append(
            _fmt_set(
                var,
                green_by_round[rnd],
                f"\n# Round {rnd} (CORRECTNESS_r{rnd:02d}.json): "
                "hash_match == true.",
            )
        )
    out.append(
        _fmt_set(
            "ROWS_ONLY_JUDGED",
            rows_only,
            '\n# Rows-only verdicts (err == "no_oracle", by design).',
        )
    )
    if red:
        body = "".join(f'    "{n}",\n' for n in red)
        out.append(
            "\n# Latest driver verdict is red — fixed locally, awaiting "
            "re-judgement.\nPRIORITY_RECHECK: tuple[str, ...] = (\n"
            f"{body})\n"
        )
    else:
        out.append(
            "\n# No outstanding red verdicts (every oracle-checked query's "
            "latest\n# driver verdict is green).\n"
            "PRIORITY_RECHECK: tuple[str, ...] = ()\n"
        )
    union = " | ".join(round_vars)
    out.append(
        "\n# Union of every green ever recorded (a later re-judge can only "
        "refresh\n# the verdict, never remove it — reds move to "
        "PRIORITY_RECHECK instead).\n"
        f"GREEN: frozenset[str] = (\n    {union}\n)\n"
    )
    pairs = ", ".join(f"({rnd}, _GREEN_R{rnd})" for rnd in sorted(green_by_round))
    out.append(
        "\n# Round of each query's MOST RECENT green verdict: ``registry``\n"
        "# emits green queries stalest-verdict-first so old verdicts get\n"
        "# re-certified on a rolling basis.\n"
        "LAST_GREEN_ROUND: dict[str, int] = {}\n"
        f"for _round, _names in ({pairs}):\n"
        "    for _name in _names:\n"
        "        LAST_GREEN_ROUND[_name] = _round\n"
        "del _round, _names, _name\n"
    )
    return "".join(out)


def main() -> int:
    text = generate()
    if "--write" in sys.argv:
        with open(TARGET, "w") as f:
            f.write(text)
        print(f"wrote {TARGET}")
        return 0
    if "--check" in sys.argv:
        current = open(TARGET).read()
        if current != text:
            print("_verified.py is STALE — run: python tools/gen_verified.py --write")
            return 1
        print("_verified.py matches the driver record")
        return 0
    sys.stdout.write(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
