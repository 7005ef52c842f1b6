"""One-shot source rewrite: replace two-arg ``round(expr, n)`` in the
named ORACLES entries of oracles.py with the det_round_sql floor form
(see functions/scalars.py — native round(DOUBLE, n) is per-engine-
divergent; VERDICT r8 task 3). Single-arg round (integer cents
conversion) is left untouched. Idempotent: already-migrated entries
contain no two-arg round and are skipped.

Usage: python tools/migrate_oracle_round.py name1 name2 ...
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from finance_reporting_etl_spark.functions.scalars import det_round_sql

PATH = "/root/repo/finance_reporting_etl_spark/oracles.py"


def find_entry(src: str, name: str) -> tuple[int, int]:
    """(start, end) character span of the ORACLES["name"] = ... value."""
    key = f'ORACLES["{name}"]'
    i = src.index(key)
    j = src.index("=", i) + 1
    # value runs to the next ORACLES[ assignment at column 0 or EOF
    m = re.search(r'\nORACLES\["', src[j:])
    end = j + m.start() if m else len(src)
    return j, end


def migrate_text(text: str) -> tuple[str, int]:
    """Replace every two-arg round(expr, INT) with the floor form."""
    out = []
    i = 0
    n_repl = 0
    while True:
        m = re.search(r"\bround\(", text[i:])
        if not m:
            out.append(text[i:])
            break
        start = i + m.start()
        inner_start = i + m.end()
        depth = 1
        k = inner_start
        while depth and k < len(text):
            if text[k] == "(":
                depth += 1
            elif text[k] == ")":
                depth -= 1
            k += 1
        inner = text[inner_start : k - 1]
        # top-level comma split
        depth = 0
        parts = [""]
        for ch in inner:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("")
            else:
                parts[-1] += ch
        if len(parts) == 2 and re.fullmatch(r"\s*\d+\s*", parts[1]):
            # recurse: nested two-arg rounds inside the expr must also
            # migrate (quality_scores had round() inside round())
            expr, inner_n = migrate_text(parts[0].strip())
            scale = int(parts[1])
            out.append(text[i:start])
            out.append(det_round_sql(expr, scale))
            n_repl += 1 + inner_n
        else:
            out.append(text[i:k])
        i = k
    return "".join(out), n_repl


def main() -> None:
    src = open(PATH).read()
    total = 0
    for name in sys.argv[1:]:
        a, b = find_entry(src, name)
        new, n = migrate_text(src[a:b])
        src = src[:a] + new + src[b:]
        total += n
        print(f"{name}: {n} rounds migrated")
    open(PATH, "w").write(src)
    print(f"TOTAL {total}")


if __name__ == "__main__":
    main()
